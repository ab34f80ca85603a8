#!/usr/bin/env python3
"""One-command external verification of emitted ONNX graphs.

On any onnxruntime-equipped machine (nothing from this repo required beyond
this file and the fixtures directory):

    python tools/verify_onnx_external.py [--dir tests/fixtures/onnx_external]

loads every `<name>.onnx` + `<name>_io.npz` pair, runs the recorded input
cases, and compares against the recorded expected outputs (per-output MAE +
allclose at the tolerances stored in the npz). Exit code 0 iff everything
matches. This closes the loop the reference closes with onnxruntime
(reference deployment/exporters/acoustic_exporter.py:104-113): an
independent, third-party runtime executing the emitted bytes.

On THIS machine (no onnxruntime), `--engine interpreter` runs the same check
through the repo's numpy interpreter — that configuration proves fixture
consistency, not runtime independence; see docs/onnx_ops.md ("External
verification").

What a PASSING onnxruntime run proves:
- the emitted protobuf parses as a valid ONNX model in the real ecosystem;
- every emitted op/attribute combination is accepted by ORT's opset-17
  checker and kernels (scan->Loop, cond->If, GatherElements, ConvTranspose,
  the full sampler loops);
- the numerics of the deployed graphs match the JAX programs that produced
  the expectations to the stated tolerances (float32, default CPU EP).
"""

import argparse
import pathlib
import sys

import numpy as np


def _load_cases(npz):
    n = int(npz["meta/n_cases"])
    atol = float(npz["meta/atol"])
    rtol = float(npz["meta/rtol"])
    cases = []
    for k in range(n):
        ins = {key.split("/", 2)[2]: npz[key] for key in npz.files
               if key.startswith(f"case{k}/in/")}
        n_out = sum(1 for key in npz.files if key.startswith(f"case{k}/out/"))
        outs = [npz[f"case{k}/out/{i}"] for i in range(n_out)]
        cases.append((ins, outs))
    return cases, atol, rtol


def _run_ort(model_path, inputs):
    import onnxruntime as ort

    sess = _run_ort._cache.get(model_path)
    if sess is None:
        sess = ort.InferenceSession(str(model_path),
                                    providers=["CPUExecutionProvider"])
        _run_ort._cache[model_path] = sess
    return sess.run(None, {k: np.asarray(v) for k, v in inputs.items()})


_run_ort._cache = {}


def _run_interpreter(model_path, inputs):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from diffsinger_tpu.deployment.onnx.interpreter import run_model

    return run_model(model_path.read_bytes(), dict(inputs))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", default=str(pathlib.Path(__file__).resolve()
                                         .parents[1] / "tests" / "fixtures" / "onnx_external"))
    ap.add_argument("--engine", choices=["onnxruntime", "interpreter"],
                    default="onnxruntime")
    args = ap.parse_args(argv)
    fdir = pathlib.Path(args.dir)
    models = sorted(fdir.glob("*.onnx"))
    if not models:
        print(f"no .onnx fixtures under {fdir}", file=sys.stderr)
        return 2

    run = _run_ort if args.engine == "onnxruntime" else _run_interpreter
    failures = 0
    for model_path in models:
        npz_path = model_path.with_name(model_path.stem + "_io.npz")
        if not npz_path.exists():
            print(f"{model_path.name}: MISSING {npz_path.name}", file=sys.stderr)
            failures += 1
            continue
        with np.load(npz_path) as npz:
            cases, atol, rtol = _load_cases(npz)
        if not cases:
            print(f"FAIL {model_path.stem}: fixture has zero cases")
            failures += 1
            continue
        for k, (ins, want) in enumerate(cases):
            got = run(model_path, ins)
            if len(got) != len(want):  # checked per case, BEFORE zip truncates
                print(f"FAIL {model_path.stem} case{k}: {len(got)} outputs, "
                      f"expected {len(want)}")
                failures += 1
                continue
            for i, (g, w) in enumerate(zip(got, want)):
                g = np.asarray(g)
                mae = float(np.abs(g.astype(np.float64) - w.astype(np.float64)).mean())
                ok = g.shape == w.shape and np.allclose(g, w, atol=atol, rtol=rtol)
                status = "ok " if ok else "FAIL"
                print(f"{status} {model_path.stem} case{k} out{i}: "
                      f"MAE {mae:.3e} (atol {atol:g} rtol {rtol:g}) shape {g.shape}")
                if not ok:
                    failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
