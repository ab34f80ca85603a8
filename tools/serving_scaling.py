"""Multi-device serving scaling record (virtual CPU mesh).

VERDICT r4 #8: the 4-device CPU-mesh parity tests prove mesh serving is
*correct*; this tool records that the sharding actually *divides work*.

For each device count N in {1, 2, 4, 8} it re-execs itself with
``JAX_NUM_CPU_DEVICES=N`` and, on a data=N mesh:

1. runs the REAL ``AcousticServer.synthesize_batch`` / ``VarianceServer
   .predict_batch`` on a fixed 8-segment batch (tiny config) and records the
   steady-state wall time (2nd call, compile excluded);
2. lowers the acoustic sampler forward with the same batch sharding and
   records the compiled PER-DEVICE executable FLOPs from XLA cost analysis —
   the direct evidence that each device executes ~1/N of the total work.

CAVEAT (recorded in the JSON): this host has ONE physical core, so the N
virtual CPU devices timeslice it — wall time CANNOT improve with N here.
The scaling claim rests on the per-device FLOPs column (and on the real-chip
single-device throughput in BENCH_r*.json); wall times are recorded only to
show the mesh path adds no pathological overhead.

Usage: python tools/serving_scaling.py            # writes docs/perf/serving_scaling.json
       python tools/serving_scaling.py --child N  # internal
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DEVICE_COUNTS = (1, 2, 4, 8)
N_SEGMENTS = 8


def _tiny_acoustic_exp(tmp: pathlib.Path):
    sys.path.insert(0, str(ROOT / "tests"))
    from test_e2e_infer import TINY_COMMON, _make_exp

    hp = _make_exp(
        tmp,
        str(ROOT / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            shallow_diffusion_args=dict(
                train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
                aux_decoder_arch="convnext",
                aux_decoder_args=dict(num_channels=16, num_layers=1,
                                      kernel_size=7, dropout_rate=0.1),
                aux_decoder_grad=0.1,
            ),
            vocoder_ckpt=str(tmp / "none.ckpt"),
        ),
        "scaling_acoustic",
    )
    hp["infer"] = True
    return hp


def _segments():
    # acoustic-ready sample (has ph_dur + f0_seq; score-only samples need the
    # variance stage first)
    with open(ROOT / "samples" / "00_xiao_xing_xing.ds", encoding="utf-8") as f:
        segs = json.load(f)
    out = []
    while len(out) < N_SEGMENTS:
        for s in segs:
            s = dict(s)
            s["offset"] = float(s.get("offset", 0.0)) + 10.0 * len(out)
            out.append(s)
    return out[:N_SEGMENTS]


def child(n_devices: int) -> dict:
    import warnings

    import jax

    # the image's sitecustomize preimports jax with the axon TPU backend and
    # swallows JAX_PLATFORMS; backends initialize lazily, so config still wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    import numpy as np

    assert jax.device_count() == n_devices, jax.devices()
    import tempfile

    tmp = pathlib.Path(tempfile.mkdtemp())
    hp = _tiny_acoustic_exp(tmp)

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.parallel.mesh import create_mesh
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 10), params,
                    category="acoustic", global_step=10)

    mesh = create_mesh(jax.devices(), data=n_devices, model=1)
    from diffsinger_tpu.inference.serving import AcousticServer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        server = AcousticServer(hp, max_batch_size=N_SEGMENTS, mesh=mesh)
    segs = _segments()
    wavs = server.synthesize_batch(segs, seed=1, steps=4)  # compile + warm
    assert len(wavs) == N_SEGMENTS and all(np.isfinite(w).all() for w in wavs)
    t0 = time.perf_counter()
    server.synthesize_batch(segs, seed=1, steps=4)
    wall_acoustic = time.perf_counter() - t0

    # --- per-device executable FLOPs of the sharded sampler forward ------
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, T_MEL, T_TXT = N_SEGMENTS, 256, 32
    tokens = jnp.ones((B, T_TXT), jnp.int32)
    mel2ph = jnp.ones((B, T_MEL), jnp.int32)
    f0 = jnp.full((B, T_MEL), 220.0, jnp.float32)
    batch_sh = NamedSharding(mesh, P("data"))

    def fwd(p, tokens, mel2ph, f0):
        return model.forward_infer(p, jax.random.PRNGKey(0), tokens, mel2ph,
                                   f0, steps=4).diff_out

    lowered = jax.jit(fwd, in_shardings=(None, batch_sh, batch_sh, batch_sh)
                      ).lower(params, tokens, mel2ph, f0)
    cost = lowered.compile().cost_analysis()
    flops_per_device = float(cost.get("flops", float("nan")))

    return {
        "devices": n_devices,
        "wall_s_acoustic_batch8": round(wall_acoustic, 3),
        "sampler_flops_per_device": flops_per_device,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args()
    if args.child:
        print(json.dumps(child(args.child)))
        return

    rows = []
    for n in DEVICE_COUNTS:
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_NUM_CPU_DEVICES=str(n))
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(n)],
            env=env, capture_output=True, text=True, cwd=ROOT)
        if out.returncode != 0:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"child N={n} failed")
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(rows[-1], flush=True)

    base = rows[0]["sampler_flops_per_device"]
    for r in rows:
        r["flops_fraction_of_single"] = round(
            r["sampler_flops_per_device"] / base, 4)
    result = {
        "what": "virtual CPU-mesh serving scaling: per-device work division "
                "(AcousticServer batch of 8 segments; sampler forward lowered "
                "with batch sharding)",
        "caveat": "1-core host: N virtual devices timeslice one core, so wall "
                  "time cannot improve with N here. Work division is shown by "
                  "sampler_flops_per_device ~ total/N; wall times only show "
                  "the mesh path adds no pathological overhead. Shape-only "
                  "record; absolute perf lives in BENCH_r*.json.",
        "rows": rows,
    }
    out_path = ROOT / "docs" / "perf" / "serving_scaling.json"
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
