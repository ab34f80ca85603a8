"""The committed external-verification fixtures stay green (VERDICT r3 #4).

tests/fixtures/onnx_external/ holds emitted ONNX byte fixtures + expected I/O
(tools/make_onnx_external_fixtures.py). An onnxruntime-equipped machine runs
`python tools/verify_onnx_external.py` to close the third-party-runtime loop;
here the same harness runs through the in-repo numpy interpreter, and the
independent structural checker validates the committed bytes — so a lowering
or interpreter regression cannot silently invalidate the shipped fixtures.
"""

import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
FIXTURE_DIR = ROOT / "tests" / "fixtures" / "onnx_external"
sys.path.insert(0, str(ROOT / "tools"))


def test_fixtures_exist():
    models = sorted(FIXTURE_DIR.glob("*.onnx"))
    assert {m.stem for m in models} == {"acoustic_sampler", "variance_pitch", "vocoder"}
    for m in models:
        assert m.with_name(m.stem + "_io.npz").exists()


def test_fixtures_pass_structural_checker():
    from diffsinger_tpu.deployment.onnx.checker import check_model
    from diffsinger_tpu.deployment.onnx.lowering import EMITTED_OPS

    for m in sorted(FIXTURE_DIR.glob("*.onnx")):
        check_model(m.read_bytes(), known_ops=EMITTED_OPS)


@pytest.mark.parametrize("stem", ["acoustic_sampler", "variance_pitch", "vocoder"])
def test_fixtures_pass_interpreter_verification(stem):
    import verify_onnx_external as vx
    import numpy as np

    model_path = FIXTURE_DIR / f"{stem}.onnx"
    with np.load(FIXTURE_DIR / f"{stem}_io.npz") as npz:
        cases, atol, rtol = vx._load_cases(npz)
    for ins, want in cases:
        got = vx._run_interpreter(model_path, ins)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, atol=atol, rtol=rtol)


def test_verifier_cli_interpreter_engine(capsys):
    import verify_onnx_external as vx

    rc = vx.main(["--engine", "interpreter", "--dir", str(FIXTURE_DIR)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "FAIL" not in out
