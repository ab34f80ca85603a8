"""CLI wiring smoke tests: every script imports and exposes its commands."""

import subprocess
import sys


def _help(script, *args):
    return subprocess.run(
        [sys.executable, script, *args, "--help"],
        capture_output=True, text=True, timeout=240,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
        cwd="/root/repo",
    )


def test_infer_cli_help():
    r = _help("scripts/infer.py")
    assert r.returncode == 0, r.stderr
    assert "acoustic" in r.stdout and "variance" in r.stdout
    r = _help("scripts/infer.py", "acoustic")
    assert "--depth" in r.stdout and "--steps" in r.stdout and "--mel" in r.stdout
    r = _help("scripts/infer.py", "variance")
    assert "--predict" in r.stdout and "--expr" in r.stdout


def test_other_cli_helps():
    for script, expect in [
        ("scripts/train.py", "--exp_name"),
        ("scripts/binarize.py", "--config"),
        ("scripts/vocode.py", "MEL_FILE"),
        ("scripts/export.py", "acoustic"),
        ("scripts/drop_spk.py", "--mode"),
        ("scripts/val_nsf_hifigan.py", "WAV_FILE"),
    ]:
        r = _help(script)
        assert r.returncode == 0, f"{script}: {r.stderr[-500:]}"
        assert expect in r.stdout, f"{script} missing {expect}"

    # reference export flag surface (scripts/export.py:98-111, 180-200)
    r = _help("scripts/export.py", "acoustic")
    for flag in ("--freeze_gender", "--freeze_velocity", "--export_spk", "--freeze_spk"):
        assert flag in r.stdout, flag
    r = _help("scripts/export.py", "variance")
    for flag in ("--freeze_expr", "--freeze_glide", "--export_spk", "--freeze_spk"):
        assert flag in r.stdout, flag
