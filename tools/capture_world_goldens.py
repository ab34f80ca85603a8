#!/usr/bin/env python3
"""Capture pyworld golden outputs for the native Harvest/D4C conformance tests.

This script CANNOT run in the build environment (pyworld is not installed
there). Run it on any machine with ``pip install pyworld numpy scipy``:

    python tools/capture_world_goldens.py --out tests/goldens/world_goldens.npz

It regenerates the deterministic signal bank from
``diffsinger_tpu/dsp/golden_signals.py``, verifies each signal's SHA256
against ``tests/goldens/bank_hashes.json`` (aborts on mismatch — that means
the two checkouts disagree and the goldens would be meaningless), then records

    harvest_f0/<name>, harvest_pos/<name>  — pw.harvest at frame_period =
        1000*512/44100 ms, f0 range [65, 1100]  (the repo binarizer settings;
        reference modules/pe/pw.py:7)
    d4c_ap/<name>        — pw.d4c at fft_size=2048 on the harvest contour
        (reference utils/decomposed_waveform.py:129)

plus ``__meta__`` (JSON: pyworld/numpy versions, bank version). Commit the
resulting ``.npz`` into ``tests/goldens/`` and
``tests/test_world_goldens.py`` will pick it up automatically and enforce the
documented tolerances; without the file those tests skip.

Expected output hash: print at end; record it in the commit message.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from diffsinger_tpu.dsp import golden_signals as gs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "tests" / "goldens" / "world_goldens.npz"))
    args = ap.parse_args()

    try:
        import pyworld as pw
    except ImportError:
        sys.exit("pyworld is required on the capture machine: pip install pyworld")

    expected = json.loads((REPO / "tests" / "goldens" / "bank_hashes.json").read_text())
    actual = gs.bank_hashes()
    if actual != expected["signals"] or expected["bank_version"] != gs.BANK_VERSION:
        for k in sorted(actual):
            mark = "OK " if actual[k] == expected["signals"].get(k) else "DIFF"
            print(f"  {mark} {k}")
        sys.exit("signal bank does not match the committed hashes — refusing to capture")

    out = {}
    meta = {
        "bank_version": gs.BANK_VERSION,
        "pyworld": getattr(pw, "__version__", "unknown"),
        "numpy": np.__version__,
        "fs": gs.FS,
        "frame_period_ms": gs.FRAME_PERIOD_MS,
        "f0_floor": gs.F0_FLOOR,
        "f0_ceil": gs.F0_CEIL,
        "fft_size": gs.FFT_SIZE,
    }
    # the reference's two pw.synthesize calls that define the world split
    # (utils/decomposed_waveform.py:208-229); captured for the subset below so
    # the native synthesizer (dsp/world.py synthesize_world) can be validated
    # against pyworld's own analysis parameters
    SYNTH_NAMES = ("steady_mid", "vowel_pulse", "breathy")
    for name, (wave, _) in gs.signal_bank().items():
        x = np.ascontiguousarray(wave, np.float64)
        f0, pos = pw.harvest(x, gs.FS, f0_floor=gs.F0_FLOOR, f0_ceil=gs.F0_CEIL,
                             frame_period=gs.FRAME_PERIOD_MS)
        ap_spec = pw.d4c(x, f0, pos, gs.FS, fft_size=gs.FFT_SIZE)
        out[f"harvest_f0/{name}"] = f0.astype(np.float64)
        out[f"harvest_pos/{name}"] = pos.astype(np.float64)
        out[f"d4c_ap/{name}"] = ap_spec.astype(np.float32)
        if name in SYNTH_NAMES:
            sp = pw.cheaptrick(x, f0, pos, gs.FS, fft_size=gs.FFT_SIZE)
            out[f"cheaptrick_sp/{name}"] = sp.astype(np.float32)
            harm = pw.synthesize(
                f0, np.clip(sp * (1 - ap_spec * ap_spec), a_min=1e-16, a_max=None),
                np.zeros_like(ap_spec), gs.FS, frame_period=gs.FRAME_PERIOD_MS)
            aper = pw.synthesize(
                f0, sp * ap_spec * ap_spec, np.ones_like(ap_spec),
                gs.FS, frame_period=gs.FRAME_PERIOD_MS)
            out[f"synth_harm/{name}"] = harm.astype(np.float32)
            out[f"synth_ap/{name}"] = aper.astype(np.float32)
        voiced = float((f0 > 0).mean())
        print(f"  {name:14s} frames={len(f0):4d} voiced={voiced:.2f}")

    out_path = pathlib.Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, __meta__=json.dumps(meta), **out)
    digest = hashlib.sha256(out_path.read_bytes()).hexdigest()
    print(f"wrote {out_path} ({out_path.stat().st_size} bytes)\nsha256: {digest}")


if __name__ == "__main__":
    main()
