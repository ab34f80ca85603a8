"""Native Harvest f0 estimator tests on synthetic fixtures (pyworld is not
installable here; behavior is validated against the published algorithm's
expected responses — reference contract: modules/pe/pw.py:7-29)."""

import numpy as np
import pytest

from diffsinger_tpu.dsp.harvest import harvest
from diffsinger_tpu.dsp.pe import HarvestPE

FS = 44100
HOP_MS = 1000 * 512 / FS


def _tone(f0, seconds=1.5, n_harm=8):
    t = np.arange(int(FS * seconds)) / FS
    y = sum((0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(n_harm))
    return y / np.abs(y).max()


@pytest.mark.parametrize("f0_true", [82.4, 220.0, 660.0])
def test_harvest_steady_tone(f0_true):
    f0, pos = harvest(_tone(f0_true), FS, f0_floor=65, f0_ceil=1100, frame_period=HOP_MS)
    assert pos.shape == f0.shape
    v = f0[f0 > 0]
    assert len(v) > 0.9 * len(f0)
    assert abs(np.median(v) - f0_true) / f0_true < 0.005
    cents = 1200 * np.abs(np.log2(v / f0_true))
    assert np.median(cents) < 10


def test_harvest_vibrato_tracking():
    seconds = 2.0
    t = np.arange(int(FS * seconds)) / FS
    inst = 220 * 2 ** (0.5 / 12 * np.sin(2 * np.pi * 5.5 * t))
    phase = np.cumsum(inst) / FS
    y = sum((0.6 ** k) * np.sin(2 * np.pi * (k + 1) * phase) for k in range(8))
    f0, pos = harvest(y, FS, f0_floor=65, f0_ceil=1100, frame_period=HOP_MS)
    true = 220 * 2 ** (0.5 / 12 * np.sin(2 * np.pi * 5.5 * pos))
    m = f0 > 0
    assert m.mean() > 0.9
    cents = np.abs(1200 * np.log2(f0[m] / true[m]))
    assert cents.mean() < 10, cents.mean()
    # no octave errors anywhere on the voiced path
    assert cents.max() < 600


def test_harvest_noise_and_silence_unvoiced():
    rng = np.random.default_rng(0)
    f0_n, _ = harvest(rng.standard_normal(FS), FS, frame_period=HOP_MS)
    assert (f0_n > 0).mean() < 0.1
    f0_s, _ = harvest(np.zeros(FS // 2), FS, frame_period=HOP_MS)
    assert (f0_s == 0).all()


def test_harvest_vuv_boundary():
    rng = np.random.default_rng(1)
    y = np.concatenate([_tone(220.0, 1.0), 0.1 * rng.standard_normal(FS)])
    f0, _ = harvest(y, FS, frame_period=HOP_MS)
    n = len(f0)
    assert (f0[: n // 2 - 3] > 0).mean() > 0.9
    assert (f0[n // 2 + 3:] > 0).mean() < 0.2


def test_harvest_pe_wrapper_contract():
    """HarvestPE matches the reference get_pitch contract: length padding,
    uv mask, interp_uv densification (modules/pe/pw.py:20-28)."""
    y = _tone(220.0, 0.8).astype(np.float32)
    length = len(y) // 512 + 1
    pe = HarvestPE()
    f0, uv = pe.get_pitch(y, FS, length, hop_size=512, f0_min=65, f0_max=1100)
    assert f0.shape == (length,) and uv.shape == (length,)
    assert f0.dtype == np.float32
    assert (f0[~uv] > 0).all()
    f0i, uvi = pe.get_pitch(y, FS, length, hop_size=512, interp_uv=True)
    assert (f0i[~uvi] > 0).all()
    # interp fills the unvoiced tail created by padding
    assert (f0i > 0).mean() > 0.95
