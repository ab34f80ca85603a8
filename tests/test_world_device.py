"""Device (jitted JAX) WORLD path vs the float64 numpy goldens.

dsp/world_device.py moves D4C and the WORLD synthesis response loop onto the
accelerator (VERDICT r4 #3 / SURVEY §2.1); the numpy implementations stay the
goldens. These tests bound the float32-device vs float64-host divergence on
the same constructed fixtures test_world_bounds.py uses, and re-assert the
key physical bounds directly on the device split.
"""

import numpy as np
import pytest

from diffsinger_tpu.dsp import golden_signals as gs
from diffsinger_tpu.dsp.d4c import d4c
from diffsinger_tpu.dsp.world import synthesize_world, world_harmonic_aperiodic
from diffsinger_tpu.dsp.world_device import (
    d4c_device,
    synthesize_world_device,
    world_harmonic_aperiodic_device,
)

FS = gs.FS
HOP = 512
FFT_SIZE = 2048


def _speech_envelope(n_frames, n_bins=FFT_SIZE // 2 + 1):
    freqs = np.arange(n_bins) * FS / FFT_SIZE
    env_db = -10.0 - 20 * np.log10(1 + (freqs / 1200.0) ** 2)
    return np.tile(10 ** (env_db / 10.0), (n_frames, 1))


def _band_ap(n_frames, lo_ap, hi_ap, split_hz=4000.0, n_bins=FFT_SIZE // 2 + 1):
    freqs = np.arange(n_bins) * FS / FFT_SIZE
    ap = np.where(freqs < split_hz, lo_ap, hi_ap)
    return np.tile(ap, (n_frames, 1))


@pytest.fixture(scope="module")
def fixture_synth():
    """A WORLD-synthesized signal with known envelope + two-band ap."""
    n_frames = 128
    f0 = np.full(n_frames, 220.0)
    f0[:6] = 0.0  # leading unvoiced region exercises the voicing mask
    env = _speech_envelope(n_frames)
    ap_true = _band_ap(n_frames, 0.3, 0.8)
    y = synthesize_world(f0, env, ap_true, FS, HOP, seed=3)
    return y, f0, env, ap_true


def test_d4c_device_matches_host(fixture_synth):
    """Device D4C (float32, all-frame compute + mask) vs numpy D4C (float64)
    on the same signal: mean |Δap| small, voicing decisions identical."""
    y, f0, _, _ = fixture_synth
    n_frames = len(f0)
    positions = np.arange(n_frames) * (HOP / FS)
    ap_host = np.asarray(d4c(y, f0, positions, FS, FFT_SIZE))
    ap_dev = np.asarray(d4c_device(
        np.asarray(y, np.float32), np.asarray(f0, np.float32),
        fs=FS, fft_size=FFT_SIZE, hop=HOP))
    assert ap_dev.shape == ap_host.shape
    # identical voicing gates (a frame fully aperiodic on one side only would
    # push the MAE to ~1 on that row)
    host_uv = ap_host[:, 0] > 0.99
    dev_uv = ap_dev[:, 0] > 0.99
    assert (host_uv == dev_uv).mean() >= 0.97
    both_v = ~host_uv & ~dev_uv
    mae = np.abs(ap_dev[both_v] - ap_host[both_v]).mean()
    assert mae <= 0.05, f"voiced-frame ap MAE {mae:.4f}"


def test_d4c_device_recovers_constructed_aperiodicity(fixture_synth):
    """The device estimator independently satisfies the same constructed-
    ground-truth bound as the host one (test_world_bounds.py calibration)."""
    y, f0, _, _ = fixture_synth
    ap_rec = np.asarray(d4c_device(
        np.asarray(y, np.float32), np.asarray(f0, np.float32),
        fs=FS, fft_size=FFT_SIZE, hop=HOP))
    mid = ap_rec[20:-20]

    def at_hz(hz):
        return float(mid[:, int(round(hz * FFT_SIZE / FS))].mean())

    assert abs(at_hz(3000) - 0.3) <= 0.25
    assert abs(at_hz(9000) - 0.8) <= 0.25
    assert at_hz(9000) > at_hz(3000)


def test_synthesis_device_harmonic_matches_host(fixture_synth):
    """With ap ~ 0 and full voicing the synthesis is (near-)deterministic —
    the device and numpy waveforms must agree sample-wise up to float32
    round-off. (Unvoiced stretches synthesize noise whose realization
    legitimately differs between the two RNGs, so f0 here is all-voiced.)"""
    _, f0, env, _ = fixture_synth
    f0 = np.where(f0 > 0, f0, 220.0)
    ap0 = np.zeros_like(env)
    y_host = synthesize_world(f0, env, ap0, FS, HOP, seed=0)
    y_dev = synthesize_world_device(f0, env, ap0, FS, HOP, seed=0)
    assert y_dev.shape[0] == y_host.shape[0]
    scale = np.abs(y_host).max()
    err = np.abs(y_dev - y_host).max() / scale
    assert err <= 2e-3, f"harmonic synthesis relative max err {err:.2e}"


def test_synthesis_device_noise_band_power_matches_host(fixture_synth):
    """Full (noisy) synthesis: realizations differ by design, but third-octave
    band powers over the voiced region must agree within ~1.5 dB."""
    _, f0, env, ap_true = fixture_synth
    y_host = synthesize_world(f0, env, ap_true, FS, HOP, seed=0)
    y_dev = synthesize_world_device(f0, env, ap_true, FS, HOP, seed=0)
    seg = slice(10 * HOP, 120 * HOP)
    ph = np.abs(np.fft.rfft(y_host[seg])) ** 2
    pd = np.abs(np.fft.rfft(y_dev[seg])) ** 2
    edges = np.geomspace(100, 16000, 16)
    freqs = np.fft.rfftfreq(len(y_host[seg]), 1 / FS)
    for lo, hi in zip(edges[:-1], edges[1:]):
        band = (freqs >= lo) & (freqs < hi)
        db = 10 * np.log10(pd[band].sum() / ph[band].sum())
        assert abs(db) <= 1.5, f"band {lo:.0f}-{hi:.0f} Hz off by {db:.2f} dB"


def test_device_split_close_to_host_split():
    """world_harmonic_aperiodic vs its device twin on the vowel fixture:
    harmonic parts near-identical, aperiodic parts equal in energy."""
    wave, f0_true = gs.signal_bank()["vowel_pulse"]
    n = int(np.ceil((len(wave) + 1) / HOP))
    f0 = np.full(n, f0_true, np.float32)
    h_host, a_host = world_harmonic_aperiodic(
        wave, f0, fs=FS, fft_size=FFT_SIZE, hop=HOP)
    h_dev, a_dev = world_harmonic_aperiodic_device(
        wave, f0, fs=FS, fft_size=FFT_SIZE, hop=HOP)
    assert h_dev.shape == h_host.shape and a_dev.shape == a_host.shape
    # harmonic: same deterministic signal modulo float32 analysis round-off
    num = float(np.dot(h_dev, h_host))
    den = float(np.linalg.norm(h_dev) * np.linalg.norm(h_host)) + 1e-12
    assert num / den >= 0.98, f"harmonic correlation {num / den:.4f}"
    e = lambda x: float(np.mean(x ** 2)) + 1e-12  # noqa: E731
    ratio_db = 10 * np.log10(e(a_dev) / e(a_host))
    assert abs(ratio_db) <= 2.0, f"aperiodic energy off by {ratio_db:.2f} dB"


@pytest.mark.parametrize("name,bound", [("noise", "ap"), ("steady_mid", "h")])
def test_device_split_physical_bounds(name, bound):
    """The device split independently passes the leakage bounds of
    test_world_bounds.py: pure noise -> aperiodic, clean tone -> harmonic."""
    wave, f0_true = gs.signal_bank()[name]
    n = int(np.ceil((len(wave) + 1) / HOP))
    f0 = np.zeros(n, np.float32) if name == "noise" else np.full(
        n, f0_true, np.float32)
    h, a = world_harmonic_aperiodic_device(
        wave, f0, fs=FS, fft_size=FFT_SIZE, hop=HOP)
    eh, ea = float(np.mean(h ** 2)), float(np.mean(a ** 2))
    if bound == "ap":
        assert eh <= 0.1 * (eh + ea)
    else:
        assert ea <= 0.15 * (eh + ea)
