"""D4C band-aperiodicity tests on synthetic fixtures (pyworld is not
installable here, so behavior is validated against the published algorithm's
expected responses: periodic -> ~0, noise -> ~1, band-split signals -> a
matching band gradient, LoveTrain VUV gating)."""

import numpy as np

from diffsinger_tpu.dsp.d4c import d4c

FS, HOP, FFT = 44100, 512, 2048


def _frames(x):
    n = len(x) // HOP
    return n, np.arange(n) * (HOP / FS)


def _harmonic(f0, n_harm=12, seconds=1.0):
    t = np.arange(int(FS * seconds)) / FS
    y = sum((0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(n_harm))
    return (y / np.abs(y).max()).astype(np.float64)


def test_d4c_shapes_and_range():
    x = _harmonic(220.0)
    n, pos = _frames(x)
    ap = d4c(x, np.full(n, 220.0), pos, FS, FFT)
    assert ap.shape == (n, FFT // 2 + 1)
    assert np.isfinite(ap).all()
    assert (ap > 0).all() and (ap <= 1.0).all()


def test_d4c_periodic_vs_noise():
    x = _harmonic(220.0) + np.random.default_rng(1).standard_normal(FS) * 1e-5
    n, pos = _frames(x)
    f0 = np.full(n, 220.0)
    ap_h = d4c(x, f0, pos, FS, FFT)
    lowband = slice(0, round(2000 * FFT / FS))
    assert ap_h[5:-5, lowband].mean() < 0.15, ap_h[5:-5, lowband].mean()

    noise = np.random.default_rng(0).standard_normal(len(x))
    ap_n = d4c(noise, f0, pos, FS, FFT)
    # LoveTrain rejects the frame as voiced -> fully aperiodic
    assert ap_n[5:-5].mean() > 0.98


def test_d4c_band_gradient():
    """Harmonics below 3 kHz + highpassed noise above 6 kHz: low bands stay
    periodic, top bands read as aperiodic."""
    from scipy.signal import butter, sosfilt

    rng = np.random.default_rng(2)
    x = _harmonic(220.0)
    sos = butter(6, 6000 / (FS / 2), "highpass", output="sos")
    x = x + 0.3 * sosfilt(sos, rng.standard_normal(len(x)))
    n, pos = _frames(x)
    ap = d4c(x, np.full(n, 220.0), pos, FS, FFT)
    low = ap[5:-5, : round(2500 * FFT / FS)].mean()
    high = ap[5:-5, round(9000 * FFT / FS):].mean()
    assert low < 0.3, low
    assert high > 0.6, high
    assert high > low + 0.3


def test_d4c_unvoiced_frames_are_fully_aperiodic():
    x = _harmonic(220.0)
    n, pos = _frames(x)
    f0 = np.full(n, 220.0)
    f0[: n // 2] = 0.0
    ap = d4c(x, f0, pos, FS, FFT)
    assert np.allclose(ap[: n // 2], 1.0, atol=1e-9)
    # voiced half: periodic in the band that actually holds harmonics (<2.5 kHz)
    assert ap[n // 2 + 5 : -5, : round(2400 * FFT / FS)].mean() < 0.2


def test_d4c_world_split_uses_it():
    """world_harmonic_aperiodic routes aperiodicity through D4C: a noisier
    source should leave more energy in the aperiodic part."""
    from diffsinger_tpu.dsp.world import world_harmonic_aperiodic

    x = _harmonic(220.0, seconds=0.5).astype(np.float32)
    rng = np.random.default_rng(3)
    noisy = x + 0.2 * rng.standard_normal(len(x)).astype(np.float32)
    n = len(x) // HOP + 1
    f0 = np.full(n, 220.0, np.float32)
    _, ap_clean = world_harmonic_aperiodic(x, f0, fs=FS, fft_size=FFT, hop=HOP)
    _, ap_noisy = world_harmonic_aperiodic(noisy, f0, fs=FS, fft_size=FFT, hop=HOP)
    e = lambda w: float((w.astype(np.float64) ** 2).sum())
    assert e(ap_noisy) > 2 * e(ap_clean), (e(ap_noisy), e(ap_clean))
