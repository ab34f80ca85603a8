"""Native WORLD-style analysis/synthesis tests on synthetic signals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.dsp.world import (
    cheaptrick, estimate_aperiodicity, synthesize, world_harmonic_aperiodic,
)

FS, FFT, HOP = 44100, 2048, 512


def _harmonic(f0, amps, seconds=1.0, noise=0.0, fs=FS):
    t = np.arange(int(fs * seconds)) / fs
    y = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t) for k, a in enumerate(amps))
    if noise:
        y = y + noise * np.random.default_rng(0).standard_normal(len(t))
    return y.astype(np.float32)


def test_cheaptrick_tracks_harmonic_amplitudes():
    """Envelope recovery on a slowly-varying harmonic spectrum (the regime
    CheapTrick is designed for: envelope variation slow relative to the f0
    harmonic spacing; a cliff-like 4-harmonic spectrum is inherently
    unresolvable by the sinc lifter)."""
    f0_hz = 220.0
    n_harm = 40
    amps = [np.exp(-0.05 * k) for k in range(n_harm)]  # ~-0.43 dB per harmonic
    y = _harmonic(f0_hz, amps)
    n_frames = len(y) // HOP
    f0 = jnp.full((n_frames,), f0_hz)
    env = np.asarray(cheaptrick(jnp.asarray(y), f0, fs=FS, fft_size=FFT, hop=HOP))
    assert env.shape == (n_frames, FFT // 2 + 1)
    assert np.isfinite(env).all() and (env > 0).all()
    mid = env[n_frames // 2]
    bins = [round(f0_hz * (k + 1) * FFT / FS) for k in range(2, 20)]
    vals = np.array([mid[b] for b in bins])
    ratios_db = 10 * np.log10(vals / vals[0])
    expected_db = np.array([20 * np.log10(amps[k] / amps[2]) for k in range(2, 20)])
    assert np.abs(ratios_db - expected_db).max() < 3.0, ratios_db - expected_db
    # envelope is smooth: no deep nulls between adjacent harmonics
    inter = mid[bins[0] : bins[1]]
    assert inter.min() > 0.05 * inter.max()


def test_aperiodicity_separates_tone_from_noise():
    f0_hz = 220.0
    clean = _harmonic(f0_hz, [1.0, 0.6, 0.4])
    n_frames = len(clean) // HOP
    f0 = jnp.full((n_frames,), f0_hz)
    ap_clean = np.asarray(estimate_aperiodicity(jnp.asarray(clean), f0, fs=FS, fft_size=FFT, hop=HOP))
    noise = np.random.default_rng(1).standard_normal(len(clean)).astype(np.float32) * 0.3
    ap_noise = np.asarray(estimate_aperiodicity(jnp.asarray(noise), f0, fs=FS, fft_size=FFT, hop=HOP))
    lowband = slice(0, round(1200 * FFT / FS))
    mid = n_frames // 2
    assert ap_clean[mid, lowband].mean() < 0.35
    assert ap_noise[mid, lowband].mean() > 0.7
    # unvoiced frames are fully aperiodic
    ap_uv = np.asarray(estimate_aperiodicity(jnp.asarray(clean), jnp.zeros((n_frames,)),
                                             fs=FS, fft_size=FFT, hop=HOP))
    assert (ap_uv == 1.0).all()


def test_synthesis_produces_harmonics_at_f0():
    n_frames = 80
    f0 = jnp.full((n_frames,), 220.0)
    env = np.full((n_frames, FFT // 2 + 1), 1e-6, np.float32)
    # envelope passband below 2 kHz
    env[:, : round(2000 * FFT / FS)] = 1.0
    wav = np.asarray(synthesize(f0, jnp.asarray(env), jnp.zeros_like(jnp.asarray(env)),
                                fs=FS, fft_size=FFT, hop=HOP, rng=jax.random.PRNGKey(0)))
    assert wav.shape == (n_frames * HOP,)
    sl = wav[FFT : -FFT]
    spec = np.abs(np.fft.rfft(sl))
    freqs = np.fft.rfftfreq(len(sl), 1 / FS)
    peak = freqs[np.argmax(spec)]
    # strongest component is a harmonic of 220 within the passband
    assert abs(peak / 220.0 - round(peak / 220.0)) < 0.05
    # energy above the passband is strongly attenuated
    hi = spec[freqs > 4000].mean()
    lo = spec[(freqs > 100) & (freqs < 2000)].mean()
    assert lo > 20 * hi


def test_world_split_on_noisy_harmonic():
    """Both parts are re-synthesized (phase-incoherent with the source, like
    pyworld): validate on spectral energy distribution, not waveform identity."""
    f0_hz = 220.0
    clean = _harmonic(f0_hz, [np.exp(-0.1 * k) for k in range(20)])
    noise = (0.05 * np.random.default_rng(2).standard_normal(len(clean))).astype(np.float32)
    y = clean + noise
    n_frames = len(y) // HOP + 1
    f0 = np.full((n_frames,), f0_hz, np.float32)
    harm, ap = world_harmonic_aperiodic(y, f0, fs=FS, fft_size=FFT, hop=HOP)
    assert harm.shape == y.shape and ap.shape == y.shape
    sl = slice(4096, len(y) - 4096)

    def band_energy(w, at_harmonics: bool):
        spec = np.abs(np.fft.rfft(w[sl])) ** 2
        freqs = np.fft.rfftfreq(len(w[sl]), 1 / FS)
        ratio = freqs / f0_hz
        frac = np.abs(ratio - np.round(ratio))
        mask = (frac < 0.1) if at_harmonics else (frac > 0.3)
        mask &= freqs < 5000
        return spec[mask].sum()

    # harmonic part: energy concentrated at harmonic frequencies
    h_at = band_energy(harm, True)
    h_off = band_energy(harm, False)
    assert h_at > 10 * h_off, (h_at, h_off)
    # aperiodic part: broadband (off-harmonic energy comparable to on-harmonic)
    a_at = band_energy(ap, True)
    a_off = band_energy(ap, False)
    assert a_off > 0.2 * a_at
    # total harmonic-band energy roughly matches the source's
    y_at = band_energy(y, True)
    assert 0.1 * y_at < h_at < 10 * y_at


def test_decomposed_waveform_world_algorithm():
    from diffsinger_tpu.dsp.decomposed_waveform import DecomposedWaveform

    f0_hz = 220.0
    clean = _harmonic(f0_hz, [np.exp(-0.1 * k) for k in range(20)])
    noise = (0.05 * np.random.default_rng(3).standard_normal(len(clean))).astype(np.float32)
    y = clean + noise
    n_frames = len(y) // HOP + 1
    f0 = np.full((n_frames,), f0_hz, np.float32)
    dec = DecomposedWaveform(y, FS, f0, hop_size=HOP, fft_size=FFT, win_size=FFT,
                             algorithm="world")
    harm = dec.harmonic()
    ap = dec.aperiodic()
    assert harm.shape == y.shape and ap.shape == y.shape
    assert np.isfinite(harm).all() and np.isfinite(ap).all()
    # kth-harmonic extraction works on the world-harmonic part too
    h0 = dec.harmonic(0)
    sl = slice(4096, len(y) - 4096)
    spec = np.abs(np.fft.rfft(h0[sl]))
    freqs = np.fft.rfftfreq(len(h0[sl]), 1 / FS)
    assert abs(freqs[np.argmax(spec)] - f0_hz) < 5.0
