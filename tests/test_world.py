"""Native WORLD-style analysis/synthesis tests on synthetic signals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.dsp.world import (
    cheaptrick, estimate_aperiodicity, synthesize, synthesize_world,
    world_harmonic_aperiodic,
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


def test_minimum_phase_spectrum_preserves_amplitude():
    """The minimum-phase construction must leave amplitudes untouched
    (WORLD GetMinimumPhaseSpectrum is phase-only)."""
    from diffsinger_tpu.dsp.world import _minimum_phase_spectrum

    rng = np.random.default_rng(0)
    n_bins = FFT // 2 + 1
    # smooth random log-amplitudes (envelope-like)
    raw = rng.standard_normal((3, n_bins))
    kernel = np.hanning(65)
    log_amp = np.stack([np.convolve(r, kernel / kernel.sum(), mode="same") for r in raw])
    spec = _minimum_phase_spectrum(log_amp, FFT)
    assert spec.shape == (3, n_bins)
    np.testing.assert_allclose(np.abs(spec), np.exp(log_amp), rtol=1e-10)
    # genuinely minimum-phase: energy of the impulse response is front-loaded
    h = np.fft.irfft(spec, n=FFT, axis=1)
    front = (h[:, : FFT // 8] ** 2).sum(axis=1)
    total = (h ** 2).sum(axis=1)
    assert (front > 0.5 * total).all()


def test_synthesize_world_voiced_tone():
    """Pulse-synchronous synthesis of a constant-f0 envelope: correct length,
    near-zero DC, pitch accurate to sub-Hz (fractional time shifts), energy
    confined to the envelope passband."""
    f0_hz = 220.5  # deliberately not commensurate with fs/hop
    n_frames = 170  # ~2 s
    n_bins = FFT // 2 + 1
    env = np.full((n_frames, n_bins), 1e-12)
    env[:, : round(2000 * FFT / FS)] = 1.0
    ap = np.full((n_frames, n_bins), 0.001)
    f0 = np.full((n_frames,), f0_hz)
    y = synthesize_world(f0, env, ap, FS, HOP, seed=0)
    assert y.shape == (n_frames * HOP,)
    assert np.isfinite(y).all()
    sl = y[FFT:-FFT]
    assert abs(sl.mean()) < 1e-3 * np.abs(sl).max()
    spec = np.abs(np.fft.rfft(sl * np.hanning(len(sl))))
    freqs = np.fft.rfftfreq(len(sl), 1 / FS)
    band = (freqs > 180) & (freqs < 260)
    peak = freqs[band][np.argmax(spec[band])]
    assert abs(peak - f0_hz) < 0.5, peak
    hi = spec[freqs > 4000].mean()
    lo = spec[(freqs > 100) & (freqs < 2000)].mean()
    assert lo > 30 * hi


def test_synthesize_world_unvoiced_noise():
    """f0=0 everywhere: the output is envelope-shaped noise (WORLD excites
    unvoiced regions at the default 500 Hz cadence with noise segments)."""
    n_frames = 80
    n_bins = FFT // 2 + 1
    env = np.full((n_frames, n_bins), 1e-12)
    lo_bin, hi_bin = round(1000 * FFT / FS), round(3000 * FFT / FS)
    env[:, lo_bin:hi_bin] = 1.0
    ap = np.ones((n_frames, n_bins))
    y = synthesize_world(np.zeros(n_frames), env, ap, FS, HOP, seed=3)
    sl = y[FFT:-FFT]
    assert np.abs(sl).max() > 0
    spec = np.abs(np.fft.rfft(sl)) ** 2
    freqs = np.fft.rfftfreq(len(sl), 1 / FS)
    inband = spec[(freqs > 1100) & (freqs < 2900)].mean()
    outband = spec[(freqs > 4000) | (freqs < 500)].mean()
    assert inband > 30 * outband
    # broadband, not harmonic: no dominant single component
    assert spec.max() < 0.05 * spec.sum()


def test_synthesize_world_pulse_cadence():
    """Pulse spacing follows f0: doubling f0 doubles the zero-crossing-free
    pulse count (measured via envelope-independent excitation energy)."""
    n_frames = 90
    n_bins = FFT // 2 + 1
    env = np.ones((n_frames, n_bins))
    ap = np.full((n_frames, n_bins), 0.001)
    y1 = synthesize_world(np.full(n_frames, 110.0), env, ap, FS, HOP, seed=0)
    y2 = synthesize_world(np.full(n_frames, 220.0), env, ap, FS, HOP, seed=0)
    # flat envelope -> near-impulse responses; count distinct peaks
    def count_pulses(y):
        thresh = 0.3 * np.abs(y).max()
        above = np.abs(y) > thresh
        return int(np.diff(above.astype(int)).clip(min=0).sum())

    c1, c2 = count_pulses(y1), count_pulses(y2)
    assert 1.6 < c2 / c1 < 2.4, (c1, c2)


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
