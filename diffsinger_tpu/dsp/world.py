"""WORLD-family vocoder analysis/synthesis in JAX (native replacement for the
pyworld dependency, SURVEY.md §2.1 / §7.2#3).

Implements the pieces the reference uses from pyworld
(utils/decomposed_waveform.py:107-230):

* :func:`cheaptrick` — the CheapTrick spectral-envelope estimator
  (Morise 2015): pitch-adaptive Hanning windowing, frequency-domain smoothing
  by a rectangular window of width 2/3·f0, and cepstral liftering with the
  sinc smoothing lifter and the q1 spectral-recovery lifter. Frame-parallel
  FFT math — an excellent XLA fit.
* aperiodicity — :mod:`diffsinger_tpu.dsp.d4c` implements the faithful D4C
  (group-delay based) estimator used by :func:`world_harmonic_aperiodic`.
  :func:`estimate_aperiodicity` (a simpler spectral-floor heuristic: the
  ratio between the inter-harmonic floor and the harmonic upper envelope) is
  kept as a fast jittable alternative.
* :func:`synthesize` — overlap-add synthesis: minimum-phase response of the
  envelope excited by pitch-synchronous pulses (periodic part, scaled by
  sqrt(1-ap^2)) plus white noise shaped by the envelope (aperiodic part,
  scaled by ap).

`DecomposedWaveform(algorithm='world')` uses these to reproduce the
reference's harmonic(=synthesize with ap=0 weighting)/aperiodic split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_F0 = 500.0  # unvoiced frames analyze with this f0 (pyworld convention)


def _frame_centers(n_frames: int, hop: int) -> np.ndarray:
    return np.arange(n_frames) * hop


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "hop"))
def cheaptrick(
    x: jnp.ndarray, f0: jnp.ndarray, *, fs: int, fft_size: int, hop: int
) -> jnp.ndarray:
    """Spectral envelope per frame.

    :param x: [L] waveform
    :param f0: [F] per-frame f0 (0 = unvoiced -> DEFAULT_F0)
    :return: [F, fft_size//2+1] power spectral envelope
    """
    n_frames = f0.shape[0]
    n_bins = fft_size // 2 + 1
    f0 = jnp.where(f0 <= 0, DEFAULT_F0, f0)
    f0 = jnp.clip(f0, fs * 3.0 / (fft_size - 3.0), 800.0)

    # 1. pitch-adaptive windowing: Hanning window spanning 3 periods (1.5 each
    #    side), realized as a masked window over a fixed fft_size-long slice
    centers = jnp.arange(n_frames) * hop
    offsets = jnp.arange(fft_size) - fft_size // 2
    pad = fft_size
    xp = jnp.pad(x, (pad, pad))
    idx = centers[:, None] + offsets[None, :] + pad  # [F, fft]
    frames = xp[idx]  # [F, fft]

    half_win = 1.5 * fs / f0  # in samples
    t = offsets[None, :] / half_win[:, None]  # [-1, 1] over the active window
    window = jnp.where(jnp.abs(t) < 1.0, 0.5 + 0.5 * jnp.cos(jnp.pi * t), 0.0)
    frames = frames * window
    # normalize window power (pyworld normalizes by sqrt of window energy)
    frames = frames / jnp.sqrt(jnp.sum(window * window, axis=1, keepdims=True) + 1e-12)

    power = jnp.abs(jnp.fft.rfft(frames, n=fft_size, axis=1)) ** 2  # [F, bins]

    # 2. frequency-domain smoothing with a rectangular window of width 2/3 f0
    bin_hz = fs / fft_size
    width_bins = (2.0 / 3.0) * f0 / bin_hz  # [F]
    # smoothing as convolution via cumulative sums with fractional width
    csum = jnp.cumsum(jnp.pad(power, ((0, 0), (1, 0))), axis=1)  # [F, bins+1]
    pos = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    lo = jnp.clip(pos - width_bins[:, None] / 2, 0, n_bins - 1)
    hi = jnp.clip(pos + width_bins[:, None] / 2, 1, n_bins)

    def interp_csum(c, q):
        qf = jnp.floor(q).astype(jnp.int32)
        frac = q - qf
        return c[qf] * (1 - frac) + c[jnp.minimum(qf + 1, n_bins)] * frac

    smoothed = jax.vmap(lambda c, l, h: (interp_csum(c, h) - interp_csum(c, l)) / jnp.maximum(h - l, 1e-6))(
        csum, lo, hi
    )
    # relative safeguard floor (-80 dB below the frame peak): without it, empty
    # spectral regions (log ~ -inf) corrupt the cepstral liftering via Gibbs
    smoothed = jnp.maximum(
        smoothed, jnp.max(smoothed, axis=1, keepdims=True) * 1e-8 + 1e-20
    )

    # 3. cepstral liftering: smoothing lifter sinc(f0*tau) and spectral
    #    recovery lifter (1+2q1) - 2q1*cos(2 pi tau f0), q1 = -0.15
    q1 = -0.15
    log_spec = jnp.log(smoothed)
    full = jnp.concatenate([log_spec, log_spec[:, -2:0:-1]], axis=1)  # [F, fft] symmetric
    ceps = jnp.fft.ifft(full, axis=1).real  # real cepstrum [F, fft]
    # quefrency in seconds, symmetric index
    tau_idx = jnp.arange(fft_size)
    tau_idx = jnp.minimum(tau_idx, fft_size - tau_idx)
    tau = tau_idx.astype(jnp.float32)[None, :] / fs  # [1, fft]
    arg = jnp.pi * f0[:, None] * tau  # [F, fft]
    smoothing_lifter = jnp.where(arg < 1e-6, 1.0, jnp.sin(arg) / jnp.maximum(arg, 1e-6))
    recovery_lifter = (1.0 + 2.0 * q1) - 2.0 * q1 * jnp.cos(2.0 * arg)
    ceps = ceps * smoothing_lifter * recovery_lifter
    log_env = jnp.fft.fft(ceps, axis=1).real[:, :n_bins]
    return jnp.exp(log_env)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "hop"))
def estimate_aperiodicity(
    x: jnp.ndarray, f0: jnp.ndarray, *, fs: int, fft_size: int, hop: int
) -> jnp.ndarray:
    """Per-frame, per-bin aperiodicity in [0, 1] via the harmonic-peak /
    inter-harmonic-floor ratio. Unvoiced frames -> 1."""
    n_frames = f0.shape[0]
    n_bins = fft_size // 2 + 1
    voiced = f0 > 0
    f0_eff = jnp.where(voiced, f0, DEFAULT_F0)

    centers = jnp.arange(n_frames) * hop
    offsets = jnp.arange(fft_size) - fft_size // 2
    pad = fft_size
    xp = jnp.pad(x, (pad, pad))
    frames = xp[centers[:, None] + offsets[None, :] + pad]
    window = jnp.asarray(np.blackman(fft_size).astype(np.float32))
    power = jnp.abs(jnp.fft.rfft(frames * window, axis=1)) ** 2 + 1e-12

    bin_hz = fs / fft_size
    # distance of each bin from the nearest harmonic in units of f0
    ratio = (jnp.arange(n_bins)[None, :] * bin_hz) / f0_eff[:, None]
    frac = jnp.abs(ratio - jnp.round(ratio))  # 0 at harmonics, 0.5 between
    peak_mask = frac < 0.15
    floor_mask = frac > 0.35

    def band_stat(p, mask):
        # smooth masked average over a band of ~2*f0 width
        w = mask.astype(p.dtype)
        csum_p = jnp.cumsum(jnp.pad(p * w, ((0, 0), (1, 0))), axis=1)
        csum_w = jnp.cumsum(jnp.pad(w, ((0, 0), (1, 0))), axis=1)
        width = jnp.maximum((2.0 * f0_eff / bin_hz).astype(jnp.int32), 4)[:, None]
        pos = jnp.arange(n_bins)[None, :]
        lo = jnp.clip(pos - width, 0, n_bins)
        hi = jnp.clip(pos + width, 0, n_bins)
        b = jnp.arange(p.shape[0])[:, None]
        num = csum_p[b, hi] - csum_p[b, lo]
        den = csum_w[b, hi] - csum_w[b, lo]
        return num / jnp.maximum(den, 1.0)

    peak_env = band_stat(power, peak_mask)
    floor_env = band_stat(power, floor_mask)
    ap2 = jnp.clip(floor_env / jnp.maximum(peak_env, 1e-12), 0.0, 1.0)
    ap = jnp.sqrt(ap2)
    return jnp.where(voiced[:, None], ap, 1.0)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "hop"))
def synthesize(
    f0: jnp.ndarray,
    envelope: jnp.ndarray,
    aperiodicity: jnp.ndarray,
    *,
    fs: int,
    fft_size: int,
    hop: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Overlap-add synthesis from (f0, spectral envelope, aperiodicity).

    Periodic part: an impulse-train excitation (unit-area pulses at f0) filtered
    by the per-frame envelope; aperiodic part: white noise filtered by the
    envelope; both weighted per-bin by sqrt(1-ap^2) / ap respectively
    (the same split pyworld's synthesize applies, decomposed_waveform.py:208-229).

    Returns [F*hop] waveform.
    """
    n_frames, n_bins = envelope.shape
    length = n_frames * hop
    voiced = f0 > 0
    f0_eff = jnp.where(voiced, f0, DEFAULT_F0)

    # per-sample phase for the pulse train (fp32 cumsum with rebasing)
    f0_up = jnp.repeat(f0_eff, hop)  # [L]
    phase = jnp.cumsum(f0_up / fs)
    pulse = (jnp.floor(phase) - jnp.floor(jnp.concatenate([jnp.zeros(1), phase[:-1]]))) > 0
    # unit-energy pulses scaled so the excitation has ~unit power per period
    periodic_exc = pulse.astype(jnp.float32) * jnp.sqrt(jnp.maximum(fs / f0_up, 1.0))
    periodic_exc = periodic_exc * jnp.repeat(voiced, hop)
    noise_exc = jax.random.normal(rng, (length,), jnp.float32)

    # frame both excitations and filter in the STFT domain with sqrt envelopes
    from diffsinger_tpu.dsp.stft import istft, stft_complex

    window = jnp.asarray(np.hanning(fft_size + 1)[:-1].astype(np.float32))
    amp = jnp.sqrt(envelope)
    per_w = jnp.sqrt(jnp.clip(1.0 - aperiodicity ** 2, 0.0, 1.0))
    spec_p = stft_complex(periodic_exc[None], n_fft=fft_size, hop=hop, win_size=fft_size,
                          window=window, center=True)
    spec_n = stft_complex(noise_exc[None], n_fft=fft_size, hop=hop, win_size=fft_size,
                          window=window, center=True)
    fcount = spec_p.shape[1]

    def fit(a):
        a = a[:fcount]
        return jnp.pad(a, ((0, fcount - a.shape[0]), (0, 0)))

    spec = spec_p * (fit(amp) * fit(per_w))[None] + spec_n * (fit(amp) * fit(aperiodicity))[None]
    return istft(spec, n_fft=fft_size, hop=hop, win_size=fft_size, window=window,
                 center=True, length=length)[0]


def world_harmonic_aperiodic(
    waveform: np.ndarray, f0: np.ndarray, *, fs: int, fft_size: int, hop: int,
    rng: jax.Array | None = None,
):
    """Full WORLD-style decomposition: analyze (cheaptrick + D4C aperiodicity)
    and re-synthesize the harmonic part (ap-weighted, noise off) — the
    reference's 'world' split (decomposed_waveform.py:195-230)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # the reference injects 1e-5 noise before WORLD analysis to dodge D4C's
    # band-limited-signal NaN edge case (decomposed_waveform.py:92-99)
    noise = np.random.default_rng(0).standard_normal(len(waveform)) * 1e-5
    x64 = np.asarray(waveform, np.float64) + noise
    x = jnp.asarray(x64, jnp.float32)
    n_frames = int(np.ceil((len(waveform) + 1) / hop))
    f0 = np.asarray(f0, np.float32)
    if len(f0) < n_frames:
        f0 = np.pad(f0, (0, n_frames - len(f0)), mode="edge")
    f0j = jnp.asarray(f0[:n_frames])
    env = cheaptrick(x, f0j, fs=fs, fft_size=fft_size, hop=hop)
    from diffsinger_tpu.dsp.d4c import d4c

    positions = np.arange(n_frames) * (hop / fs)
    ap = jnp.asarray(
        d4c(x64, f0[:n_frames].astype(np.float64), positions, fs, fft_size),
        jnp.float32,
    )

    def fit(w):
        w = np.asarray(w[: len(waveform)])
        if len(w) < len(waveform):
            w = np.pad(w, (0, len(waveform) - len(w)))
        return w.astype(np.float32)

    # both parts are *synthesized* (like pyworld's synthesize calls at
    # decomposed_waveform.py:208-229) — subtraction would be phase-incoherent
    harmonic = fit(synthesize(
        f0j, env * jnp.clip(1 - ap ** 2, 1e-6, 1.0), jnp.zeros_like(ap),
        fs=fs, fft_size=fft_size, hop=hop, rng=rng,
    ))
    aperiodic = fit(synthesize(
        f0j, env * jnp.clip(ap ** 2, 1e-6, 1.0), jnp.ones_like(ap),
        fs=fs, fft_size=fft_size, hop=hop, rng=jax.random.fold_in(rng, 1),
    ))
    return harmonic, aperiodic
