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
* :func:`synthesize_world` — WORLD's exact pulse-synchronous synthesis
  (Synthesis, synthesis.cpp): per-sample f0/vuv interpolation, pulse
  locations from phase wrapping with fractional-sample time shifts,
  per-pulse minimum-phase impulse responses (periodic: envelope with the
  fractional shift as linear phase + DC removal; aperiodic: white noise
  segments of the inter-pulse length filtered by the minimum-phase
  response), scatter-added at the pulse positions. Host-side float64
  numpy, vectorized over pulses — the same place the reference runs the
  pyworld C++ (utils/decomposed_waveform.py:208-229).
* :func:`synthesize` — a jittable overlap-add approximation kept for
  on-device use (STFT-domain zero-phase filtering of a pulse train +
  noise); the decomposition path below uses the exact synthesizer.

`DecomposedWaveform(algorithm='world')` uses these to reproduce the
reference's harmonic(=synthesize with ap=0 weighting)/aperiodic split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_F0 = 500.0  # unvoiced frames analyze with this f0 (pyworld convention)

# Bumped whenever analysis/synthesis behavior changes (recorded into binarized
# .meta provenance). v2: WORLD-exact pulse-synchronous synthesis replaced the
# OLA approximation in the harmonic/aperiodic split.
ALGO_VERSION = 2


def _frame_centers(n_frames: int, hop: int) -> np.ndarray:
    return np.arange(n_frames) * hop


def frames_by_blocks(x: jnp.ndarray, n_frames: int, hop: int, start: int,
                     width: int, pad_mode: str = "constant") -> jnp.ndarray:
    """``frames[f] = x[f*hop + start : f*hop + start + width]`` (out-of-range
    samples per ``pad_mode``: zeros, or "edge" = pyworld's clamped indexing)
    assembled from STATIC hop-block slices instead of an [n_frames, width]
    gather. TPU lowers general gathers to slow scalar-unit loops; frame
    extraction at analysis rates (hundreds of frames x thousands of samples)
    was the CheapTrick/D4C device hot spot, while this form is pure
    reshape/slice/stack that XLA folds into copies."""
    wb = -(-width // hop)  # hop blocks covering one frame
    pad_left = max(0, -start)
    start0 = start + pad_left
    r = start0 % hop
    q = start0 // hop
    n_rows = q + n_frames - 1 + wb + 1
    need = r + n_rows * hop
    pad_right = max(0, need - (x.shape[0] + pad_left))
    xp = jnp.pad(x, (pad_left, pad_right), mode=pad_mode)
    blocks = xp[r: r + n_rows * hop].reshape(n_rows, hop)
    frames = jnp.stack([blocks[q + j: q + j + n_frames] for j in range(wb)],
                       axis=1).reshape(n_frames, wb * hop)
    return frames[:, :width]


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
    offsets = jnp.arange(fft_size) - fft_size // 2
    frames = frames_by_blocks(x, n_frames, hop, -(fft_size // 2), fft_size)

    half_win = 1.5 * fs / f0  # in samples
    t = offsets[None, :] / half_win[:, None]  # [-1, 1] over the active window
    window = jnp.where(jnp.abs(t) < 1.0, 0.5 + 0.5 * jnp.cos(jnp.pi * t), 0.0)
    frames = frames * window
    # weighted-mean removal (WORLD GetWindowedWaveform): subtract the window-
    # shaped DC so offset leakage does not corrupt the low-band envelope
    weight = jnp.sum(frames, axis=1, keepdims=True) / (
        jnp.sum(window, axis=1, keepdims=True) + 1e-12)
    frames = frames - window * weight
    # normalize window power (pyworld normalizes by sqrt of window energy)
    frames = frames / jnp.sqrt(jnp.sum(window * window, axis=1, keepdims=True) + 1e-12)

    power = jnp.abs(jnp.fft.rfft(frames, n=fft_size, axis=1)) ** 2  # [F, bins]
    # DC correction (WORLD DCCorrection): mirror the spectrum below f0 back
    # onto the sub-f0 bins, which otherwise hold only window leakage.
    # f0 <= 800 here, so both the corrected bins and their mirror sources lie
    # in the first ~800/bin_hz columns — the gather stays that narrow instead
    # of spanning the whole spectrum (TPU gathers are scalar-unit loops).
    bin_hz_dc = fs / fft_size
    head = min(n_bins - 1, int(800.0 / bin_hz_dc) + 2)
    freqs_h = jnp.arange(head) * bin_hz_dc
    mirror_f = f0[:, None] - freqs_h[None, :]
    q = mirror_f / bin_hz_dc
    qf = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, head - 1)
    qfrac = q - qf
    p_head = power[:, : head + 1]
    mirrored = jnp.take_along_axis(p_head, qf, axis=1) * (1 - qfrac) + \
        jnp.take_along_axis(p_head, qf + 1, axis=1) * qfrac
    add = jnp.where((mirror_f > 0) & (freqs_h[None, :] < f0[:, None]),
                    mirrored, 0.0)
    power = jnp.concatenate([power[:, :head] + add, power[:, head:]], axis=1)

    # 2. frequency-domain smoothing with a rectangular window of width 2/3 f0.
    # The box integral over the interpolated cumsum equals a local sum of
    # <=ceil(width)+1 cells with trapezoid end weights; evaluating the weight
    # formula over a STATIC absolute-offset range (it vanishes outside the
    # per-frame window) turns the two per-element interpolated-cumsum gathers
    # into ~40 fused static-slice multiply-adds — and the local form is also
    # numerically safer in float32 than the cumsum difference. Numerator
    # equivalence at the clipped edges holds because cells beyond the
    # spectrum contribute zero, exactly like the clamped cumsum endpoints;
    # the denominator keeps the host's clipped extent.
    bin_hz = fs / fft_size
    width_bins = (2.0 / 3.0) * f0 / bin_hz  # [F], in [2, ~25] (f0 in [65, 800])
    w_max = (2.0 / 3.0) * 800.0 / bin_hz
    ext_l = int(np.ceil(w_max / 2.0)) + 2
    k_max = int(np.ceil(w_max)) + 2
    ext = jnp.pad(power, ((0, 0), (ext_l, k_max + 2)))
    t = ext_l - width_bins / 2.0          # lo_q - i on the extended axis
    shift = jnp.floor(t).astype(jnp.int32)
    tfrac = t - jnp.floor(t)
    o_min = int(np.floor(ext_l - w_max / 2.0)) + 1
    o_max = ext_l - 1 + k_max  # max shift is ext_l-1 (width >= 2)
    acc = jnp.zeros((n_frames, n_bins), power.dtype)
    for o in range(o_min, o_max + 1):
        jj = (o - shift).astype(power.dtype)[:, None]
        lo_r = tfrac[:, None] - jj + 1.0
        w = jnp.clip(lo_r + width_bins[:, None], 0.0, 1.0) - \
            jnp.clip(lo_r, 0.0, 1.0)
        acc = acc + w * ext[:, o: o + n_bins]
    pos = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    den = jnp.clip(pos + width_bins[:, None] / 2, 1, n_bins) - \
        jnp.clip(pos - width_bins[:, None] / 2, 0, n_bins - 1)
    smoothed = acc / jnp.maximum(den, 1e-6)
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


# ---------------------------------------------------------------------------
# WORLD-exact synthesis (pyworld.synthesize replacement; synthesis.cpp)
# ---------------------------------------------------------------------------

_SAFE_GUARD = 1e-12


def _minimum_phase_spectrum(log_amp_half: np.ndarray, fft_size: int) -> np.ndarray:
    """Minimum-phase complex spectrum from half log-amplitudes [P, bins].

    WORLD GetMinimumPhaseSpectrum (common.cpp): mirror the log spectrum,
    cepstrum via inverse FFT, causal fold (double positive quefrencies, zero
    negatives, keep bins 0 and N/2), exponentiate the forward FFT.
    """
    # the mirrored log spectrum is real-even, so its cepstrum is real: use the
    # half-spectrum real FFTs (irfft/rfft) — 2x less FFT + exp work than the
    # literal complex mirror/ifft/fft/exp formulation, identical output
    cep = np.fft.irfft(log_amp_half, n=fft_size, axis=1)
    cep[:, 1: fft_size // 2] *= 2.0
    cep[:, fft_size // 2 + 1:] = 0.0
    return np.exp(np.fft.rfft(cep, axis=1))


def _dc_remover(fft_size: int) -> np.ndarray:
    """WORLD GetDCRemover: unit-sum symmetric raised-cosine window."""
    i = np.arange(fft_size // 2)
    half = 0.5 - 0.5 * np.cos(2.0 * np.pi * (i + 1.0) / (1.0 + fft_size))
    w = np.concatenate([half, half[::-1]])
    return w / w.sum()


def _interp_frames(values: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Per-pulse linear interpolation between frames (GetSpectralEnvelope):
    values [F, bins] sampled at fractional frame positions pos [P]."""
    n = values.shape[0]
    lo = np.minimum(np.floor(pos).astype(np.int64), n - 1)
    hi = np.minimum(np.ceil(pos).astype(np.int64), n - 1)
    frac = (pos - lo)[:, None]
    return values[lo] * (1.0 - frac) + values[hi] * frac


def synthesize_world(
    f0: np.ndarray,
    spectrogram: np.ndarray,
    aperiodicity: np.ndarray,
    fs: int,
    hop: int,
    *,
    seed: int = 0,
) -> np.ndarray:
    """WORLD Synthesis (synthesis.cpp), the pyworld.synthesize contract.

    :param f0: [F] per-frame f0 in Hz (0 = unvoiced)
    :param spectrogram: [F, fft_size//2+1] power spectral envelope
    :param aperiodicity: [F, fft_size//2+1] band aperiodicity in (0, 1]
    :param hop: frame period in samples (frame_period = hop/fs seconds)
    :return: [F*hop] float64 waveform

    Gaussian noise comes from numpy's generator rather than WORLD's xorshift
    randn, so noise realizations differ bit-for-bit; everything else follows
    the C++ structure (time base, pulse extraction, per-pulse responses).
    """
    f0 = np.asarray(f0, np.float64)
    sp = np.asarray(spectrogram, np.float64)
    ap = np.asarray(aperiodicity, np.float64)
    n_frames, n_bins = sp.shape
    fft_size = 2 * (n_bins - 1)
    frame_period = hop / fs
    y_length = n_frames * hop
    rng = np.random.default_rng(seed)

    # --- time base (GetTemporalParametersForTimeBase + GetTimeBase) ---
    lowest_f0 = fs / fft_size + 1.0
    coarse_t = np.arange(n_frames + 1) * frame_period
    coarse_f0 = np.where(f0 < lowest_f0, 0.0, f0)
    coarse_vuv = (coarse_f0 != 0.0).astype(np.float64)
    coarse_f0 = np.append(coarse_f0, 2 * coarse_f0[-1] - coarse_f0[-2])
    coarse_vuv = np.append(coarse_vuv, 2 * coarse_vuv[-1] - coarse_vuv[-2])
    time_axis = np.arange(y_length) / fs
    interp_f0 = np.interp(time_axis, coarse_t, coarse_f0)
    interp_vuv = (np.interp(time_axis, coarse_t, coarse_vuv) > 0.5).astype(np.float64)
    interp_f0 = np.where(interp_vuv == 0.0, DEFAULT_F0, interp_f0)

    # --- pulse locations from phase wrapping (GetPulseLocationsForTimeBase) ---
    total_phase = np.cumsum(2.0 * np.pi * interp_f0 / fs)
    wrap_phase = np.fmod(total_phase, 2.0 * np.pi)
    wrap_diff = np.abs(np.diff(wrap_phase))
    pulse_idx = np.nonzero(wrap_diff > np.pi)[0]  # pulse at sample i
    if pulse_idx.size == 0:
        return np.zeros(y_length)
    y1 = wrap_phase[pulse_idx] - 2.0 * np.pi
    y2 = wrap_phase[pulse_idx + 1]
    time_shift = (-y1 / (y2 - y1)) / fs  # seconds, in [0, 1/fs)
    n_pulses = pulse_idx.size
    # inter-pulse distance; the last pulse gets 0 and contributes nothing
    noise_size = np.diff(pulse_idx, append=pulse_idx[-1])

    # --- per-pulse envelope / aperiodicity (GetSpectralEnvelope/AperiodicRatio)
    frame_pos = (pulse_idx / fs) / frame_period
    env = np.abs(_interp_frames(sp, frame_pos))
    safe_ap = np.clip(ap, 0.001, 0.999999999999)
    ratio = _interp_frames(safe_ap, frame_pos) ** 2
    vuv = interp_vuv[pulse_idx]

    # --- periodic response (GetPeriodicResponse) ---
    periodic = np.zeros((n_pulses, fft_size))
    per_on = (vuv > 0.5) & (ratio[:, 0] <= 0.999)
    if per_on.any():
        log_amp = np.log(env[per_on] * (1.0 - ratio[per_on]) + _SAFE_GUARD) / 2.0
        spec = _minimum_phase_spectrum(log_amp, fft_size)
        # fractional time delay as linear phase; WORLD uses |sin| for the
        # imaginary part (GetSpectrumWithFractionalTimeShift's sqrt(1-cos^2))
        coeff = 2.0 * np.pi * time_shift[per_on] * fs / fft_size
        arg = coeff[:, None] * np.arange(n_bins)[None, :]
        re2, im2 = np.cos(arg), np.abs(np.sin(arg))
        shifted = (spec.real * re2 + spec.imag * im2) + 1j * (
            spec.imag * re2 - spec.real * im2)
        resp = np.fft.fftshift(np.fft.irfft(shifted, n=fft_size, axis=1), axes=1)
        # RemoveDCComponent: the first (acausal-wrap) half is replaced by the
        # DC-removal window, the second half has it subtracted
        dc = resp[:, fft_size // 2:].sum(axis=1, keepdims=True)
        rem = _dc_remover(fft_size)[None, :]
        resp[:, : fft_size // 2] = 0.0
        resp -= dc * rem
        periodic[per_on] = resp

    # --- aperiodic response (GetAperiodicResponse) ---
    offsets = np.arange(fft_size)[None, :]
    active = offsets < noise_size[:, None]
    noise = rng.standard_normal((n_pulses, fft_size)) * active
    mean = noise.sum(axis=1, keepdims=True) / np.maximum(noise_size[:, None], 1)
    noise = (noise - mean) * active
    log_amp_ap = np.where(vuv[:, None] != 0.0,
                          np.log(env * ratio) / 2.0, np.log(env) / 2.0)
    spec_ap = _minimum_phase_spectrum(log_amp_ap, fft_size)
    aperiodic = np.fft.fftshift(
        np.fft.irfft(spec_ap * np.fft.rfft(noise, axis=1), n=fft_size, axis=1),
        axes=1)

    response = periodic * np.sqrt(noise_size)[:, None] + aperiodic

    # --- scatter-add at pulse positions (Synthesis main loop) ---
    # np.bincount is ~20x faster than np.add.at for this dense scatter
    pad_len = y_length + 2 * fft_size
    offset = pulse_idx - fft_size // 2 + 1 + fft_size
    flat_idx = (offset[:, None] + offsets).ravel()
    y = np.bincount(flat_idx, weights=response.ravel(), minlength=pad_len)
    return y[fft_size: fft_size + y_length]


def resolve_world_backend(backend: str = "auto") -> str:
    """'auto' -> 'device' when an accelerator is the default JAX backend,
    else 'host'; DS_WORLD_BACKEND=host|device overrides. Binarizers record
    the resolved value in feature provenance (the float32 device features
    differ from the float64 host goldens at test-bounded tolerance).

    Spawned binarizer workers always resolve 'auto' to 'host': a TPU holds
    one client per host, so only the main process may own the accelerator
    (the provenance strings account for num_workers the same way)."""
    import multiprocessing
    import os

    if backend == "auto":
        env = os.environ.get("DS_WORLD_BACKEND")
        if env:
            backend = env
        elif multiprocessing.current_process().name != "MainProcess":
            backend = "host"  # never create a second accelerator client
        else:
            backend = "device" if jax.default_backend() != "cpu" else "host"
    if backend not in ("host", "device"):
        raise ValueError(f"unknown WORLD backend {backend!r}")
    return backend


def world_harmonic_aperiodic(
    waveform: np.ndarray, f0: np.ndarray, *, fs: int, fft_size: int, hop: int,
    rng: jax.Array | None = None, backend: str = "auto",
):
    """Full WORLD-style decomposition: analyze (cheaptrick + D4C aperiodicity)
    and re-synthesize the harmonic part (ap-weighted, noise off) — the
    reference's 'world' split (decomposed_waveform.py:195-230).

    ``backend``: 'host' = float64 numpy D4C/synthesis (the golden), 'device' =
    the jitted float32 twin (dsp/world_device.py — the TPU-resident path),
    'auto' = device when an accelerator is the default JAX backend
    (overridable with DS_WORLD_BACKEND=host|device). Divergence between the
    two is bounded by tests/test_world_device.py.

    ``rng`` is accepted for API stability but unused: synthesis noise comes
    from seeded generators (one per part, like WORLD's internal randn).
    """
    del rng
    backend = resolve_world_backend(backend)
    if backend == "device":
        from diffsinger_tpu.dsp.world_device import (
            world_harmonic_aperiodic_device,
        )

        return world_harmonic_aperiodic_device(
            waveform, f0, fs=fs, fft_size=fft_size, hop=hop)
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

    # both parts are *synthesized* with WORLD's exact pulse-synchronous
    # synthesis, mirroring the reference's two pyworld.synthesize calls
    # (decomposed_waveform.py:208-229) — subtraction would be phase-incoherent
    env_np = np.asarray(env, np.float64)
    ap_np = np.asarray(ap, np.float64)
    f0_np = np.asarray(f0j, np.float64)
    harmonic = fit(synthesize_world(
        f0_np, np.clip(env_np * (1.0 - ap_np ** 2), 1e-16, None),
        np.zeros_like(ap_np), fs, hop, seed=0,
    ))
    aperiodic = fit(synthesize_world(
        f0_np, env_np * ap_np ** 2, np.ones_like(ap_np), fs, hop, seed=1,
    ))
    return harmonic, aperiodic
