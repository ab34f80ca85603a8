"""Pitch extractors (reference modules/pe + basics/base_pe.py).

The reference's default PE is Praat's autocorrelation method via parselmouth
(C++). Neither parselmouth nor pyworld exist in this environment, so the
default here is a **native JAX autocorrelation PE** implementing the same
algorithm family (Boersma 1993): window-ACF-corrected normalized
autocorrelation, parabolic peak interpolation, top-K voiced candidates per
frame with Praat's octave cost, an unvoiced candidate from the silence
threshold, and a Viterbi path finder with octave-jump / voiced-unvoiced
transition costs. The ACF + candidate extraction is frame-parallel and the
Viterbi forward pass is a ``lax.scan`` — both jit-compiled; only the trivial
backtrace runs on host.

Registry parity: 'parselmouth' (-> native ACF), 'harvest' (-> native Harvest,
diffsinger_tpu.dsp.harvest), 'rmvpe' (NN extractor, needs a checkpoint; see
diffsinger_tpu.models.rmvpe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.common import interp_f0
from diffsinger_tpu.dsp.stft import frame_signal


class BasePE:
    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        raise NotImplementedError()

    def provenance(self) -> str:
        """Extractor identity string recorded into binarized ``.meta`` so a
        dataset's feature lineage is machine-checkable (pyworld-binarized and
        native-binarized features are close but not bit-identical — see
        tests/test_world_goldens.py for the documented tolerances)."""
        return type(self).__name__


_NEG = -1e9  # sentinel for "no candidate" (avoids inf-inf NaNs in the DP)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "hop", "lag_min", "lag_max", "n_cands", "very_accurate"),
)
def _acf_viterbi(
    y: jnp.ndarray, sr, *, win_size: int, hop: int, lag_min: int, lag_max: int,
    n_cands: int = 14, very_accurate: bool = False,
    voicing_threshold=0.45, silence_threshold=0.03, octave_cost=0.01,
    octave_jump_cost=0.35, voiced_unvoiced_cost=0.14,
):
    """Candidate extraction + Viterbi forward pass (Boersma's 'ac' method).

    ``very_accurate`` selects Praat's accurate variant: a Gaussian window
    (exp(-12(t/T-1/2)^2) rescaled to hit 0 at the edges; the caller doubles
    the physical window length) and windowed-sinc interpolation of the ACF
    around each candidate peak instead of the parabolic fit.

    Returns (f0_cand [F, S], last_delta [S], backptr [F, S]) where
    S = n_cands + 1 and state S-1 is the unvoiced candidate (f0 = 0).
    """
    frames = frame_signal(y[None], win_size, hop)[0]  # [F, W]
    local_peak = jnp.max(jnp.abs(frames), axis=1)     # pre-DC-removal, like Praat
    global_peak = jnp.maximum(jnp.max(jnp.abs(y)), 1e-9)
    frames = frames - frames.mean(axis=1, keepdims=True)
    t = np.arange(win_size) / max(win_size - 1, 1)
    if very_accurate:
        edge = np.exp(-12.0)
        window = jnp.asarray(
            (np.exp(-12.0 * (t - 0.5) ** 2) - edge) / (1.0 - edge), jnp.float32
        )
    else:
        window = jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * t), jnp.float32)
    fw = frames * window

    n_fft = int(2 ** np.ceil(np.log2(2 * win_size)))
    spec = jnp.fft.rfft(fw, n=n_fft, axis=1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft, axis=1)[:, : lag_max + 2]
    r0 = jnp.maximum(acf[:, :1], 1e-12)
    r = acf / r0

    wspec = jnp.fft.rfft(window, n=n_fft)
    wacf = jnp.fft.irfft(wspec * jnp.conj(wspec), n=n_fft)[: lag_max + 2]
    wacf = wacf / jnp.maximum(wacf[0], 1e-12)
    r = r / jnp.maximum(wacf[None, :], 1e-3)  # Boersma's window correction

    lags = jnp.arange(lag_max + 2)
    valid = (lags >= lag_min) & (lags <= lag_max)
    # voiced candidates are LOCAL maxima of the corrected ACF
    is_peak = jnp.zeros_like(r, dtype=bool)
    is_peak = is_peak.at[:, 1:-1].set((r[:, 1:-1] > r[:, :-2]) & (r[:, 1:-1] >= r[:, 2:]))
    r_peaks = jnp.where(valid[None, :] & is_peak, r, _NEG)
    vals, idx = jax.lax.top_k(r_peaks, n_cands)  # [F, K]
    has_cand = vals > _NEG / 2

    # parabolic interpolation of lag and peak value around each candidate
    rm1 = jnp.take_along_axis(r, jnp.maximum(idx - 1, 0), axis=1)
    rp1 = jnp.take_along_axis(r, jnp.minimum(idx + 1, lag_max + 1), axis=1)
    rb = jnp.take_along_axis(r, idx, axis=1)
    denom = rm1 - 2 * rb + rp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (rm1 - rp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag_est = idx.astype(jnp.float32) + delta
    r_int = rb + 0.5 * (rp1 - rm1) * delta + 0.5 * denom * delta * delta
    r_int = jnp.clip(r_int, -1.0, 1.5)

    if very_accurate:
        # windowed-sinc interpolation of the ACF around each candidate
        # (Praat's sinc70 depth), maximized on a fine lag grid + parabolic
        # vertex — replaces the 3-point parabolic estimate above
        depth = 35
        taps = jnp.arange(-depth, depth + 1)                       # [T]
        gi = jnp.clip(idx[:, :, None] + taps[None, None, :], 0, lag_max + 1)
        r_win = jnp.take_along_axis(
            r, gi.reshape(gi.shape[0], -1), axis=1
        ).reshape(gi.shape)                                        # [F, K, T]
        grid = jnp.linspace(-0.7, 0.7, 29)                         # [G]
        xg = grid[:, None] - taps[None, :].astype(jnp.float32)     # [G, T]
        ws = jnp.sinc(xg) * (0.5 + 0.5 * jnp.cos(np.pi * xg / (depth + 1)))
        r_g = jnp.einsum("fkt,gt->fkg", r_win, ws)                 # [F, K, G]
        best = jnp.argmax(r_g, axis=-1)
        bc = jnp.clip(best, 1, grid.shape[0] - 2)
        rbm = jnp.take_along_axis(r_g, (bc - 1)[..., None], -1)[..., 0]
        rbb = jnp.take_along_axis(r_g, bc[..., None], -1)[..., 0]
        rbp = jnp.take_along_axis(r_g, (bc + 1)[..., None], -1)[..., 0]
        den2 = rbm - 2 * rbb + rbp
        sub = jnp.where(jnp.abs(den2) > 1e-12, 0.5 * (rbm - rbp) / den2, 0.0)
        sub = jnp.clip(sub, -1.0, 1.0)
        dg = grid[1] - grid[0]
        lag_est = idx.astype(jnp.float32) + grid[bc] + sub * dg
        r_int = jnp.clip(
            rbb + 0.5 * (rbp - rbm) * sub + 0.5 * den2 * sub * sub, -1.0, 1.5
        )

    f0_v = sr / jnp.maximum(lag_est, 1e-6)  # [F, K]
    # local strength R = r - OctaveCost * log2(MinimumPitch * tau)  (Boersma eq. 26)
    f0_min_hz = sr / lag_max
    strength_v = r_int - octave_cost * jnp.log2(f0_min_hz * lag_est / sr)
    strength_v = jnp.where(has_cand, strength_v, _NEG)

    # unvoiced candidate: R = VT + max(0, 2 - intensity / (ST / (1 + VT)))
    intensity = local_peak / global_peak
    strength_uv = voicing_threshold + jnp.maximum(
        0.0, 2.0 - intensity / (silence_threshold / (1.0 + voicing_threshold))
    )

    strength = jnp.concatenate([strength_v, strength_uv[:, None]], axis=1)  # [F, S]
    f0_cand = jnp.concatenate(
        [jnp.where(has_cand, f0_v, 1.0), jnp.zeros_like(strength_uv)[:, None]], axis=1
    )
    is_voiced = jnp.concatenate(
        [has_cand, jnp.zeros_like(strength_uv, bool)[:, None]], axis=1
    )

    # Praat calibrates transition costs for a 10 ms step (Pitch_pathFinder)
    step_corr = 0.01 / (hop / sr)
    ojc = octave_jump_cost * step_corr
    vuc = voiced_unvoiced_cost * step_corr

    safe_f0 = jnp.where(is_voiced, f0_cand, 1.0)

    def step(carry, x):
        delta_prev, f_prev, v_prev = carry
        s_t, f_t, v_t = x
        both = v_prev[:, None] & v_t[None, :]
        either = v_prev[:, None] ^ v_t[None, :]
        jump = jnp.abs(jnp.log2(f_prev[:, None] / f_t[None, :]))
        cost = jnp.where(both, ojc * jump, jnp.where(either, vuc, 0.0))
        total = delta_prev[:, None] - cost  # [S_prev, S_cur]
        bp = jnp.argmax(total, axis=0)
        delta_new = s_t + jnp.max(total, axis=0)
        return (delta_new, f_t, v_t), bp

    (last_delta, _, _), bp = jax.lax.scan(
        step,
        (strength[0], safe_f0[0], is_voiced[0]),
        (strength[1:], safe_f0[1:], is_voiced[1:]),
    )
    # bp[t] maps frame t+1's state -> frame t's best predecessor
    return f0_cand, last_delta, bp


class AcfPE(BasePE):
    """Native autocorrelation pitch extractor (Praat-ac family).

    ``very_accurate`` enables Praat's accurate variant: Gaussian window with
    doubled physical length + sinc interpolation of the ACF peaks.
    """

    def __init__(self, voicing_threshold: float = 0.45, very_accurate: bool = False):
        self.voicing_threshold = voicing_threshold
        self.very_accurate = very_accurate

    def provenance(self) -> str:
        return f"native-acf-viterbi(very_accurate={self.very_accurate})"

    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        hop = int(np.round(hop_size * speed))
        # window: >= 2 periods of f0_min (x2 for the Gaussian accurate mode),
        # rounded to a power of two
        periods = 4 if self.very_accurate else 2
        win = int(2 ** np.ceil(np.log2(periods * samplerate / f0_min)))
        pad = win // 2
        y = np.pad(np.asarray(waveform, np.float32), (pad, pad + hop))
        lag_min = max(2, int(samplerate / f0_max))
        lag_max = int(np.ceil(samplerate / f0_min))

        f0_cand, last_delta, bp = _acf_viterbi(
            jnp.asarray(y), float(samplerate), win_size=win, hop=hop,
            lag_min=lag_min, lag_max=lag_max,
            very_accurate=self.very_accurate,
            voicing_threshold=self.voicing_threshold,
        )
        f0_cand = np.asarray(f0_cand)
        bp = np.asarray(bp)

        # backtrace (tiny: F frames of int indexing)
        n_frames = f0_cand.shape[0]
        path = np.empty(n_frames, np.int64)
        path[-1] = int(np.argmax(np.asarray(last_delta)))
        for t in range(n_frames - 2, -1, -1):
            path[t] = bp[t, path[t + 1]]
        f0 = f0_cand[np.arange(n_frames), path].astype(np.float32)
        f0 = np.where((f0 >= f0_min) & (f0 <= f0_max), f0, 0.0)

        if len(f0) < length:
            f0 = np.pad(f0, (0, length - len(f0)))
        f0 = f0[:length]
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv


class HarvestPE(BasePE):
    """Native Harvest extractor (reference modules/pe/pw.py:7-29 contract:
    pw.harvest at frame_period = 1000*hop/sr, pad/crop to `length`)."""

    def provenance(self) -> str:
        from diffsinger_tpu.dsp.harvest import ALGO_VERSION

        return f"native-harvest-v{ALGO_VERSION}"

    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        from diffsinger_tpu.dsp.harvest import harvest

        hop = int(np.round(hop_size * speed))
        time_step_ms = 1000 * hop / samplerate
        f0, _ = harvest(
            np.asarray(waveform, np.float64), samplerate,
            f0_floor=f0_min, f0_ceil=f0_max, frame_period=time_step_ms,
        )
        f0 = f0.astype(np.float32)
        if f0.size < length:
            f0 = np.pad(f0, (0, length - f0.size))
        f0 = f0[:length]
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv


def initialize_pe(hparams: dict) -> BasePE:
    """PE registry (reference modules/pe/__init__.py:8-18)."""
    name = hparams.get("pe", "parselmouth")
    if name == "parselmouth":
        return AcfPE(very_accurate=bool(hparams.get("pe_very_accurate", False)))
    if name == "harvest":
        return HarvestPE()
    if name == "rmvpe":
        from diffsinger_tpu.models.rmvpe import RMVPE

        return RMVPE(hparams["pe_ckpt"])
    raise ValueError(f" [x] Unknown pitch extractor: {name}")
