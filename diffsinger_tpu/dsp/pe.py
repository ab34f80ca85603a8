"""Pitch extractors (reference modules/pe + basics/base_pe.py).

The reference's default PE is Praat's autocorrelation method via parselmouth
(C++). Neither parselmouth nor pyworld exist in this environment, so the
default here is a **native JAX autocorrelation PE** in the same family
(Boersma-style: window-ACF-corrected normalized autocorrelation, parabolic
peak interpolation, octave-cost candidate selection + median smoothing) —
frame-parallel and jit-compiled, an excellent XLA fit.

Registry parity: 'parselmouth' (-> native ACF), 'harvest' (-> ACF with a
warning; a native Harvest port is future work), 'rmvpe' (NN extractor, needs a
checkpoint; see diffsinger_tpu.models.rmvpe).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.common import interp_f0
from diffsinger_tpu.dsp.stft import frame_signal


class BasePE:
    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        raise NotImplementedError()


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "hop", "lag_min", "lag_max", "voicing_threshold"),
)
def _acf_frames(
    y: jnp.ndarray, *, win_size: int, hop: int, lag_min: int, lag_max: int,
    voicing_threshold: float = 0.45,
):
    """Normalized, window-corrected autocorrelation per frame.

    Returns (lag_est [F] float, strength [F], rms [F]).
    """
    frames = frame_signal(y[None], win_size, hop)[0]  # [F, W]
    frames = frames - frames.mean(axis=1, keepdims=True)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=1))
    window = jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_size) / (win_size - 1)), jnp.float32)
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
    # candidates are LOCAL maxima of the ACF (not the trivially-high small lags)
    is_peak = jnp.zeros_like(r, dtype=bool)
    is_peak = is_peak.at[:, 1:-1].set((r[:, 1:-1] > r[:, :-2]) & (r[:, 1:-1] >= r[:, 2:]))
    # Praat-style octave cost: penalize longer lags so subharmonics (octave-down
    # errors) only win when genuinely stronger
    octave_cost = 0.05
    penalty = octave_cost * jnp.log2(jnp.maximum(lags, 1) / lag_min)
    r_masked = jnp.where(valid[None, :] & is_peak, r - penalty[None, :], -jnp.inf)
    best = jnp.argmax(r_masked, axis=1)  # [F]

    # parabolic interpolation around the peak
    f_idx = jnp.arange(r.shape[0])
    rm1 = r[f_idx, jnp.maximum(best - 1, 0)]
    rp1 = r[f_idx, jnp.minimum(best + 1, lag_max + 1)]
    rb = r[f_idx, best]
    denom = rm1 - 2 * rb + rp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (rm1 - rp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag_est = best.astype(jnp.float32) + delta
    has_peak = jnp.isfinite(jnp.max(r_masked, axis=1))
    strength = jnp.where(has_peak, jnp.clip(rb, 0.0, 1.2), 0.0)
    return lag_est, strength, rms


def _median3(x: np.ndarray) -> np.ndarray:
    if len(x) < 3:
        return x
    stacked = np.stack([np.roll(x, 1), x, np.roll(x, -1)])
    out = np.median(stacked, axis=0)
    out[0], out[-1] = x[0], x[-1]
    return out


class AcfPE(BasePE):
    """Native autocorrelation pitch extractor (Praat-ac family)."""

    def __init__(self, voicing_threshold: float = 0.45):
        self.voicing_threshold = voicing_threshold

    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        hop = int(np.round(hop_size * speed))
        # window: >= 2 periods of f0_min, rounded to a power of two
        win = int(2 ** np.ceil(np.log2(2 * samplerate / f0_min)))
        pad = win // 2
        y = np.pad(np.asarray(waveform, np.float32), (pad, pad + hop))
        lag_min = max(2, int(samplerate / f0_max))
        lag_max = int(np.ceil(samplerate / f0_min))

        lag, strength, rms = _acf_frames(
            jnp.asarray(y), win_size=win, hop=hop, lag_min=lag_min, lag_max=lag_max,
        )
        lag = np.asarray(lag)
        strength = np.asarray(strength)
        rms = np.asarray(rms)

        f0 = samplerate / np.maximum(lag, 1e-6)
        silence = rms < max(1e-4, 0.015 * max(rms.max(), 1e-9))
        voiced = (strength > self.voicing_threshold) & ~silence
        f0 = np.where(voiced, f0, 0.0).astype(np.float32)
        f0 = np.where((f0 >= f0_min) & (f0 <= f0_max), f0, 0.0)
        f0 = _median3(f0)

        if len(f0) < length:
            f0 = np.pad(f0, (0, length - len(f0)))
        f0 = f0[:length]
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv


class HarvestPE(AcfPE):
    """'harvest' requests (pyworld) fall back to the native ACF extractor."""

    def __init__(self):
        warnings.warn("pyworld Harvest is unavailable; using the native ACF pitch extractor.")
        super().__init__()


def initialize_pe(hparams: dict) -> BasePE:
    """PE registry (reference modules/pe/__init__.py:8-18)."""
    name = hparams.get("pe", "parselmouth")
    if name == "parselmouth":
        return AcfPE()
    if name == "harvest":
        return HarvestPE()
    if name == "rmvpe":
        from diffsinger_tpu.models.rmvpe import RMVPE

        return RMVPE(hparams["pe_ckpt"])
    raise ValueError(f" [x] Unknown pitch extractor: {name}")
