"""Frame-level DSP helpers: RMS energy, smoothing, f0 interpolation.

Parity references: utils/binarizer_utils.py (energy/smoothing) and
utils/pitch_utils.py (interp_f0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rms_frames(y: jnp.ndarray, *, frame_length: int, hop: int) -> jnp.ndarray:
    """librosa.feature.rms equivalent: center-pad with zeros by frame_length//2,
    frame, sqrt(mean(x^2)). [L] -> [F] with F = 1 + L//hop."""
    pad = frame_length // 2
    y = jnp.pad(y, (pad, pad))
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    frames = y[idx]
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1))


def amplitude_to_db(x: np.ndarray, amin: float = 1e-5, top_db: float = 80.0) -> np.ndarray:
    """librosa.amplitude_to_db with ref=1.0: 20*log10(max(|x|, amin)), clipped to
    [max - top_db, max]."""
    db = 20.0 * np.log10(np.maximum(amin, np.abs(x)))
    if top_db is not None:
        db = np.maximum(db, db.max() - top_db)
    return db


def get_energy(waveform: np.ndarray, length: int, *, hop_size: int, win_size: int, domain: str = "db") -> np.ndarray:
    """RMS energy per frame, in dB (reference utils/binarizer_utils.py:82-102)."""
    energy = np.asarray(rms_frames(jnp.asarray(waveform, jnp.float32), frame_length=win_size, hop=hop_size))
    if len(energy) < length:
        energy = np.pad(energy, (0, length - len(energy)))
    energy = energy[:length]
    if domain == "db":
        energy = amplitude_to_db(energy)
    elif domain != "amplitude":
        raise ValueError(f"Invalid domain: {domain}")
    return energy


def sinusoidal_smoothing_kernel(kernel_size: int) -> np.ndarray:
    """Half-sine window normalized to sum 1 (reference SinusoidalSmoothingConv1d,
    utils/binarizer_utils.py:212-227).

    kernel_size 1 is the identity tap [1.0] — the literal formula gives
    sin(0)/0 = NaN (the reference shares that edge; its default smoothing
    widths never reach size 1, but `max(1, round(width/timestep))` call
    sites can)."""
    if kernel_size <= 1:
        return np.ones((1,), np.float32)
    k = np.sin(np.linspace(0, 1, kernel_size, dtype=np.float32) * np.pi)
    return k / k.sum()


def sinusoidal_smooth_np(curve: np.ndarray, kernel_size: int) -> np.ndarray:
    """Host-side twin of :func:`sinusoidal_smooth` (same replicate-pad 'same'
    conv).  Inference drivers use this for per-segment preprocessing so a
    tiny 1-D smoothing never costs a device round trip (the remote-TPU
    tunnel charges ~0.3 s per dispatch; see NOTES.md)."""
    kernel = sinusoidal_smoothing_kernel(kernel_size)
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size - 1 - pad_l
    x = np.pad(np.asarray(curve, np.float32),
               [(0, 0)] * (curve.ndim - 1) + [(pad_l, pad_r)], mode="edge")
    flat = x.reshape(-1, x.shape[-1])
    out = np.stack([np.convolve(v, kernel[::-1], mode="valid") for v in flat])
    return out.reshape(*curve.shape[:-1], -1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def sinusoidal_smooth(curve: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """'same' conv with replicate padding over the last axis of [..., T]."""
    kernel = jnp.asarray(sinusoidal_smoothing_kernel(kernel_size))
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size - 1 - pad_l
    x = jnp.pad(curve, [(0, 0)] * (curve.ndim - 1) + [(pad_l, pad_r)], mode="edge")
    flat = x.reshape(-1, x.shape[-1])
    out = jax.vmap(
        lambda v: jnp.convolve(v, kernel[::-1], mode="valid", precision=jax.lax.Precision.HIGHEST)
    )(flat)
    return out.reshape(*curve.shape[:-1], -1)


def norm_f0(f0: np.ndarray, uv: np.ndarray | None = None) -> np.ndarray:
    if uv is None:
        uv = f0 == 0
    out = np.log2(f0 + uv)
    out[uv] = -np.inf
    return out


def denorm_f0(f0: np.ndarray, uv, pitch_padding=None) -> np.ndarray:
    out = 2.0 ** f0
    if uv is not None:
        out[uv > 0] = 0
    if pitch_padding is not None:
        out[pitch_padding] = 0
    return out


def interp_f0(f0: np.ndarray, uv: np.ndarray | None = None):
    """Log-domain linear interpolation through unvoiced gaps
    (reference utils/pitch_utils.py:13-18). Returns (f0, uv)."""
    if uv is None:
        uv = f0 == 0
    log_f0 = norm_f0(f0, uv)
    if uv.any() and not uv.all():
        log_f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], log_f0[~uv])
    return denorm_f0(log_f0, uv=None), uv
