"""Polyphase resampling (replaces torchaudio Resample / librosa.load's resampler,
SURVEY.md §2.1). Host-side scipy version plus a jit-compiled XLA conv version
for in-graph use (e.g. the RMVPE 16 kHz frontend).
"""

from __future__ import annotations

import functools
import math

import numpy as np


def resample_poly_np(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host resampler (scipy polyphase, Kaiser window)."""
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return resample_poly(y, up, down).astype(np.float32)


def _design_kernel(up: int, down: int, width: int = 16, beta: float = 14.769656459379492):
    """Kaiser-windowed sinc lowpass for polyphase resampling (torchaudio's
    'kaiser_window' parameters)."""
    max_rate = max(up, down)
    cutoff = 0.5 / max_rate
    half = width * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    window = np.kaiser(len(n), beta)
    t = 2 * cutoff * n
    sinc = np.sinc(t)
    kernel = 2 * cutoff * window * sinc
    return kernel.astype(np.float32), int(half)


@functools.partial(__import__("jax").jit, static_argnames=("orig_sr", "target_sr"))
def resample_jax(y, orig_sr: int, target_sr: int):
    """[B, L] -> [B, ceil(L*target/orig)] via upsample-conv-downsample in XLA."""
    import jax
    import jax.numpy as jnp

    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    kernel, half = _design_kernel(up, down)
    k = jnp.asarray(kernel * up)
    out = jax.lax.conv_general_dilated(
        y[:, :, None],
        k[:, None, None],
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :, 0]
    target_len = -(-y.shape[1] * up // down)
    return out[:, :target_len]
