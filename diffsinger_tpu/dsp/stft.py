"""Complex STFT / iSTFT (torch.stft/istft conventions, center=True).

Used by the harmonic-noise decomposition (kth-harmonic masking) and the hnsep
networks. Frame-parallel: framing is slice+reshape (no gathers), FFTs batch
over frames, iSTFT overlap-add is a scatter-free transposed reshape.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, F, frame_length], F = 1 + (L - frame_length)//hop.

    Decomposed into ceil(frame/hop) strided slices + reshapes (XLA-friendly,
    no index gathers)."""
    B, L = y.shape
    F = 1 + (L - frame_length) // hop
    k = -(-frame_length // hop)
    xp = jnp.pad(y, ((0, 0), (0, hop * k)))
    parts = []
    for j in range(k):
        size = min(hop, frame_length - j * hop)
        seg = xp[:, j * hop : j * hop + F * hop].reshape(B, F, hop)
        parts.append(seg[:, :, :size])
    return jnp.concatenate(parts, axis=-1)


def stft_complex(
    y: jnp.ndarray, *, n_fft: int, hop: int, win_size: int, window: jnp.ndarray,
    center: bool = True,
) -> jnp.ndarray:
    """torch.stft parity: [B, L] -> complex [B, F, n_fft//2+1] (frame-major)."""
    if center:
        y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    frames = frame_signal(y, win_size, hop) * window[None, None, :]
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        frames = jnp.pad(frames, ((0, 0), (0, 0), (lpad, n_fft - win_size - lpad)))
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(
    spec: jnp.ndarray, *, n_fft: int, hop: int, win_size: int, window: jnp.ndarray,
    center: bool = True, length: int | None = None,
) -> jnp.ndarray:
    """torch.istft parity: complex [B, F, n_fft//2+1] -> [B, L].

    Overlap-add with squared-window normalization. OLA is computed with a
    pad+reshape trick: each frame occupies k = ceil(win/hop) hop-slots; summing
    k shifted copies is a reshape+sum, not a scatter."""
    B, F, _ = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        frames = frames[:, :, lpad : lpad + win_size]
    frames = frames * window[None, None, :]

    k = -(-win_size // hop)
    pad_win = k * hop
    frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, pad_win - win_size)))
    # [B, F, k, hop] -> for each offset j, frames' slot j lands at (i + j) * hop
    slots = frames_p.reshape(B, F, k, hop)
    total_slots = F + k  # output covers (F-1)*hop + k*hop samples
    out = jnp.zeros((B, total_slots, hop), frames.dtype)
    wsum = jnp.zeros((total_slots, hop), frames.dtype)
    win_sq = jnp.pad(window * window, (0, pad_win - win_size)).reshape(k, hop)
    ones = jnp.ones((F, 1, 1))
    for j in range(k):
        out = out.at[:, j : j + F].add(slots[:, :, j])
        wsum = wsum.at[j : j + F].add(win_sq[j] * ones[:, 0])
    y = out.reshape(B, -1)
    norm = wsum.reshape(-1)
    y = y / jnp.maximum(norm, 1e-11)
    if center:
        y = y[:, n_fft // 2 :]
        if length is not None:
            y = y[:, :length]
    elif length is not None:
        y = y[:, :length]
    return y


def nuttall_window(win_size: int) -> np.ndarray:
    """Nuttall window as used in the kth-harmonic extractor
    (reference utils/decomposed_waveform.py:158-164)."""
    phase = np.arange(win_size, dtype=np.float64) / win_size * 2 * np.pi
    return (
        0.355768
        - 0.487396 * np.cos(phase)
        + 0.144232 * np.cos(2 * phase)
        - 0.012604 * np.cos(3 * phase)
    ).astype(np.float32)
