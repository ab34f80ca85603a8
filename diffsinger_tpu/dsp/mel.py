"""STFT + mel spectrogram, jit-compiled for TPU.

Numerical parity targets (see SURVEY.md §7.2#2):

* framing/padding/window conventions of the reference mel frontend
  (modules/nsf_hifigan/nvSTFT.py:51-87): reflect-pad by
  ``((win-hop)//2, (win-hop+1)//2)``, periodic Hann window, ``center=False``
  STFT, magnitude, mel filterbank matmul, ``log(clamp(x, 1e-5))``;
* librosa's Slaney-scale, Slaney-normalized mel filterbank (precomputed on host
  in numpy, closed over by the jitted function as a constant);
* ``keyshift``/``speed`` semantics: the FFT/window lengths scale by
  ``2**(keyshift/12)`` and the hop by ``speed``, with spectrum rescaling.

The FFT path runs in float32: mel extraction happens once per item at
binarization time, so MXU-width bf16 tricks are not worth the precision loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   htk: bool = False) -> np.ndarray:
    """Slaney-normalized triangular filterbank, identical to
    ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk=htk)``.
    Returns [n_mels, n_fft//2+1]."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    if htk:
        mel_pts = np.linspace(hz_to_mel_htk(fmin), hz_to_mel_htk(fmax), n_mels + 2)
        hz_pts = mel_to_hz_htk(mel_pts)
    else:
        mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
        hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window_periodic(n: int) -> np.ndarray:
    """torch.hann_window(n) (periodic=True)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, F, frame_length] with F = 1 + (L - frame_length)//hop.

    Uses a gather over a precomputed (static) index grid — XLA lowers this to an
    efficient strided load; frame count is static for a given padded length.
    """
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray, *, n_fft: int, hop: int, win_size: int, window: jnp.ndarray
) -> jnp.ndarray:
    """Magnitude STFT of [B, L] -> [B, n_fft//2+1, F]; center=False (caller pads).

    Matches ``torch.stft(..., center=False, onesided=True).abs()`` with a window
    shorter than ``n_fft`` zero-padded symmetrically (torch convention).
    """
    frames = _frame(y, win_size, hop)  # [B, F, win]
    frames = frames * window[None, None, :]
    if win_size < n_fft:
        lpad = (n_fft - win_size) // 2
        frames = jnp.pad(frames, ((0, 0), (0, 0), (lpad, n_fft - win_size - lpad)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(-2, -1)  # [B, n_fft//2+1, F]


class MelSpectrogram:
    """Precomputes filterbank/window constants on host; `__call__` is jittable.

    Equivalent of the reference ``STFT.get_mel`` (modules/nsf_hifigan/nvSTFT.py:51-87).
    """

    def __init__(
        self,
        sr: int = 44100,
        n_mels: int = 128,
        n_fft: int = 2048,
        win_size: int = 2048,
        hop_size: int = 512,
        fmin: float = 40.0,
        fmax: float = 16000.0,
        clip_val: float = 1e-5,
    ):
        self.sr = sr
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.win_size = win_size
        self.hop_size = hop_size
        self.fmin = fmin
        self.fmax = fmax
        self.clip_val = clip_val
        # kept as numpy: instances are pickled into spawn binarization workers,
        # and a device array here would initialize the child's JAX backend at
        # unpickle time, before the worker pins itself to CPU (it becomes an
        # XLA constant at trace time either way)
        self.mel_basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    def num_frames(self, num_samples: int, *, keyshift: float = 0.0, speed: float = 1.0) -> int:
        factor = 2 ** (keyshift / 12)
        win_new = int(round(self.win_size * factor))
        hop_new = int(round(self.hop_size * speed))
        padded = num_samples + (win_new - hop_new) // 2 + (win_new - hop_new + 1) // 2
        return 1 + (padded - win_new) // hop_new

    def __call__(self, y: jnp.ndarray, *, keyshift: float = 0.0,
                 speed: float = 1.0, pre_padded: bool = False) -> jnp.ndarray:
        """[B, L] float32 in [-1, 1] -> log-mel [B, n_mels, F] (log-e, clamp 1e-5).

        ``pre_padded=True`` skips the internal reflect padding (the caller has
        already applied it) — used by :meth:`bucketed`.

        The keyshift/speed floats reach the compiled program only through the
        derived integer window/hop lengths, so the jit cache is keyed on those
        ints — continuous augmentation draws that round to the same geometry
        share one compile (the floats themselves would each be a distinct
        static-arg cache key)."""
        factor = 2 ** (keyshift / 12)
        return self._impl(
            y,
            n_fft_new=int(round(self.n_fft * factor)),
            win_new=int(round(self.win_size * factor)),
            hop_new=int(round(self.hop_size * speed)),
            resize_spec=keyshift != 0,
            pre_padded=pre_padded,
        )

    @functools.partial(
        jax.jit, static_argnums=0,
        static_argnames=("n_fft_new", "win_new", "hop_new", "resize_spec",
                         "pre_padded"))
    def _impl(self, y: jnp.ndarray, *, n_fft_new: int, win_new: int,
              hop_new: int, resize_spec: bool, pre_padded: bool) -> jnp.ndarray:
        window = jnp.asarray(hann_window_periodic(win_new))

        if not pre_padded:
            pad_l = (win_new - hop_new) // 2
            pad_r = (win_new - hop_new + 1) // 2
            y = jnp.pad(y, ((0, 0), (pad_l, pad_r)), mode="reflect")

        spec = stft_magnitude(y, n_fft=n_fft_new, hop=hop_new, win_size=win_new, window=window)
        if resize_spec:
            size = self.n_fft // 2 + 1
            resize = spec.shape[1]
            if resize < size:
                spec = jnp.pad(spec, ((0, 0), (0, size - resize), (0, 0)))
            spec = spec[:, :size, :] * (self.win_size / win_new)
        mel = jnp.einsum(
            "mk,bkt->bmt",
            self.mel_basis,
            spec,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.log(jnp.clip(mel, min=self.clip_val))

    def bucketed(self, y: np.ndarray, *, keyshift: float = 0.0,
                 speed: float = 1.0, quantum: int = 128) -> np.ndarray:
        """Bit-exact log-mel of a 1-D waveform with shape-bucketed compilation.

        The jitted :meth:`__call__` compiles once per input length; over a
        remote TPU runtime a cold mel compile costs minutes, so per-item
        lengths are ruinous for binarization. This entry reflect-pads on the
        host exactly as the jitted path would, zero-pads to a frame count
        quantized to ``quantum`` (frame math is window-local, so the first F
        true frames are bitwise identical), runs the jitted program on the
        bucketed shape, and trims. Distinct compiles are bounded by
        O(max_item_frames / quantum) per (keyshift, speed).

        Returns [n_mels, F] float32.
        """
        y = np.asarray(y, np.float32)
        factor = 2 ** (keyshift / 12)
        win_new = int(round(self.win_size * factor))
        hop_new = int(round(self.hop_size * speed))
        n_frames = self.num_frames(len(y), keyshift=keyshift, speed=speed)
        pad_l = (win_new - hop_new) // 2
        pad_r = (win_new - hop_new + 1) // 2
        yp = np.pad(y, (pad_l, pad_r), mode="reflect")
        fb = -(-n_frames // quantum) * quantum
        need = win_new + (fb - 1) * hop_new
        if need > len(yp):
            yp = np.pad(yp, (0, need - len(yp)))
        else:
            # canonicalize DOWN too: samples beyond `need` contribute no frame
            # (frame count is fb either way), and without the trim an exact
            # bucket multiple leaks the raw per-item length into the jit key
            yp = yp[:need]
        out = self(jnp.asarray(yp)[None], keyshift=keyshift, speed=speed,
                   pre_padded=True)
        return np.asarray(out[0, :, :n_frames])


def get_mel(
    waveform: np.ndarray,
    samplerate: int,
    *,
    num_mel_bins: int = 128,
    hop_size: int = 512,
    win_size: int = 2048,
    fft_size: int = 2048,
    fmin: float = 40,
    fmax: float = 16000,
    keyshift: float = 0,
    speed: float = 1,
) -> np.ndarray:
    """Convenience host API mirroring reference get_mel_torch
    (utils/binarizer_utils.py:13-26). Returns [T, n_mels]."""
    stft = MelSpectrogram(samplerate, num_mel_bins, fft_size, win_size, hop_size, fmin, fmax)
    mel = stft(jnp.asarray(waveform, dtype=jnp.float32)[None], keyshift=keyshift, speed=speed)
    return np.asarray(mel[0]).T
