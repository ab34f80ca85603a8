"""Harmonic / aperiodic waveform decomposition (reference
utils/decomposed_waveform.py).

Algorithms:

* ``comb`` (TPU-native default here): full harmonic part via comb masking of
  the complex STFT — the same Nuttall-window f0-centered band masking the
  reference uses for single harmonics (decomposed_waveform.py:132-193) applied
  at every harmonic multiple simultaneously; aperiodic = waveform - harmonic.
  Frame-parallel, one STFT/iSTFT pair, jit-compiled.
* ``world``: native WORLD-style analysis/resynthesis (diffsinger_tpu.dsp.world):
  CheapTrick spectral envelope + spectral-floor band aperiodicity, both parts
  re-synthesized exactly like the reference's pyworld path
  (decomposed_waveform.py:195-230). Divergence: the aperiodicity estimator is
  a spectral-floor method rather than a faithful D4C port.
* ``vr``: vocal-remover CascadedNet (see diffsinger_tpu.models.hnsep); used
  when a checkpoint is available, else falls back to ``comb``.

The kth-harmonic extractor is an exact port of the reference masking math.
"""

from __future__ import annotations

import functools
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.common import interp_f0
from diffsinger_tpu.dsp.stft import istft, nuttall_window, stft_complex


@functools.partial(jax.jit, static_argnames=("hop_size", "win_size", "samplerate", "half_width"))
def _masked_band_resynth(
    waveform: jnp.ndarray,
    f0_frames: jnp.ndarray,
    *,
    hop_size: int,
    win_size: int,
    samplerate: int,
    half_width: float = 3.5,
) -> jnp.ndarray:
    """Keep STFT bins within ``half_width`` bins of per-frame center frequency
    ``f0_frames`` (Hz), resynthesize (decomposed_waveform.py:158-193).

    waveform: [L]; f0_frames: [F] (>= #stft frames; extra tail ignored).
    """
    window = jnp.asarray(nuttall_window(win_size))
    spec = stft_complex(
        waveform[None], n_fft=win_size, hop=hop_size, win_size=win_size,
        window=window, center=True,
    )  # [1, F_s, K]
    n_frames, n_specs = spec.shape[1], spec.shape[2]
    f0 = f0_frames[:n_frames]
    f0 = jnp.pad(f0, (0, n_frames - f0.shape[0]))
    center = f0 * win_size / samplerate  # [F_s]
    idx = jnp.arange(n_specs, dtype=jnp.float32)[None, :]
    start = jnp.clip(center[:, None] - half_width, min=0)
    end = jnp.clip(center[:, None] + half_width, max=n_specs)
    mask = (center[:, None] >= 1) & (idx >= start) & (idx < end)
    spec = spec * mask[None]
    return istft(
        spec, n_fft=win_size, hop=hop_size, win_size=win_size, window=window,
        center=True, length=waveform.shape[0],
    )[0]


@functools.partial(jax.jit, static_argnames=("hop_size", "win_size", "samplerate", "half_width", "max_harmonics"))
def _comb_harmonic_resynth(
    waveform: jnp.ndarray,
    f0_frames: jnp.ndarray,
    *,
    hop_size: int,
    win_size: int,
    samplerate: int,
    half_width: float = 3.5,
    max_harmonics: int = 256,
) -> jnp.ndarray:
    """Comb mask: keep bins within half_width of ANY harmonic k*f0 (k>=1)."""
    window = jnp.asarray(nuttall_window(win_size))
    spec = stft_complex(
        waveform[None], n_fft=win_size, hop=hop_size, win_size=win_size,
        window=window, center=True,
    )
    n_frames, n_specs = spec.shape[1], spec.shape[2]
    f0 = f0_frames[:n_frames]
    f0 = jnp.pad(f0, (0, n_frames - f0.shape[0]))
    bins_per_hz = win_size / samplerate
    f0_bins = jnp.maximum(f0 * bins_per_hz, 1e-3)  # [F]
    idx = jnp.arange(n_specs, dtype=jnp.float32)[None, :]
    # distance from each bin to the nearest harmonic of f0 (in bins)
    ratio = idx / f0_bins[:, None]
    nearest_k = jnp.clip(jnp.round(ratio), 1, max_harmonics)
    dist = jnp.abs(idx - nearest_k * f0_bins[:, None])
    voiced = (f0[:, None] > 0) & (f0_bins[:, None] >= 1)
    mask = voiced & (dist < half_width)
    spec = spec * mask[None]
    return istft(
        spec, n_fft=win_size, hop=hop_size, win_size=win_size, window=window,
        center=True, length=waveform.shape[0],
    )[0]


class DecomposedWaveform:
    """Lazily decomposes a waveform into harmonic/aperiodic parts and isolated
    harmonics, caching results (interface parity with the reference)."""

    def __init__(
        self, waveform: np.ndarray, samplerate: int, f0: np.ndarray,
        *, hop_size: int, fft_size: Optional[int] = None, win_size: Optional[int] = None,
        algorithm: str = "comb", base_harmonic_radius: float = 3.5,
        hnsep_ckpt: Optional[str] = None,
    ):
        if algorithm in ("world", "vr") and not self._backend_available(algorithm, hnsep_ckpt):
            warnings.warn(
                f"hnsep algorithm '{algorithm}' unavailable "
                f"(missing {'pyworld' if algorithm == 'world' else 'checkpoint'}); "
                f"falling back to 'comb'."
            )
            algorithm = "comb"
        self.algorithm = algorithm
        self._waveform = np.asarray(waveform, np.float32)
        self._samplerate = samplerate
        self._f0 = np.asarray(f0, np.float32)
        self._hop_size = hop_size
        self._win_size = win_size if win_size is not None else fft_size
        self._fft_size = fft_size if fft_size is not None else win_size
        self._half_width = base_harmonic_radius
        self._hnsep_ckpt = hnsep_ckpt
        self._harmonic_part: Optional[np.ndarray] = None
        self._aperiodic_part: Optional[np.ndarray] = None
        self._harmonics: Dict[int, np.ndarray] = {}

    @staticmethod
    def _backend_available(algorithm: str, hnsep_ckpt) -> bool:
        if algorithm == "vr":
            import pathlib

            return hnsep_ckpt is not None and pathlib.Path(hnsep_ckpt).exists()
        return True  # 'world' is native (dsp/world.py); 'comb' always available

    # -- properties matching the reference ------------------------------
    @property
    def samplerate(self):
        return self._samplerate

    @property
    def hop_size(self):
        return self._hop_size

    @property
    def fft_size(self):
        return self._fft_size

    @property
    def win_size(self):
        return self._win_size

    # --------------------------------------------------------------
    def _aligned_f0(self, multiplier: float = 1.0) -> np.ndarray:
        n_samples = len(self._waveform)
        f0 = self._f0 * multiplier
        pad_size = int(n_samples // self._hop_size) - len(f0) + 1
        if pad_size > 0:
            f0 = np.pad(f0, (0, pad_size), mode="edge")
        f0, _ = interp_f0(f0, uv=f0 == 0)
        return f0.astype(np.float32)

    def _kth_harmonic(self, k: int) -> np.ndarray:
        if k in self._harmonics:
            return self._harmonics[k]
        f0 = self._aligned_f0(k + 1)
        out = _masked_band_resynth(
            jnp.asarray(self.harmonic()), jnp.asarray(f0),
            hop_size=self._hop_size, win_size=self._win_size,
            samplerate=self._samplerate, half_width=self._half_width,
        )
        self._harmonics[k] = np.asarray(out)
        return self._harmonics[k]

    def _decompose(self):
        if self.algorithm == "vr":
            from diffsinger_tpu.models.hnsep import predict_harmonic

            self._harmonic_part = predict_harmonic(self._hnsep_ckpt, self._waveform)
        elif self.algorithm == "world":
            from diffsinger_tpu.dsp.world import world_harmonic_aperiodic

            # keep zeros (unvoiced markers), pad the frame axis with zeros
            n_frames = int(np.ceil((len(self._waveform) + 1) / self._hop_size))
            f0 = np.zeros(n_frames, np.float32)
            f0[: min(n_frames, len(self._f0))] = self._f0[:n_frames]
            harmonic, aperiodic = world_harmonic_aperiodic(
                self._waveform, f0,
                fs=self._samplerate, fft_size=self._fft_size, hop=self._hop_size,
            )
            self._harmonic_part = harmonic
            self._aperiodic_part = aperiodic
            return
        else:  # comb
            f0 = self._aligned_f0()
            uv_mask = np.repeat(self._f0 > 0, self._hop_size)[: len(self._waveform)]
            uv_mask = np.pad(uv_mask, (0, len(self._waveform) - len(uv_mask)), constant_values=False)
            harm = np.asarray(
                _comb_harmonic_resynth(
                    jnp.asarray(self._waveform), jnp.asarray(f0),
                    hop_size=self._hop_size, win_size=self._win_size,
                    samplerate=self._samplerate, half_width=self._half_width,
                )
            )
            self._harmonic_part = (harm * uv_mask).astype(np.float32)
        self._aperiodic_part = (self._waveform - self._harmonic_part).astype(np.float32)

    def harmonic(self, k: Optional[int] = None) -> np.ndarray:
        if k is not None:
            return self._kth_harmonic(k)
        if self._harmonic_part is None:
            self._decompose()
        return self._harmonic_part

    def aperiodic(self) -> np.ndarray:
        if self._aperiodic_part is None:
            self._decompose()
        return self._aperiodic_part
