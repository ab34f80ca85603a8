"""Griffin–Lim mel inversion: a checkpoint-free evaluation vocoder.

The reference always vocodes through a pretrained NSF-HiFiGAN
(reference basics/base_svs_infer.py + configs/acoustic.yaml `vocoder_ckpt`);
when no vocoder checkpoint is available (e.g. the in-env overfit
demonstration, docs/perf/overfit.json), this module renders an audible,
deterministic waveform straight from a log-mel spectrogram:

    log-mel --(regularized filterbank pseudo-inverse)--> linear magnitude
            --(Griffin–Lim phase recovery, jitted lax.fori_loop)--> waveform

Quality is evaluation-grade (phase-light, slightly metallic), but pitch,
timing and timbre structure are faithful — enough to hear whether a trained
acoustic model produces the right song. Everything runs as ONE jitted
program (rFFT/irFFT pairs over [B, frames, bins] — MXU/VPU-friendly static
shapes, no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.mel import hann_window_periodic, mel_filterbank
from diffsinger_tpu.dsp.stft import istft, stft_complex


def mel_pseudo_inverse(mel_basis: np.ndarray, reg: float = 1e-8) -> np.ndarray:
    """Non-negative-clipped Tikhonov pseudo-inverse of a mel filterbank.

    mel_basis: [n_mels, n_bins] -> returns [n_bins, n_mels] such that
    ``pinv @ mel_power`` approximates the linear magnitude spectrum.
    """
    m = mel_basis.astype(np.float64)
    gram = m @ m.T + reg * np.eye(m.shape[0])
    pinv = m.T @ np.linalg.inv(gram)
    return np.maximum(pinv, 0.0).astype(np.float32)


@jax.jit
def _mel_to_linear(mel_amp: jnp.ndarray, pinv: jnp.ndarray,
                   basis: jnp.ndarray) -> jnp.ndarray:
    """Mel-domain amplitudes [B, T, M] -> linear magnitude [B, T, bins].

    Clipped pseudo-inverse seed refined by 30 multiplicative NNLS updates
    (x <- x * B^T m / B^T B x — the librosa ``mel_to_stft`` fit, expressed as
    three batched matmuls per step; monotone in KL divergence, stays >= 0).
    """
    x = jnp.einsum("btm,fm->btf", mel_amp, pinv)
    num = jnp.einsum("btm,mf->btf", mel_amp, basis)

    def body(_, x):
        mel_fit = jnp.einsum("btf,mf->btm", x, basis)
        denom = jnp.einsum("btm,mf->btf", mel_fit, basis)
        return x * num / jnp.maximum(denom, 1e-10)

    return jax.lax.fori_loop(0, 30, body, jnp.maximum(x, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_size", "n_iter", "length"))
def _griffin_lim(mag: jnp.ndarray, window: jnp.ndarray, *, n_fft: int, hop: int,
                 win_size: int, n_iter: int, length: int) -> jnp.ndarray:
    """Phase recovery for magnitude frames [B, F, bins] -> waveform [B, length]."""

    def project(spec):
        y = istft(spec, n_fft=n_fft, hop=hop, win_size=win_size, window=window,
                  center=True, length=length)
        return stft_complex(y, n_fft=n_fft, hop=hop, win_size=win_size,
                            window=window, center=True)[:, : mag.shape[1]], y

    def body(_, spec):
        new_spec, _ = project(spec)
        phase = new_spec / jnp.maximum(jnp.abs(new_spec), 1e-8)
        return mag.astype(jnp.complex64) * phase

    spec0 = mag.astype(jnp.complex64)  # zero phase start (deterministic)
    spec = jax.lax.fori_loop(0, n_iter, body, spec0)
    _, y = project(spec)
    peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    return y / jnp.maximum(peak / 0.95, 1.0)


class GriffinLimVocoder:
    """Evaluation-grade log-mel -> waveform (no checkpoint required).

    Mirrors the repo's mel conventions (`dsp/mel.py` MelSpectrogram: log-e,
    clip 1e-5, Slaney filterbank) so ``spec2wav(get_mel(y))`` round-trips.
    """

    def __init__(self, sr: int = 44100, n_mels: int = 128, n_fft: int = 2048,
                 win_size: int = 2048, hop_size: int = 512, fmin: float = 40.0,
                 fmax: float = 16000.0, n_iter: int = 32):
        self.sr, self.hop_size = sr, hop_size
        self.n_fft, self.win_size, self.n_iter = n_fft, win_size, n_iter
        self.basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        self.pinv = mel_pseudo_inverse(self.basis)
        self.window = jnp.asarray(hann_window_periodic(win_size))

    @classmethod
    def from_hparams(cls, hp: dict, n_iter: int = 32) -> "GriffinLimVocoder":
        return cls(sr=hp["audio_sample_rate"], n_mels=hp["audio_num_mel_bins"],
                   n_fft=hp.get("fft_size", 2048), win_size=hp.get("win_size", 2048),
                   hop_size=hp.get("hop_size", 512), fmin=hp.get("fmin", 40),
                   fmax=hp.get("fmax", 16000), n_iter=n_iter)

    def spec2wav(self, logmel, f0=None) -> np.ndarray:
        """[T, n_mels] (or [B, T, n_mels]) log-e mel -> float32 waveform.

        ``f0`` is accepted for vocoder-registry signature compatibility and
        ignored (Griffin–Lim needs no source signal).
        """
        mel = jnp.asarray(logmel, jnp.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        mag = _mel_to_linear(jnp.exp(mel), jnp.asarray(self.pinv),
                             jnp.asarray(self.basis))
        length = mel.shape[1] * self.hop_size
        y = _griffin_lim(mag, self.window, n_fft=self.n_fft, hop=self.hop_size,
                         win_size=self.win_size, n_iter=self.n_iter, length=length)
        y = np.asarray(y, np.float32)
        return y[0] if squeeze else y
