"""Native JAX DDSP vocoder (pc-ddsp-family synthesis; reference DDSP wrapper I/O
contract: mel [B, T, M] + f0 [B, T] -> waveform, modules/vocoders/ddsp.py).

The reference runs an opaque TorchScript bundle; this module instead provides a
fully TPU-native, *trainable* DDSP vocoder in the same family (CombSub-style):

* control network: mel -> per-frame harmonic amplitude envelope (n_harmonics)
  + noise filter band magnitudes;
* harmonic source: additive sine bank with fp32 cumulative phase (same
  fmod-rebasing discipline as NSF, SURVEY.md §7.2#5), anti-aliased by zeroing
  harmonics above Nyquist;
* noise branch: white noise shaped by a per-frame LTV filter applied in the
  STFT domain;

plus a multi-resolution STFT loss for training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsinger_tpu.dsp.stft import istft, stft_complex
from diffsinger_tpu.vocoders.registry import register_vocoder


class ControlNet(nn.Module):
    """mel [B, T, M] -> (harmonic amps [B, T, K], noise mags [B, T, N])."""

    n_harmonics: int = 64
    n_noise_bands: int = 65
    hidden: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mel):
        x = nn.Dense(self.hidden)(mel)
        for i in range(self.num_layers):
            y = nn.Conv(self.hidden, kernel_size=(3,), padding=1, name=f"conv_{i}")(x)
            y = nn.LayerNorm()(y)
            x = x + jax.nn.gelu(y)
        amp = nn.Dense(self.n_harmonics + 1, name="amp_out")(x)
        noise = nn.Dense(self.n_noise_bands, name="noise_out")(x)
        # exp-sigmoid scaling (DDSP convention): smooth positive outputs
        scale = lambda z: 2.0 * jax.nn.sigmoid(z) ** jnp.log(10.0) + 1e-7
        master, harmonics = amp[..., :1], amp[..., 1:]
        harmonics = jax.nn.softmax(harmonics, axis=-1)
        return scale(master) * harmonics, scale(noise)


def harmonic_synth(f0: jnp.ndarray, amps: jnp.ndarray, hop: int, sr: int) -> jnp.ndarray:
    """Additive sine bank. f0 [B, T], amps [B, T, K] -> wav [B, T*hop].

    Phase accumulation in fp32 with per-frame fmod rebasing; harmonics above
    Nyquist are muted (anti-aliasing).
    """
    b, t, k = amps.shape
    # per-sample f0 by linear interpolation of frame f0
    up = jnp.repeat(f0, hop, axis=1)  # [B, T*hop] (step interp is adequate at hop≈11ms)
    phase_inc = up.astype(jnp.float32) / sr  # cycles per sample
    # cumulative phase with rebasing (sum in fp32, fmod to avoid blowup)
    phase = jnp.cumsum(phase_inc, axis=1)
    phase = jnp.mod(phase, 1.0)
    harm_idx = jnp.arange(1, k + 1, dtype=jnp.float32)
    phases = phase[:, :, None] * harm_idx  # [B, L, K]
    sines = jnp.sin(2 * np.pi * phases)
    amps_up = jnp.repeat(amps, hop, axis=1)  # [B, L, K]
    nyquist_mask = (up[:, :, None] * harm_idx) < (sr / 2)
    return jnp.sum(sines * amps_up * nyquist_mask, axis=-1)


def filtered_noise(noise_mags: jnp.ndarray, hop: int, rng: jax.Array) -> jnp.ndarray:
    """White noise shaped by a per-frame LTV filter in the STFT domain.

    noise_mags [B, T, N]: N band magnitudes per mel frame, linearly interpolated
    to the n_fft//2+1 bins of a 2*hop-long analysis window (pc-ddsp convention:
    filter frame rate == mel frame rate)."""
    b, t, n = noise_mags.shape
    n_fft = 2 * hop
    n_bins = n_fft // 2 + 1
    length = t * hop
    noise = jax.random.uniform(rng, (b, length), minval=-1.0, maxval=1.0)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = stft_complex(noise, n_fft=n_fft, hop=hop, win_size=n_fft, window=window, center=True)
    f = spec.shape[1]
    mags = noise_mags
    if f > t:
        mags = jnp.pad(mags, ((0, 0), (0, f - t), (0, 0)), mode="edge")
    mags = mags[:, :f]
    # interpolate band magnitudes to bin resolution
    mags = jax.image.resize(mags, (b, f, n_bins), method="linear")
    return istft(spec * mags, n_fft=n_fft, hop=hop, win_size=n_fft, window=window,
                 center=True, length=length)


class DDSPGenerator(nn.Module):
    """mel [B, T, M] + f0 [B, T] -> wav [B, T*hop]."""

    hop_size: int = 512
    sampling_rate: int = 44100
    n_harmonics: int = 64
    n_noise_bands: int = 65

    @nn.compact
    def __call__(self, mel, f0, rng: Optional[jax.Array] = None):
        amps, noise_mags = ControlNet(
            self.n_harmonics, self.n_noise_bands, name="control"
        )(mel)
        harm = harmonic_synth(f0, amps, self.hop_size, self.sampling_rate)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        noise = filtered_noise(noise_mags, self.hop_size, rng)
        return harm + noise


def multi_resolution_stft_loss(
    pred: jnp.ndarray, target: jnp.ndarray,
    fft_sizes: Sequence[int] = (512, 1024, 2048),
) -> jnp.ndarray:
    """Spectral-convergence + log-magnitude loss for DDSP training."""
    total = 0.0
    for n_fft in fft_sizes:
        hop = n_fft // 4
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        sp = jnp.abs(stft_complex(pred, n_fft=n_fft, hop=hop, win_size=n_fft,
                                  window=window, center=True))
        st = jnp.abs(stft_complex(target, n_fft=n_fft, hop=hop, win_size=n_fft,
                                  window=window, center=True))
        sc = jnp.linalg.norm(st - sp) / jnp.maximum(jnp.linalg.norm(st), 1e-7)
        mag = jnp.mean(jnp.abs(jnp.log(st + 1e-7) - jnp.log(sp + 1e-7)))
        total = total + sc + mag
    return total / len(fft_sizes)


@register_vocoder
class DDSPNative:
    """Registry entry 'ddspnative': the trainable TPU-native DDSP vocoder.

    Loads params from a .dsckpt produced by native training; random-init with a
    warning otherwise (like the NSF wrapper).
    """

    def __init__(self, hparams: dict):
        import pathlib
        import warnings

        self.hparams = hparams
        self.model = DDSPGenerator(
            hop_size=hparams["hop_size"], sampling_rate=hparams["audio_sample_rate"]
        )
        ckpt = pathlib.Path(hparams.get("vocoder_ckpt", "nonexistent"))
        if ckpt.exists() and ckpt.suffix == ".dsckpt":
            from diffsinger_tpu.utils.ckpt import load_checkpoint, restore_params

            template = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, hparams["audio_num_mel_bins"])), jnp.zeros((1, 8)),
            )
            blob = load_checkpoint(ckpt)
            self.params = restore_params(template, blob["params"])
        else:
            warnings.warn(f"DDSPNative: no checkpoint at '{ckpt}'; using RANDOM weights.")
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, hparams["audio_num_mel_bins"])), jnp.zeros((1, 8)),
            )
        self._jitted = jax.jit(
            lambda p, mel, f0: self.model.apply(p, mel, f0, rng=jax.random.PRNGKey(0))
        )

    def spec2wav_jax(self, mel, f0):
        mel_base = self.hparams.get("mel_base", 10)
        if mel_base != "e":
            mel = 2.30259 * mel
        return self._jitted(self.params, mel, f0)

    def spec2wav(self, mel, *, f0, **kwargs):
        wav = self.spec2wav_jax(jnp.asarray(mel)[None], jnp.asarray(f0)[None])
        return np.asarray(wav[0])
