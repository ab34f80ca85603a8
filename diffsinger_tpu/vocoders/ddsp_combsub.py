"""pc-ddsp CombSub vocoder, TPU-native (reference modules/vocoders/ddsp.py
loads these as opaque TorchScript `.jit` bundles; I/O contract at
ddsp.py:38-120: mel [B, T, M] (log10) + f0 [B, T, 1] -> (signal, _, (s_h, s_n))).

The synthesis graph is reconstructed from the pc-ddsp family's public design
(combtooth excitation + LTV frequency-sampling filters + filtered noise):

* ``Mel2Control``: Conv1d stack -> GroupNorm -> LeakyReLU -> Conv1d ->
  BiLSTM(128) -> LayerNorm -> weight-normed Dense, split into
  {harmonic_magnitude, harmonic_phase, noise_magnitude} control frames;
* combtooth source: ``sinc(sr * wrap(cumsum(f0/sr)) / f0)`` on the upsampled
  (align-corners linear) f0 — fp32 phase accumulation (SURVEY §7.2#5);
* harmonic branch: STFT of the combtooth multiplied by the complex source
  filter ``exp(mag + i*pi*phase)`` per frame; noise branch: white noise STFT
  times ``exp(noise_mag)/128``; iSTFT of the sum.

Weights come from :mod:`diffsinger_tpu.vocoders.ddsp_convert`, which extracts
them from a real TorchScript bundle by name (weight-norm folded at convert
time). The converter fails loudly on unknown layouts rather than guessing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsinger_tpu.dsp.stft import istft, stft_complex
from diffsinger_tpu.models.hnsep import BiLSTM


def upsample_align_corners(frames: jnp.ndarray, factor: int) -> jnp.ndarray:
    """pc-ddsp's frame->sample upsampling: append the last frame, linearly
    interpolate to ``T*factor + 1`` samples with align_corners=True, drop the
    final sample. frames: [B, T] -> [B, T*factor]."""
    b, t = frames.shape
    ext = jnp.concatenate([frames, frames[:, -1:]], axis=1)  # [B, T+1]
    out_len = t * factor + 1
    # align_corners=True: output i samples input coordinate i*(T)/(T*factor)
    pos = jnp.arange(out_len, dtype=jnp.float32) * (t / (t * factor))
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    w = pos - i0.astype(jnp.float32)
    out = ext[:, i0] * (1.0 - w)[None, :] + ext[:, i0 + 1] * w[None, :]
    return out[:, :-1]


def combtooth(f0_up: jnp.ndarray, sr: int) -> jnp.ndarray:
    """Combtooth excitation from per-sample f0 [B, L]: a sinc pulse train with
    period sr/f0. Phase is an fp32 cumulative sum wrapped to [-0.5, 0.5) —
    adequate for song-length audio (drift ~1e-3 cycles at 10^6 samples)."""
    phase = jnp.cumsum(f0_up.astype(jnp.float32) / sr, axis=1)
    phase = phase - jnp.round(phase)
    return jnp.sinc(sr * phase / (f0_up + 1e-3))


class Mel2Control(nn.Module):
    """mel [B, T, M] -> dict of control frames (pc-ddsp Mel2Control layout)."""

    n_mag_harmonic: int
    n_mag_noise: int
    hidden: int = 64
    lstm_hidden: int = 128

    @nn.compact
    def __call__(self, mel):
        x = nn.Conv(self.hidden, kernel_size=(3,), padding=1, name="stack_conv0")(mel)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="stack_gn")(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Conv(self.hidden, kernel_size=(3,), padding=1, name="stack_conv1")(x)
        x = BiLSTM(self.lstm_hidden, name="decoder")(jnp.transpose(x, (1, 0, 2)))
        x = jnp.transpose(x, (1, 0, 2))  # back to [B, T, 2*lstm_hidden]
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        e = nn.Dense(
            2 * self.n_mag_harmonic + self.n_mag_noise, name="dense_out"
        )(x)
        return {
            "harmonic_magnitude": e[..., : self.n_mag_harmonic],
            "harmonic_phase": e[..., self.n_mag_harmonic : 2 * self.n_mag_harmonic],
            "noise_magnitude": e[..., 2 * self.n_mag_harmonic :],
        }


class CombSub(nn.Module):
    """pc-ddsp CombSub synthesis. mel [B, T, M] (log10), f0 [B, T] -> wav."""

    sampling_rate: int
    block_size: int
    win_length: int
    n_mag_harmonic: int
    n_mag_noise: int

    def _to_bins(self, mags: jnp.ndarray) -> jnp.ndarray:
        """Frequency-sampling filters: interpolate control magnitudes to the
        STFT bin resolution when the bundle predicts fewer bands."""
        n_bins = self.win_length // 2 + 1
        if mags.shape[-1] == n_bins:
            return mags
        b, t, n = mags.shape
        return jax.image.resize(mags, (b, t, n_bins), method="linear")

    @nn.compact
    def __call__(self, mel, f0, noise: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        b, t, _ = mel.shape
        hop = self.block_size
        f0_up = upsample_align_corners(f0, hop)  # [B, T*hop]
        src = combtooth(f0_up, self.sampling_rate)

        ctrls = Mel2Control(
            self.n_mag_harmonic, self.n_mag_noise, name="mel2ctrl"
        )(mel)
        # STFT with center=True yields T+1 frames for T*hop samples: repeat the
        # last control frame (pc-ddsp convention)
        def pad_frames(x):
            return jnp.concatenate([x, x[:, -1:, :]], axis=1)

        src_filter = jnp.exp(
            self._to_bins(pad_frames(ctrls["harmonic_magnitude"]))
            + 1j * np.pi * self._to_bins(pad_frames(ctrls["harmonic_phase"]))
        )
        noise_filter = jnp.exp(self._to_bins(pad_frames(ctrls["noise_magnitude"]))) / 128.0

        window = jnp.asarray(np.hanning(self.win_length + 1)[:-1].astype(np.float32))
        src_stft = stft_complex(
            src, n_fft=self.win_length, hop=hop, win_size=self.win_length,
            window=window, center=True,
        )  # [B, T+1, bins]
        if noise is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            noise = jax.random.uniform(
                rng, src.shape, minval=-1.0, maxval=1.0, dtype=jnp.float32
            )
        noise_stft = stft_complex(
            noise, n_fft=self.win_length, hop=hop, win_size=self.win_length,
            window=window, center=True,
        )
        n_frames = src_stft.shape[1]
        sig_stft = (
            src_stft * src_filter[:, :n_frames]
            + noise_stft * noise_filter[:, :n_frames]
        )
        signal = istft(
            sig_stft, n_fft=self.win_length, hop=hop, win_size=self.win_length,
            window=window, center=True, length=t * hop,
        )
        return signal
