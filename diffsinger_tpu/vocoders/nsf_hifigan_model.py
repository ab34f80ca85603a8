"""NSF-HiFiGAN generator in JAX/Flax (reference modules/nsf_hifigan/models.py).

TPU-first layout decisions:
* everything is channel-last [B, L, C]; the transposed convolutions and the
  resblock stacks lower to MXU matmuls over the channel dim;
* the sine source's phase accumulation (the reference's ``fastsinegen``
  quadratic-phase cumsum and ``SineGen._f02sine``, models.py:133-147, 254-264)
  runs in float32 with the same fmod-rebasing trick — phase error over 512xT
  samples is the known fp16 hazard (SURVEY.md §7.2#5);
* transposed convs use an explicit torch-parity formulation
  (lhs_dilation + flipped kernels) so converted torch checkpoints are bit-true.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsinger_tpu.vocoders.folding import FoldedConv, FoldedConvTranspose1dTorch

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class NsfHifiGanConfig:
    """Subset of the vocoder's config.json the generator needs."""

    num_mels: int = 128
    sampling_rate: int = 44100
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    mini_nsf: bool = False
    noise_sigma: float = 0.0

    @classmethod
    def from_json(cls, d: dict) -> "NsfHifiGanConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        d = {k: (tuple(map(tuple, v)) if k == "resblock_dilation_sizes" else
                 tuple(v) if isinstance(v, list) else v)
             for k, v in d.items() if k in fields}
        return cls(**d)

    @property
    def hop_size(self) -> int:
        return int(np.prod(self.upsample_rates))


def leaky_relu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


class ConvTranspose1dTorch(nn.Module):
    """torch.nn.ConvTranspose1d-parity transposed conv, channel-last.

    output length = (L-1)*stride - 2*padding + kernel. Kernel stored as
    [k, in, out]; apply = dilated conv with flipped kernel
    (equivalent formulation via lhs_dilation).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, in_ch, self.features),
        )
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            jnp.flip(kernel, axis=0).astype(self.dtype or x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + bias


class ResBlock1(nn.Module):
    """3x (dilated conv + plain conv) with leaky relu (models.py:36-67)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,),
                kernel_dilation=(d,), padding=(self.kernel_size - 1) * d // 2,
                dtype=self.dtype, name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt)
            xt = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,),
                padding=(self.kernel_size - 1) // 2,
                dtype=self.dtype, name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2x dilated conv variant (models.py:76-93)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,),
                kernel_dilation=(d,), padding=(self.kernel_size - 1) * d // 2,
                dtype=self.dtype, name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class FoldedResBlock1(nn.Module):
    """ResBlock1 on the folded [B, L/r, r*C] layout (param-tree identical)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    r: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = FoldedConv(
                self.channels, self.kernel_size, r=self.r, kernel_dilation=d,
                dtype=self.dtype, name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt)
            xt = FoldedConv(
                self.channels, self.kernel_size, r=self.r,
                dtype=self.dtype, name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class FoldedResBlock2(nn.Module):
    """ResBlock2 on the folded layout (param-tree identical)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    r: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = FoldedConv(
                self.channels, self.kernel_size, r=self.r, kernel_dilation=d,
                dtype=self.dtype, name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


def sine_source_full(f0: jnp.ndarray, upp: int, sampling_rate: int, harmonic_num: int,
                     rng: jax.Array, sine_amp: float = 0.1, noise_std: float = 0.003,
                     voiced_threshold: float = 0.0, dense: bool = False) -> jnp.ndarray:
    """SineGen._f02sine + forward (models.py:133-164): 9-harmonic sine bank with
    per-frame phase continuation, uv gating and noise. Returns [B, L*upp, dim],
    or the lane-dense [B, F, upp, dim] when ``dense`` (identical values in
    row-major order — a [B, L, dim] tensor pads dim up to 128 TPU lanes, ~14x
    wasted HBM traffic at dim=9). All phase math in float32 with fmod rebasing.
    """
    b, frames = f0.shape
    dim = harmonic_num + 1
    f0 = f0[:, :, None].astype(jnp.float32)  # [B, F, 1]
    n = jnp.arange(1, upp + 1, dtype=jnp.float32)
    rad = f0 / sampling_rate * n  # [B, F, upp]
    rad2 = jnp.mod(rad[..., -1:] + 0.5, 1.0) - 0.5
    rad_acc = jnp.mod(jnp.cumsum(rad2, axis=1), 1.0)
    rad = rad + jnp.pad(rad_acc[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    rng_phase, rng_noise = jax.random.split(rng)
    rand_ini = jax.random.uniform(rng_phase, (1, 1, dim))
    rand_ini = rand_ini.at[..., 0].set(0.0)
    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
    uv = (f0 > voiced_threshold).astype(jnp.float32)  # [B, F, 1]

    if dense:
        rad4 = rad[..., None] * harmonics + rand_ini[:, :, None, :]  # [B, F, upp, dim]
        sines = jnp.sin(2 * np.pi * rad4) * sine_amp
        uv4 = uv[:, :, :, None]  # [B, F, 1, 1] broadcasts over (upp, dim)
        noise_amp = uv4 * noise_std + (1 - uv4) * sine_amp / 3
        # same flat element order as the canonical [B, L, dim] draw
        noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
        return sines * uv4 + noise

    rad = rad.reshape(b, -1, 1)  # [B, L, 1]
    rad = rad * harmonics.reshape(1, 1, -1)
    rad = rad + rand_ini
    sines = jnp.sin(2 * np.pi * rad) * sine_amp
    uv = jnp.repeat(uv, upp, axis=1)  # nearest upsample -> [B, L, 1]
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    return sines * uv + noise


def fast_sine_gen(f0: jnp.ndarray, upp: int, source_sr: float,
                  dense: bool = False) -> jnp.ndarray:
    """mini_nsf single-sine source with quadratic phase interpolation
    (models.py:254-264). f0: [B, F] at frame rate; returns [B, F*upp, 1],
    or the lane-dense [B, F, upp] when ``dense`` (same values, no reshape
    onto the 128-lane-padded per-sample layout)."""
    s0 = f0[:, :, None].astype(jnp.float32) / source_sr  # [B, F, 1]
    ds0 = jnp.pad(s0[:, 1:, :] - s0[:, :-1, :], ((0, 0), (0, 1), (0, 0)))
    n = jnp.arange(1, upp + 1, dtype=jnp.float32)
    rad = s0 * n + 0.5 * ds0 * n * (n - 1) / upp
    rad2 = jnp.mod(rad[..., -1:] + 0.5, 1.0) - 0.5
    rad_acc = jnp.mod(jnp.cumsum(rad2, axis=1), 1.0)
    rad = rad + jnp.pad(rad_acc[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    sines = jnp.sin(2 * np.pi * rad)  # [B, F, upp]
    if dense:
        return sines
    return sines.reshape(f0.shape[0], -1, 1)


class FoldedStridedSourceConv(nn.Module):
    """Full-NSF per-stage source injection from the lane-dense [B, L] source.

    Param-compatible with the canonical ``nn.Conv(features, (2*stride,),
    strides=(stride,), padding=stride//2)`` (or the 1x1 last-stage conv):
    the 1-channel source refolds to [B, L/(r_out*stride), r_out*stride] and
    the conv runs as its exact block-Toeplitz equivalent, emitting the
    stage's folded (or r_out=1 canonical) layout directly.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    r_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, har2d: jnp.ndarray) -> jnp.ndarray:
        from diffsinger_tpu.vocoders.folding import apply_folded_conv

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        r_in = self.r_out * self.stride
        b, total = har2d.shape
        src = har2d.reshape(b, total // r_in, r_in)
        return apply_folded_conv(
            src.astype(self.dtype or src.dtype),
            kernel.astype(self.dtype or kernel.dtype), bias,
            pad_left=self.padding, r_in=r_in, r_out=self.r_out,
            stride=self.stride, out_blocks=total // r_in,
        )


class DenseHarmonicMerge(nn.Module):
    """Param-compatible with ``nn.Dense(1)`` (m_source_linear) applied on the
    lane-dense [B, F, upp, dim] sine bank; contracts the harmonic dim with an
    einsum so no [.., 1]-channel tensor (which would pad to 128 lanes) is
    ever materialized. Returns [B, F, upp]."""

    @nn.compact
    def __call__(self, sines: jnp.ndarray) -> jnp.ndarray:
        dim = sines.shape[-1]
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init, (dim, 1)
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return jnp.einsum("bfuh,ho->bfu", sines, kernel.astype(sines.dtype)) + bias[0]


class DenseSourceInject(nn.Module):
    """mini_nsf source injection from the lane-dense [B, F, upp] sine source.

    Param-compatible with ``nn.Conv(features, kernel_size=(1,))`` (the
    canonical per-sample 1x1 conv): an outer product over the dense layout
    followed by a reshape — identical values, none of the 128-lane padding
    a [B, L, 1] per-sample tensor would carry.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, sines: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel[0, 0].astype(self.dtype or sines.dtype)
        y = sines.astype(w.dtype)[..., None] * w + bias.astype(w.dtype)
        return y.reshape(sines.shape[0], -1, self.features)


class Generator(nn.Module):
    """NSF-HiFiGAN generator (models.py:206-293), channel-last.

    __call__: mel [B, T, M] (log-e), f0 [B, T] -> wav [B, T*hop].
    """

    config: NsfHifiGanConfig
    dtype: Optional[jnp.dtype] = None
    # Fold the low-channel tail into a lane-dense [B, L/r, r*C] layout with
    # r*C <= fold_lanes (see folding.py) — numerically equivalent, ~2x faster
    # vocoder on TPU. 0 disables (canonical per-sample graph, e.g. for ONNX).
    fold_lanes: int = 128

    @nn.compact
    def __call__(self, mel: jnp.ndarray, f0: jnp.ndarray, rng: Optional[jax.Array] = None):
        h = self.config
        num_upsamples = len(h.upsample_rates)
        num_kernels = len(h.resblock_kernel_sizes)

        har2d = None
        if h.mini_nsf:
            source_sr = h.sampling_rate / int(np.prod(h.upsample_rates[2:]))
            upp = int(np.prod(h.upsample_rates[:2]))
            har_dense = fast_sine_gen(f0, upp, source_sr, dense=True)  # [B, T, upp]
        else:
            upp = int(np.prod(h.upsample_rates))
            if rng is None:
                rng = jax.random.PRNGKey(0)
            if self.fold_lanes:
                # lane-dense source: sine bank stays [B, F, upp, dim] and the
                # harmonic merge contracts to a dense [B, L] signal — the
                # canonical [B, L, 9]/[B, L, 1] tensors pad 9->128 lanes
                sine_dense = sine_source_full(
                    f0, upp, h.sampling_rate, harmonic_num=8, rng=rng, dense=True
                )
                merged = DenseHarmonicMerge(name="m_source_linear")(sine_dense)
                har2d = jnp.tanh(merged).reshape(merged.shape[0], -1)  # [B, L]
            else:
                sine_wavs = sine_source_full(f0, upp, h.sampling_rate, harmonic_num=8, rng=rng)
                merged = nn.Dense(1, name="m_source_linear")(sine_wavs)
                har_source = jnp.tanh(merged)  # [B, T*hop, 1]

        x = nn.Conv(
            h.upsample_initial_channel, kernel_size=(7,), padding=3,
            dtype=self.dtype, name="conv_pre",
        )(mel)
        if h.noise_sigma and rng is not None:
            rng, sub = jax.random.split(rng)
            x = x + h.noise_sigma * jax.random.normal(sub, x.shape, x.dtype)

        ch = h.upsample_initial_channel
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2
        folded_resblock_cls = FoldedResBlock1 if h.resblock == "1" else FoldedResBlock2
        r = 1  # current space-to-depth fold factor of x ([B, L/r, r*C])
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch //= 2
            x = leaky_relu(x)
            # a folded transposed conv structurally requires r_out = r*u; take
            # it whenever that keeps the folded width within fold_lanes,
            # otherwise unfold back to the canonical layout first
            if self.fold_lanes and r * u * ch <= self.fold_lanes and r * u > 1:
                x = FoldedConvTranspose1dTorch(
                    features=ch, kernel_size=k, stride=u, padding=(k - u) // 2,
                    r_in=r, dtype=self.dtype, name=f"ups_{i}",
                )(x)
                r *= u
            else:
                if r > 1:
                    x = x.reshape(x.shape[0], -1, x.shape[-1] // r)
                    r = 1
                x = ConvTranspose1dTorch(
                    features=ch, kernel_size=k, stride=u, padding=(k - u) // 2,
                    dtype=self.dtype, name=f"ups_{i}",
                )(x)
            n_frames = x.shape[1] * r
            if not h.mini_nsf:
                if i + 1 < num_upsamples:
                    stride_f0 = int(np.prod(h.upsample_rates[i + 1:]))
                    kf, pf = stride_f0 * 2, stride_f0 // 2
                else:
                    stride_f0, kf, pf = 1, 1, 0
                if har2d is not None:
                    # folded strided conv straight from the dense source into
                    # this stage's layout (param-compatible, exact values)
                    x_source = FoldedStridedSourceConv(
                        ch, kf, stride_f0, pf, r_out=r, dtype=self.dtype,
                        name=f"noise_convs_{i}",
                    )(har2d)
                    x = x + x_source[:, : x.shape[1]]
                else:
                    x_source = nn.Conv(
                        ch, kernel_size=(kf,), strides=(stride_f0,),
                        padding=pf, dtype=self.dtype, name=f"noise_convs_{i}",
                    )(har_source)
                    x_source = x_source[:, :n_frames]
                    if r > 1:  # fold = plain reshape (time-major channel blocks)
                        x_source = x_source.reshape(x_source.shape[0], -1, r * ch)
                    x = x + x_source
            elif i == 1:
                x_source = DenseSourceInject(ch, dtype=self.dtype, name="source_conv")(
                    har_dense
                )
                x_source = x_source[:, :n_frames]
                if r > 1:
                    x_source = x_source.reshape(x_source.shape[0], -1, r * ch)
                x = x + x_source
            xs = None
            for j, (rk, rd) in enumerate(
                zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
            ):
                if r > 1:
                    block = folded_resblock_cls(
                        channels=ch, kernel_size=rk, dilation=tuple(rd), r=r,
                        dtype=self.dtype, name=f"resblocks_{i * num_kernels + j}",
                    )(x)
                else:
                    block = resblock_cls(
                        channels=ch, kernel_size=rk, dilation=tuple(rd),
                        dtype=self.dtype, name=f"resblocks_{i * num_kernels + j}",
                    )(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels
        x = leaky_relu(x, 0.01)  # final leaky relu uses torch default slope
        if r > 1:
            x = FoldedConv(1, 7, r=r, dtype=self.dtype, name="conv_post")(x)
            return jnp.tanh(x).reshape(x.shape[0], -1)
        x = nn.Conv(1, kernel_size=(7,), padding=3, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[:, :, 0]
