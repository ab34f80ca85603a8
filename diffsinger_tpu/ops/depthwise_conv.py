"""Pallas TPU kernel: fused depthwise 1-D convolution + PReLU.

This is LYNXNet's hot non-matmul op (modules/backbones/lynxnet.py:57-58:
depthwise k=31 conv over [B, T, 2048] followed by per-channel PReLU, executed
50x per sampled segment inside the sampler scan).

**Status: measured, not wired in.** On v5e at LYNXNet shapes (B=8, T=1024,
C=2048, k=31) the XLA depthwise conv runs 0.86 ms/op vs 2.04 ms for this
kernel — XLA's fused conv wins (single-buffered DMA here stalls compute; the
guide's "don't hand-schedule what the compiler already does" in action). Kept
as a validated Pallas baseline; double-buffered DMA is the known next step if
profiles ever show the XLA op regressing.

The kernel:

* tiles the (padded) time axis; each grid step DMAs one [T_blk + k - 1, C_blk]
  input window HBM -> VMEM (halo included, so no inter-block communication);
* accumulates the k taps as shifted [T_blk, C_blk] fused multiply-adds on the
  VPU (channels on the 128-wide lane axis);
* applies PReLU in-register before writing the output tile.

Numerically identical to the XLA path (same-order f32 accumulation per tap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, alpha_ref, o_ref, x_vmem, sem, *, k: int, t_blk: int, win: int):
    i = pl.program_id(0)  # batch
    j = pl.program_id(1)  # time block
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * t_blk, win), :],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros_like(o_ref)
    for tap in range(k):
        acc = acc + x_vmem[pl.ds(tap, t_blk), :] * w_ref[tap, :]
    alpha = alpha_ref[0, :]
    o_ref[...] = jnp.where(acc >= 0, acc, alpha * acc)


@functools.partial(jax.jit, static_argnames=("kernel_size", "t_blk", "interpret"))
def depthwise_conv1d_prelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    alpha: jnp.ndarray,
    *,
    kernel_size: int = 31,
    t_blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """'same'-padded depthwise conv + PReLU.

    :param x: [B, T, C] (T divisible by t_blk for the tiled path)
    :param w: [k, C] depthwise taps
    :param alpha: [C] PReLU slopes
    :return: [B, T, C]
    """
    b, t, c = x.shape
    k = kernel_size
    pad_l = k // 2
    pad_r = k - 1 - pad_l
    # DMA window rows must be sublane-aligned (multiples of 8): round the halo
    # window up and over-pad the input accordingly
    win = t_blk + ((k - 1 + 7) // 8) * 8
    extra = win - (t_blk + k - 1)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r + extra), (0, 0)))

    assert t % t_blk == 0, f"T={t} must be a multiple of t_blk={t_blk}"
    grid = (b, t // t_blk)

    return pl.pallas_call(
        functools.partial(_kernel, k=k, t_blk=t_blk, win=win),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full padded x stays in HBM
            pl.BlockSpec((k, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, alpha[None, :])


def depthwise_conv1d_prelu_xla(x, w, alpha, *, kernel_size: int = 31):
    """Reference XLA path (identical math) for testing / non-TPU backends."""
    k = kernel_size
    pad_l = k // 2
    pad_r = k - 1 - pad_l
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w[:, None, :], window_strides=(1,), padding=[(pad_l, pad_r)],
        feature_group_count=c, dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return jnp.where(y >= 0, y, alpha * y)
