"""Fused LYNXNet conv-module Pallas kernel (LN -> pw1 -> SwiGLU -> depthwise
k-tap conv -> PReLU -> pw2) for the sampler hot path.

Why fuse (NOTES.md round-2 perf analysis): the sampler runs at ~58% of its
pure-matmul floor; the gap is the k=31 depthwise conv + elementwise chains
between the two pointwise matmuls (reference modules/backbones/lynxnet.py:
29-163). The depthwise conv cannot use the MXU (no cross-channel
contraction), so as a standalone op it is VPU-bound and XLA's lowering wins
over a standalone Pallas kernel (ops/depthwise_conv.py: measured 2.4x loss).
The only way to beat XLA is to overlap the VPU tap-accumulation with MXU
matmul work inside one kernel and keep every intermediate in VMEM.

Design:

* **Resident weights**: W1 [C, 2I], W2 [I, C], taps/biases/alpha use
  constant-index BlockSpecs, so Pallas fetches them into VMEM once for the
  whole grid (bf16: 8 MB + 4 MB at the flagship C=1024, I=2048).
* **Carry instead of halo recompute**: the grid walks (batch, time-tiles)
  sequentially; a persistent VMEM scratch carries the last (k-1) SwiGLU rows
  of the previous tile, so each row's LN+pw1 is computed exactly once (a
  halo'd design recomputes 23% of pw1 at TT=128). The depthwise conv then
  needs only lookback, at the cost of emitting outputs shifted by k//2+1
  rows — the caller slices the shift off (and runs one flush tile per batch
  row).
* Tile row counts are multiples of 8 (f32 sublane), channels are lane-dense
  multiples of 128.

Numerics: LN and tap accumulation in f32, matmuls in the model compute dtype
(bf16 on TPU) with f32 accumulation — the same islands the XLA path uses.

Status: correctness-tested (parity vs the Flax module) but **NOT WIRED** —
the on-device A/B (tools/perf_lynx_fused.py, v5e chip, 2026-08-17) shows the
fused kernel LOSES once the per-dispatch tunnel overhead is amortized inside
a lax.scan (the real sampler regime):

* single-dispatch: fused 26.7 ms vs XLA 34.4 ms (1.29x "win" — an artifact
  of ~25 ms fixed dispatch overhead dominating both numbers)
* scan-amortized (the honest number): fused 1.67 ms/call vs XLA 1.27 ms/call
  (**0.76x — loses**), tile 128 best of {64, 128, 256}
* diagnosis (k-sweep): the 31-tap VPU loop costs ~0.017 ms/tap (~1.9 TFLOP/s
  — sublane-shifted [tile, I] reads are expensive), and the kernel's
  matmul/LN skeleton alone (k->7 extrapolated ~1.19 ms) already matches
  XLA's ENTIRE fused module, because the (B, nT)=72-step serial grid leaves
  the MXU idle during LN/tap work while XLA overlaps its separate kernels.

Even a perfect tap loop (aligned-shift decomposition j = 8a+b) would floor at
~0.3 ms of VPU FMA work, total ~1.5 ms — still behind XLA. Kept (with parity
tests) as the recorded measurement for the round-2 verdict's perf-stretch
item; the sampler's remaining gap to its matmul floor is VPU-bound depthwise
work that fusion cannot buy back on this hardware generation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, dww_ref, dwb_ref,
            alpha_ref, w2_ref, b2_ref, out_ref, s_carry, *,
            kernel_size: int, t_valid: int, tile: int, cdtype):
    """One (batch, time-tile) grid step; see module docstring for layout."""
    k = kernel_size
    look = k - 1          # carried SwiGLU rows
    t_idx = pl.program_id(1)
    inner = dww_ref.shape[1]

    # ---- LN + pw1 + SwiGLU for this tile's rows (computed exactly once) ----
    x = x_ref[0].astype(jnp.float32)                      # [TT, C]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * lns_ref[0][None, :] + lnb_ref[0][None, :]).astype(cdtype)
    h2 = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b1_ref[0][None, :]
    gate = h2[:, inner:]
    s_new = h2[:, :inner] * (gate * jax.nn.sigmoid(gate))
    # rows at orig positions >= t_valid are the conv's zero padding: the conv
    # pads its INPUT (the SwiGLU output), so the mask applies to s, not x —
    # a masked x would still give s = f(bias) != 0 on pad rows
    row = t_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    s_new = jnp.where(row < t_valid, s_new, 0.0).astype(cdtype)

    # ---- depthwise conv over [carry | s_new], emitting shifted rows ----
    @pl.when(t_idx == 0)
    def _():  # zero lookback at each batch row's start (conv zero padding)
        s_carry[:look] = jnp.zeros((look, inner), cdtype)

    s_carry[look:] = s_new
    s_cat = s_carry[:].astype(jnp.float32)                # [look+TT, I]
    z = jnp.zeros((tile, inner), jnp.float32)
    for j in range(k):  # static unroll: each tap is one VPU FMA over the tile
        z = z + s_cat[j:j + tile] * dww_ref[j][None, :]
    z = z + dwb_ref[0][None, :]
    alpha = alpha_ref[0][None, :]
    z = jnp.where(z >= 0, z, alpha * z)

    # ---- pw2 ----
    y = jnp.dot(z.astype(cdtype), w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = (y + b2_ref[0][None, :]).astype(out_ref.dtype)

    # slide the carry window for the next tile: rows [tile, tile+look) of the
    # scratch are exactly the last `look` SwiGLU rows (valid for tile < look
    # too, where the new carry still overlaps the old one)
    nxt = s_carry[tile:]
    s_carry[:look] = nxt


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "tile", "compute_dtype", "interpret"),
)
def fused_conv_module(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    dw_w: jnp.ndarray, dw_b: jnp.ndarray,
    alpha: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    *,
    kernel_size: int = 31,
    tile: int = 128,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """LYNXConvModule forward: x [B, T, C] -> [B, T, C] (residual NOT added).

    w1: [C, 2*I] (SwiGLU value cols then gate cols), dw_w: [K, I], alpha: [I],
    w2: [I, C]. Matches LYNXConvModule with activation='PReLU'
    (models/backbones/lynxnet.py) with 'SAME' (15, 15) conv padding.
    """
    B, T, C = x.shape
    I = dw_w.shape[1]
    k = kernel_size
    # kernel emits z[i] = y[t*tile + i - (k-1) + k//2] for SAME (15, 15)
    # padding, i.e. outputs lag by k//2 rows
    shift = k // 2
    cdtype = compute_dtype

    # grid covers ceil((T + shift) / tile) tiles so the shifted tail flushes
    nT = -(-(T + shift) // tile)
    x_p = jnp.pad(x, ((0, 0), (0, nT * tile - T), (0, 0))).astype(cdtype)

    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    wdt = lambda a: a.astype(cdtype)

    out = pl.pallas_call(
        functools.partial(_kernel, kernel_size=k, t_valid=T, tile=tile,
                          cdtype=cdtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * I), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * I), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, I), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nT * tile, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((k - 1 + tile, I), cdtype)],
        interpret=interpret,
    )(
        x_p, row2(ln_scale), row2(ln_bias), wdt(w1), row2(b1),
        dw_w.astype(jnp.float32), row2(dw_b), row2(alpha), wdt(w2), row2(b2),
    )
    # out rows are shifted: out[:, r] = y[:, r - shift]
    return out[:, shift:shift + T]


def conv_module_params_from_flax(params: dict) -> dict:
    """Flatten a Flax LYNXConvModule param subtree into fused-kernel args.

    Layout notes: flax Conv kernels are [k, in_per_group, out]; pw convs are
    [1, C, 2I] / [1, I, C]; the depthwise conv is [k, 1, I].
    """
    p = params
    return dict(
        ln_scale=p["norm"]["scale"], ln_bias=p["norm"]["bias"],
        w1=p["pw_conv1"]["kernel"][0], b1=p["pw_conv1"]["bias"],
        dw_w=p["dw_conv"]["kernel"][:, 0, :], dw_b=p["dw_conv"]["bias"],
        alpha=p["act"]["alpha"],
        w2=p["pw_conv2"]["kernel"][0], b2=p["pw_conv2"]["bias"],
    )
