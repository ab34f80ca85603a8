"""Space-to-depth ("folded") 1-D convolutions for lane-dense TPU layouts.

The NSF-HiFiGAN tail runs at 16-64 channels over 10^5-10^6 samples
(reference modules/nsf_hifigan/models.py:206-293). On TPU the minor-most
(channel) axis is tiled to 128 vector lanes, so a [B, L, 16] activation wastes
8x HBM bandwidth on lane padding — and the tail is bandwidth-bound. Folding
r consecutive time steps into the channel axis, ``x_f = x.reshape(B, L/r,
r*C)``, keeps every tail tensor at exactly 128 dense lanes.

Any strided/dilated/transposed 1-D conv has an *exact* equivalent on the
folded layout: a conv whose kernel is a block-Toeplitz rearrangement of the
original taps. ``build_fold_plan`` enumerates, for every output sub-position
j in [0, r_out) and tap t, which input block offset / sub-position (N, s) the
tap reads, producing a 0/1 tensor F[t, Q, s, j]; the folded kernel is then

    W_f[Q, s*C_in + i, j*C_out + o] = sum_t F[t, Q, s, j] * W[t, i, o]

computed by a tiny einsum at apply time (params stay in their canonical
torch-parity shapes, so converted checkpoints are untouched). The arithmetic
is identical up to reassociation of the contraction order.

Folded-layout convention (matches a plain reshape): folded channel index
= s * C + c  (time-offset major, original channel minor).

Block-structure requirements, asserted in ``build_fold_plan``:
* r_out % lhs_dilation == 0 (output sub-position -> dilated-grid phase is
  independent of the block index), and
* r_out == r_in * lhs_dilation (each output block reads a fixed window of
  input blocks).
The NSF-HiFiGAN tail satisfies both by construction: every tail stage
upsamples x2 while halving channels, so r doubles exactly when C halves.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@functools.lru_cache(maxsize=None)
def build_fold_plan(
    k: int,
    rhs_dilation: int,
    pad_left: int,
    lhs_dilation: int,
    r_in: int,
    r_out: int,
    stride: int = 1,
) -> Tuple[np.ndarray, int]:
    """Enumerate tap geometry for the folded equivalent of a 1-D conv.

    The underlying (unfolded) op is ``lax.conv_general_dilated``: output
    position p = M * r_out + j reads dilated-input position
    q = p * stride + t * rhs_dilation - pad_left for tap t; q maps to the
    real input m = q / lhs_dilation when divisible (else the tap hits an
    inserted zero). In folded coordinates m = N * r_in + s.

    Block-structure requirement: r_out * stride == r_in * lhs_dilation
    (each output block advances exactly one input block). Covers plain
    (stride=ld=1, r_in==r_out), transposed (ld=u, r_out=r_in*u), and strided
    downsampling convs (stride=s, r_in=r_out*s) like the NSF source
    injections.

    Returns (F, block_pad_left) where F is float32 [k, k_blocks, r_in, r_out]
    with F[t, Q, s, j] = 1 iff output sub-position j's tap t reads input
    block M + Q - block_pad_left at sub-position s.
    """
    assert (r_out * stride) % lhs_dilation == 0, (r_out, stride, lhs_dilation)
    assert r_out * stride == r_in * lhs_dilation, (r_out, stride, r_in, lhs_dilation)
    entries = []
    for j in range(r_out):
        for t in range(k):
            q = j * stride + t * rhs_dilation - pad_left
            if q % lhs_dilation != 0:
                continue  # inserted zero of the lhs-dilated input
            m = q // lhs_dilation  # python floor division: negatives pad
            entries.append((t, m // r_in, m % r_in, j))
    n_min = min(e[1] for e in entries)
    n_max = max(e[1] for e in entries)
    k_blocks = n_max - n_min + 1
    F = np.zeros((k, k_blocks, r_in, r_out), np.float32)
    for t, n, s, j in entries:
        F[t, n - n_min, s, j] = 1.0
    return F, -n_min


def fold_kernel(
    kernel: jnp.ndarray,
    *,
    rhs_dilation: int = 1,
    pad_left: int,
    lhs_dilation: int = 1,
    r_in: int,
    r_out: int,
    stride: int = 1,
) -> Tuple[jnp.ndarray, int]:
    """Fold a [k, C_in, C_out] kernel into its [k_blocks, r_in*C_in,
    r_out*C_out] block-Toeplitz equivalent. Returns (folded, block_pad_left).
    """
    k, c_in, c_out = kernel.shape
    F, block_pad_left = build_fold_plan(
        k, rhs_dilation, pad_left, lhs_dilation, r_in, r_out, stride
    )
    w = jnp.einsum("tqsj,tio->qsijo", jnp.asarray(F, kernel.dtype), kernel)
    return w.reshape(w.shape[0], r_in * c_in, r_out * c_out), block_pad_left


def apply_folded_conv(
    x_f: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    rhs_dilation: int = 1,
    pad_left: int,
    lhs_dilation: int = 1,
    r_in: int,
    r_out: int,
    stride: int = 1,
    out_blocks: int,
) -> jnp.ndarray:
    """Run the folded equivalent of a 1-D conv on x_f [B, L/r_in, r_in*C_in].

    ``pad_left`` is the unfolded op's left padding (right padding is implied
    by ``out_blocks``, the expected folded output length).
    """
    w_f, block_pad_left = fold_kernel(
        kernel, rhs_dilation=rhs_dilation, pad_left=pad_left,
        lhs_dilation=lhs_dilation, r_in=r_in, r_out=r_out, stride=stride,
    )
    k_blocks = w_f.shape[0]
    block_pad_right = out_blocks - x_f.shape[1] + k_blocks - 1 - block_pad_left
    assert block_pad_right >= 0, (out_blocks, x_f.shape, k_blocks, block_pad_left)
    y = jax.lax.conv_general_dilated(
        x_f, w_f.astype(x_f.dtype),
        window_strides=(1,),
        padding=[(block_pad_left, block_pad_right)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        # broadcast+reshape rather than jnp.tile (same result; the tile
        # primitive has no ONNX lowering in deployment/onnx)
        y = y + jnp.broadcast_to(bias, (r_out, bias.shape[0])).reshape(-1)
    return y


class FoldedConv(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(features, (k,), dilation,
    padding=same)`` applied on the folded layout (r_in == r_out == r).

    Declares the identical param tree ("kernel" [k, C_in, features], "bias")
    so canonical checkpoints load unchanged.
    """

    features: int
    kernel_size: int
    r: int
    kernel_dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_f: jnp.ndarray) -> jnp.ndarray:
        c_in = x_f.shape[-1] // self.r
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, c_in, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = (self.kernel_size - 1) * self.kernel_dilation // 2
        return apply_folded_conv(
            x_f.astype(self.dtype or x_f.dtype),
            kernel.astype(self.dtype or kernel.dtype), bias,
            rhs_dilation=self.kernel_dilation, pad_left=pad,
            r_in=self.r, r_out=self.r, out_blocks=x_f.shape[1],
        )


class FoldedConvTranspose1dTorch(nn.Module):
    """Param-compatible stand-in for ``ConvTranspose1dTorch`` whose output is
    folded by ``r_out = r_in * stride``; input folded by r_in (r_in=1 accepts
    the canonical layout, making this the fold entry point).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    r_in: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_f: jnp.ndarray) -> jnp.ndarray:
        c_in = x_f.shape[-1] // self.r_in
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01), (k, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        r_out = self.r_in * self.stride
        # transposed conv == lhs-dilated conv with the flipped kernel and
        # pad = k - 1 - padding (see ConvTranspose1dTorch)
        return apply_folded_conv(
            x_f.astype(self.dtype or x_f.dtype),
            jnp.flip(kernel, axis=0).astype(self.dtype or kernel.dtype), bias,
            pad_left=k - 1 - self.padding, lhs_dilation=self.stride,
            r_in=self.r_in, r_out=r_out, out_blocks=x_f.shape[1],
        )
