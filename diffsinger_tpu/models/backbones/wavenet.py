"""WaveNet denoiser backbone (reference modules/backbones/wavenet.py:18-107).

Channel-last [B, T, C] re-expression: the dilated gated convs and all 1x1
projections become XLA convolutions with C on the lane dimension, so each
residual block lowers to MXU matmuls fused with the gate nonlinearity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsinger_tpu.models.commons import (
    kaiming_normal_torch, resolve_remat_policy, sinusoidal_pos_emb,
)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


class ResidualBlock(nn.Module):
    residual_channels: int
    dilation: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioner: jnp.ndarray, diffusion_step: jnp.ndarray,
                 cond_proj: Optional[jnp.ndarray] = None):
        """x: [B, T, C]; conditioner: [B, T, H]; diffusion_step: [B, C];
        cond_proj: optional precomputed conditioner projection [B, T, 2C]
        (hoisted out of the sampler loop, see backbones/__init__.py)."""
        c = self.residual_channels
        step = nn.Dense(c, dtype=self.dtype, name="diffusion_projection")(diffusion_step)
        y = x + step[:, None, :]
        y = nn.Conv(
            2 * c,
            kernel_size=(3,),
            kernel_dilation=(self.dilation,),
            padding=self.dilation,
            dtype=self.dtype,
            name="dilated_conv",
        )(y)
        if cond_proj is None:
            cond_proj = nn.Dense(2 * c, dtype=self.dtype, name="conditioner_projection")(conditioner)
        y = y + cond_proj
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Dense(2 * c, dtype=self.dtype, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class WaveNet(nn.Module):
    """Denoiser: spec [B, T, F*M] + step [B] + cond [B, T, H] -> [B, T, F*M]."""

    in_dims: int
    n_feats: int
    cond_dims: int
    num_layers: int = 20
    num_channels: int = 256
    dilation_cycle_length: int = 4
    dtype: Optional[jnp.dtype] = None
    # rematerialize residual blocks on backward (see LYNXNet.remat)
    remat: object = False

    @nn.compact
    def __call__(self, spec: jnp.ndarray, diffusion_step: jnp.ndarray, cond: jnp.ndarray,
                 cond_proj: Optional[jnp.ndarray] = None):
        c = self.num_channels
        x = nn.Dense(
            c, kernel_init=kaiming_normal_torch, dtype=self.dtype, name="input_projection"
        )(spec)
        x = jax.nn.relu(x)
        step = sinusoidal_pos_emb(diffusion_step, c)
        step = nn.Dense(c * 4, dtype=self.dtype, name="mlp_0")(step)
        step = mish(step)
        step = nn.Dense(c, dtype=self.dtype, name="mlp_2")(step)

        remat_on, remat_policy = resolve_remat_policy(self.remat)
        block_cls = (nn.remat(ResidualBlock, policy=remat_policy)
                     if remat_on else ResidualBlock)
        skip_sum = jnp.zeros_like(x)
        for i in range(self.num_layers):
            x, skip = block_cls(
                residual_channels=c,
                dilation=2 ** (i % self.dilation_cycle_length),
                dtype=self.dtype,
                name=f"residual_layers_{i}",
            )(x, cond, step, None if cond_proj is None else cond_proj[i])
            skip_sum = skip_sum + skip
        x = skip_sum / math.sqrt(self.num_layers)
        x = nn.Dense(c, kernel_init=kaiming_normal_torch, dtype=self.dtype, name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(
            self.in_dims * self.n_feats,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_projection",
        )(x)
        return x
