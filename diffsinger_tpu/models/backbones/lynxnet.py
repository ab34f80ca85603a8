"""LYNXNet denoiser backbone (reference modules/backbones/lynxnet.py:29-163).

Conformer-style residual layers: LayerNorm -> 1x1 conv to 2*inner -> SwiGLU ->
depthwise conv (k=31) -> PReLU -> 1x1 conv back, with condition and diffusion
step injected per layer. Channel-last throughout; the depthwise conv lowers to
a VPU-friendly strided window op and the pointwise convs to MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsinger_tpu.models.commons import (
    kaiming_normal_torch, resolve_remat_policy, sinusoidal_pos_emb, swiglu,
)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25).

    alpha (an f32 param) is cast to x.dtype before the multiply: without the
    cast, bf16 activations promote to f32 here, doubling the HBM residency of
    the widest buffer in the network (B x T x inner) on an HBM-bound backward.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class LYNXConvModule(nn.Module):
    dim: int
    expansion_factor: int
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner = self.dim * self.expansion_factor
        pad = self.kernel_size // 2
        padding = (pad, pad - (self.kernel_size + 1) % 2)

        # dtype on the norms keeps bf16 activations bf16 (flax still computes
        # the statistics in f32); with dtype=None the f32 scale/bias promote
        # the whole normalized buffer to f32 in HBM
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(inner * 2, kernel_size=(1,), dtype=self.dtype, name="pw_conv1")(x)
        x = swiglu(x)
        x = nn.Conv(
            inner,
            kernel_size=(self.kernel_size,),
            padding=[padding],
            feature_group_count=inner,
            dtype=self.dtype,
            name="dw_conv",
        )(x)
        if self.activation == "PReLU":
            x = PReLU(inner, name="act")(x)
        elif self.activation == "SiLU":
            x = jax.nn.silu(x)
        elif self.activation == "ReLU":
            x = jax.nn.relu(x)
        else:
            raise ValueError(f"{self.activation} is not a valid activation")
        x = nn.Conv(self.dim, kernel_size=(1,), dtype=self.dtype, name="pw_conv2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LYNXNetResidualLayer(nn.Module):
    dim: int
    expansion_factor: int
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout: float = 0.0
    front_cond_inject: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        conditioner: jnp.ndarray,
        diffusion_step: jnp.ndarray,
        deterministic: bool = True,
        cond_proj: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, T, C]; conditioner: [B, T, H]; diffusion_step: [B, C];
        cond_proj: optional precomputed conditioner projection [B, T, C]
        (hoisted out of the sampler loop, see backbones/__init__.py)."""
        if cond_proj is not None:
            cond = cond_proj
        else:
            cond = nn.Dense(self.dim, dtype=self.dtype, name="conditioner_projection")(conditioner)
        if self.front_cond_inject:
            x = x + cond
            res_x = x
        else:
            res_x = x
            x = x + cond
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="diffusion_projection")(diffusion_step)[:, None, :]
        x = LYNXConvModule(
            dim=self.dim,
            expansion_factor=self.expansion_factor,
            kernel_size=self.kernel_size,
            activation=self.activation,
            dropout=self.dropout,
            dtype=self.dtype,
            name="convmodule",
        )(x, deterministic=deterministic)
        return x + res_x


class LYNXNet(nn.Module):
    """Denoiser: spec [B, T, F*M] + step [B] + cond [B, T, H] -> [B, T, F*M]."""

    in_dims: int
    n_feats: int
    cond_dims: int
    num_layers: int = 6
    num_channels: int = 512
    expansion_factor: int = 2
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout_rate: float = 0.0
    strong_cond: bool = False
    dtype: Optional[jnp.dtype] = None
    # rematerialize each residual layer on the backward pass
    # (jax.checkpoint): True/"full" drops activation memory from O(layers)
    # to O(1) layers at ~1/3 extra compute; "dots"/"dots_no_batch" save
    # matmul outputs and recompute only elementwise chains (config key:
    # recompute_grads; see models.commons.resolve_remat_policy)
    remat: object = False

    @nn.compact
    def __call__(
        self,
        spec: jnp.ndarray,
        diffusion_step: jnp.ndarray,
        cond: jnp.ndarray,
        deterministic: bool = True,
        cond_proj: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.num_channels
        x = nn.Dense(
            c, kernel_init=kaiming_normal_torch, dtype=self.dtype, name="input_projection"
        )(spec)
        if not self.strong_cond:
            x = jax.nn.gelu(x, approximate=False)

        step = sinusoidal_pos_emb(diffusion_step, c)
        step = nn.Dense(c * 4, dtype=self.dtype, name="diffusion_embedding_1")(step)
        step = jax.nn.gelu(step, approximate=False)
        step = nn.Dense(c, dtype=self.dtype, name="diffusion_embedding_3")(step)

        layer_cls = LYNXNetResidualLayer
        remat_on, remat_policy = resolve_remat_policy(self.remat)
        if remat_on:
            # deterministic (arg index 4, counting self) is a static python bool
            layer_cls = nn.remat(LYNXNetResidualLayer, static_argnums=(4,),
                                 policy=remat_policy)
        for i in range(self.num_layers):
            x = layer_cls(
                dim=c,
                expansion_factor=self.expansion_factor,
                kernel_size=self.kernel_size,
                activation=self.activation,
                dropout=self.dropout_rate,
                front_cond_inject=self.strong_cond,
                dtype=self.dtype,
                name=f"residual_layers_{i}",
            )(x, cond, step, deterministic,
              None if cond_proj is None else cond_proj[i])

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            self.in_dims * self.n_feats,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_projection",
        )(x)
        return x
