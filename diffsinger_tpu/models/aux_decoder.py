"""ConvNeXt auxiliary decoder for shallow diffusion
(reference modules/aux_decoder/convnext.py, modules/aux_decoder/__init__.py).

Channel-last: the depthwise k=7 conv + pointwise MLP per block fuse cleanly in
XLA; layer-scale gamma is a per-channel parameter.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float = 1e-6
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        x = nn.Conv(
            self.dim, kernel_size=(7,), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        # dtype keeps bf16 activations bf16 (stats stay f32 inside flax)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
            )
            x = gamma.astype(x.dtype) * x
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return residual + x


class ConvNeXtDecoder(nn.Module):
    """[B, T, in_dims] -> [B, T, out_dims] (reference convnext.py:58-87)."""

    in_dims: int
    out_dims: int
    num_channels: int = 512
    num_layers: int = 6
    kernel_size: int = 7
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.num_channels, kernel_size=(self.kernel_size,),
            padding=(self.kernel_size - 1) // 2, dtype=self.dtype, name="inconv",
        )(x)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                dim=self.num_channels,
                intermediate_dim=self.num_channels * 4,
                layer_scale_init_value=1e-6,
                dropout=self.dropout_rate,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x, deterministic=deterministic)
        x = nn.Conv(
            self.out_dims, kernel_size=(self.kernel_size,),
            padding=(self.kernel_size - 1) // 2, dtype=self.dtype, name="outconv",
        )(x)
        return x


AUX_DECODERS = {"convnext": ConvNeXtDecoder}


class AuxDecoderAdaptor(nn.Module):
    """Spec normalization wrapper around the aux decoder
    (reference modules/aux_decoder/__init__.py:28-70).

    Training (`infer=False`) emits the normalized spec; inference denormalizes.
    Output: [B, T, M] (num_feats=1) or [B, F, T, M].
    """

    in_dims: int
    out_dims: int
    num_feats: int
    spec_min: Sequence[float]
    spec_max: Sequence[float]
    aux_decoder_arch: str = "convnext"
    aux_decoder_args: dict = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        from diffsinger_tpu.utils import filter_kwargs

        cls = AUX_DECODERS[self.aux_decoder_arch]
        kwargs = filter_kwargs(dict(self.aux_decoder_args or {}), cls)
        kwargs.setdefault("dropout_rate", 0.0)
        self.decoder = cls(
            in_dims=self.in_dims,
            out_dims=self.out_dims * self.num_feats,
            dtype=self.dtype,
            name="decoder",
            **kwargs,
        )
        smin = np.asarray(self.spec_min, dtype=np.float32).reshape(-1)[: self.out_dims]
        smax = np.asarray(self.spec_max, dtype=np.float32).reshape(-1)[: self.out_dims]
        self._k = (smax - smin) / 2.0
        self._b = (smax + smin) / 2.0

    def denorm_spec(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.asarray(self._k) + jnp.asarray(self._b)

    def norm_spec(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - jnp.asarray(self._b)) / jnp.asarray(self._k)

    def __call__(self, condition: jnp.ndarray, infer: bool = False, deterministic: bool = True):
        x = self.decoder(condition, deterministic=deterministic)  # [B, T, F*M]
        if self.num_feats > 1:
            b, t, _ = x.shape
            x = x.reshape(b, t, self.num_feats, self.out_dims).transpose(0, 2, 1, 3)
        if infer:
            x = self.denorm_spec(x)
        return x
