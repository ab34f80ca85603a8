"""Denoiser backbone registry (reference modules/backbones/__init__.py:6-18)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diffsinger_tpu.utils import filter_kwargs

from .lynxnet import LYNXNet
from .wavenet import WaveNet

BACKBONES = {
    "wavenet": WaveNet,
    "lynxnet": LYNXNet,
}


def build_backbone(out_dims: int, num_feats: int, backbone_type: str, backbone_args: dict, *,
                   cond_dims: int, dtype=None, remat=False):
    cls = BACKBONES[backbone_type]
    kwargs = filter_kwargs(dict(backbone_args), cls)
    kwargs.setdefault("dtype", dtype)
    kwargs.setdefault("remat", remat)
    return cls(in_dims=out_dims, n_feats=num_feats, cond_dims=cond_dims, **kwargs)


def precompute_cond_projections(denoiser_params, cond: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Hoist the per-layer conditioner projections out of the sampler loop.

    The condition is constant across sampler steps, yet both backbones apply a
    per-layer ``conditioner_projection`` Dense to it inside the denoiser — a
    scan over N steps recomputes L projections N times. Computing them once
    and feeding the stack back through ``cond_proj`` saves ~L matmuls per step
    (the reference's ONNX exporter performs the same graph surgery, extracting
    the shared conditioner-projection convs from the sampler loop,
    utils/onnx_helper.py:19-404).

    :param denoiser_params: the backbone's parameter subtree
        (e.g. ``params["params"]["denoiser"]``)
    :param cond: [B, T, H]
    :return: [L, B, T, C_out] stacked per-layer projections
    """
    projs = []
    i = 0
    while f"residual_layers_{i}" in denoiser_params:
        p = denoiser_params[f"residual_layers_{i}"]["conditioner_projection"]
        dense = nn.Dense(features=p["kernel"].shape[-1], dtype=dtype)
        projs.append(dense.apply({"params": p}, cond))
        i += 1
    return jnp.stack(projs)


__all__ = ["BACKBONES", "build_backbone", "precompute_cond_projections", "WaveNet", "LYNXNet"]
