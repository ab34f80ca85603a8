"""Denoiser backbone registry (reference modules/backbones/__init__.py:6-18)."""

from __future__ import annotations

from diffsinger_tpu.utils import filter_kwargs

from .lynxnet import LYNXNet
from .wavenet import WaveNet

BACKBONES = {
    "wavenet": WaveNet,
    "lynxnet": LYNXNet,
}


def build_backbone(out_dims: int, num_feats: int, backbone_type: str, backbone_args: dict, *, cond_dims: int):
    cls = BACKBONES[backbone_type]
    kwargs = filter_kwargs(dict(backbone_args), cls)
    return cls(in_dims=out_dims, n_feats=num_feats, cond_dims=cond_dims, **kwargs)


__all__ = ["BACKBONES", "build_backbone", "WaveNet", "LYNXNet"]
