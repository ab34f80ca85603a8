"""Hoisted conditioner projections must be numerically identical to the
in-loop path (backbones.precompute_cond_projections mirrors the reference
ONNX exporter's extraction of shared conditioner-projection convs from the
sampler loop, utils/onnx_helper.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.models.backbones import (
    LYNXNet, WaveNet, precompute_cond_projections,
)


@pytest.mark.parametrize("backbone_cls,kwargs", [
    (LYNXNet, dict(num_layers=2, num_channels=24, expansion_factor=2, kernel_size=7)),
    (WaveNet, dict(num_layers=3, num_channels=16, dilation_cycle_length=2)),
])
@pytest.mark.slow
def test_cond_proj_matches_inloop(backbone_cls, kwargs):
    b, t, m, h = 2, 32, 8, 12
    model = backbone_cls(in_dims=m, n_feats=1, cond_dims=h, **kwargs)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(jax.random.PRNGKey(1), (b, t, m))
    step = jnp.full((b,), 37.0)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, t, h))
    params = model.init(rng, spec, step, cond)

    golden = model.apply(params, spec, step, cond)
    projs = precompute_cond_projections(params["params"], cond)
    assert projs.shape[0] == kwargs["num_layers"]
    hoisted = model.apply(params, spec, step, cond, cond_proj=projs)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(golden), atol=1e-6)
