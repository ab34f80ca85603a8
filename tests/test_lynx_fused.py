"""Parity tests for the fused LYNXNet conv-module Pallas kernel
(ops/lynx_fused.py) against the Flax LYNXConvModule it replaces
(models/backbones/lynxnet.py). Runs in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.models.backbones.lynxnet import LYNXConvModule
from diffsinger_tpu.ops.lynx_fused import (
    conv_module_params_from_flax, fused_conv_module,
)


def _setup(C, expansion, k, B, T, seed=0):
    mod = LYNXConvModule(dim=C, expansion_factor=expansion, kernel_size=k,
                         activation="PReLU", dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(seed), x)
    # non-trivial PReLU slope + biases so every fused stage is exercised
    p = params["params"]
    p["act"]["alpha"] = jax.random.uniform(jax.random.PRNGKey(seed + 2),
                                           p["act"]["alpha"].shape, minval=0.1,
                                           maxval=0.5)
    for name in ("pw_conv1", "dw_conv", "pw_conv2"):
        p[name]["bias"] = 0.3 * jax.random.normal(
            jax.random.PRNGKey(hash(name) % 1000), p[name]["bias"].shape)
    ref = mod.apply(params, x)
    return x, params, ref


@pytest.mark.parametrize("k,tile,T", [(7, 8, 40), (31, 32, 64), (31, 32, 70)])
def test_fused_matches_flax_module_f32(k, tile, T):
    x, params, ref = _setup(C=16, expansion=2, k=k, B=2, T=T)
    got = fused_conv_module(
        x, **conv_module_params_from_flax(params["params"]),
        kernel_size=k, tile=tile, compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_matches_flax_module_bf16_loose():
    x, params, ref = _setup(C=16, expansion=2, k=31, B=1, T=64, seed=3)
    got = fused_conv_module(
        x, **conv_module_params_from_flax(params["params"]),
        kernel_size=31, tile=32, compute_dtype=jnp.bfloat16, interpret=True,
    )
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err.mean() / scale < 0.05, err.mean() / scale


def test_fused_batch_rows_independent():
    """The carry must reset between batch rows: permuting batch rows permutes
    outputs exactly (no cross-batch leakage through the carried window)."""
    x, params, ref = _setup(C=16, expansion=2, k=31, B=3, T=64, seed=7)
    kw = dict(kernel_size=31, tile=32, compute_dtype=jnp.float32, interpret=True)
    args = conv_module_params_from_flax(params["params"])
    out = fused_conv_module(x, **args, **kw)
    out_perm = fused_conv_module(x[::-1], **args, **kw)
    np.testing.assert_allclose(np.asarray(out_perm), np.asarray(out)[::-1],
                               atol=1e-6)


def test_fused_zero_pad_edge_behavior():
    """First/last rows see the conv's zero padding, not wrapped or carried
    rows: a signal concentrated at the segment edge must match Flax exactly."""
    x, params, _ = _setup(C=16, expansion=2, k=31, B=1, T=48, seed=11)
    x = x.at[:, 1:].set(0.0)  # energy only at the first row
    mod = LYNXConvModule(dim=16, expansion_factor=2, kernel_size=31,
                         activation="PReLU", dropout=0.0)
    ref = mod.apply(params, x)
    got = fused_conv_module(
        x, **conv_module_params_from_flax(params["params"]),
        kernel_size=31, tile=16, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
