"""Pallas kernel tests (interpret mode on CPU; numerics vs the XLA path)."""

import numpy as np

import jax
import jax.numpy as jnp

from diffsinger_tpu.ops.depthwise_conv import (
    depthwise_conv1d_prelu, depthwise_conv1d_prelu_xla,
)


def test_depthwise_conv_prelu_matches_xla():
    rng = np.random.default_rng(0)
    b, t, c, k = 2, 128, 256, 31
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
    alpha = jnp.asarray(rng.uniform(0.1, 0.4, (c,)).astype(np.float32))

    golden = np.asarray(depthwise_conv1d_prelu_xla(x, w, alpha, kernel_size=k))
    ours = np.asarray(depthwise_conv1d_prelu(x, w, alpha, kernel_size=k, t_blk=64, interpret=True))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_depthwise_conv_prelu_even_kernel():
    # LYNXNet pads (k//2, k//2 - (k+1)%2): for odd k same-pad; check k=7 too
    rng = np.random.default_rng(1)
    b, t, c, k = 1, 64, 128, 7
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.2)
    alpha = jnp.asarray(np.full((c,), 0.25, np.float32))
    golden = np.asarray(depthwise_conv1d_prelu_xla(x, w, alpha, kernel_size=k))
    ours = np.asarray(depthwise_conv1d_prelu(x, w, alpha, kernel_size=k, t_blk=32, interpret=True))
    np.testing.assert_allclose(ours, golden, atol=1e-5)
