"""Folded (space-to-depth) vocoder layout: exact-equivalence tests.

The folded tail (vocoders/folding.py) is a pure re-indexing of the canonical
convolutions — same arithmetic, lane-dense [B, L/r, r*C] layout. These tests
pin (a) kernel-level equivalence for every conv flavor the tail uses,
(b) generator-level equivalence for both NSF modes with an identical param
tree (so converted torch checkpoints are layout-agnostic).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402
from jax import lax  # noqa: E402

from diffsinger_tpu.vocoders.folding import apply_folded_conv  # noqa: E402
from diffsinger_tpu.vocoders.nsf_hifigan_model import (  # noqa: E402
    Generator, NsfHifiGanConfig,
)


def _unfolded(x, w, *, rhs_d=1, pad=0, lhs_d=1):
    return lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], lhs_dilation=(lhs_d,), rhs_dilation=(rhs_d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@pytest.mark.parametrize("k,d,c,r", [(3, 1, 16, 8), (11, 5, 16, 8), (7, 3, 32, 4), (3, 5, 64, 2)])
def test_folded_dilated_conv_exact(k, d, c, r):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 128, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
    pad = (k - 1) * d // 2
    ref = _unfolded(x, w, rhs_d=d, pad=pad)
    out = apply_folded_conv(
        x.reshape(2, 128 // r, r * c), w, None,
        rhs_dilation=d, pad_left=pad, r_in=r, r_out=r, out_blocks=128 // r,
    ).reshape(2, 128, c)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


@pytest.mark.parametrize("c_in,r_in,u,k", [(128, 1, 2, 4), (64, 2, 2, 4), (32, 4, 2, 4)])
def test_folded_transposed_conv_exact(c_in, r_in, u, k):
    rng = np.random.default_rng(1)
    c_out = c_in // 2
    x = jnp.asarray(rng.standard_normal((2, 64, c_in)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c_in, c_out)).astype(np.float32))
    padding = (k - u) // 2
    pl = k - 1 - padding
    ref = _unfolded(x, jnp.flip(w, 0), pad=pl, lhs_d=u)
    out = apply_folded_conv(
        x.reshape(2, 64 // r_in, r_in * c_in), jnp.flip(w, 0), None,
        pad_left=pl, lhs_dilation=u, r_in=r_in, r_out=r_in * u,
        out_blocks=64 // r_in,
    ).reshape(2, 64 * u, c_out)
    assert ref.shape == out.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


@pytest.mark.parametrize("c_out,r_out,stride", [(64, 2, 4), (32, 4, 2), (16, 8, 1), (256, 1, 8)])
def test_folded_strided_source_conv_exact(c_out, r_out, stride):
    """Strided downsampling conv (full-NSF noise_convs: k=2s, pad s//2) from a
    1-channel source folded at r_in = r_out*stride."""
    rng = np.random.default_rng(2)
    L = 512
    k = 2 * stride if stride > 1 else 1
    pad = stride // 2
    x = jnp.asarray(rng.standard_normal((2, L, 1)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 1, c_out)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (stride,), [(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"))
    r_in = r_out * stride
    out = apply_folded_conv(
        x.reshape(2, L // r_in, r_in), w, None,
        pad_left=pad, r_in=r_in, r_out=r_out, stride=stride,
        out_blocks=L // r_in,
    ).reshape(2, L // stride, c_out)
    assert ref.shape == out.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("mini_nsf", [True, False])
def test_generator_folded_matches_canonical(mini_nsf):
    rng = np.random.default_rng(2)
    cfg = NsfHifiGanConfig(num_mels=16, mini_nsf=mini_nsf)
    g0 = Generator(cfg, fold_lanes=0)
    g1 = Generator(cfg, fold_lanes=128)
    mel = jnp.asarray(rng.uniform(-8, -1, (2, 8, 16)).astype(np.float32))
    f0 = jnp.full((2, 8), 220.0, jnp.float32)
    p0 = g0.init(jr.PRNGKey(0), mel, f0, rng=jr.PRNGKey(5))
    p1 = g1.init(jr.PRNGKey(0), mel, f0, rng=jr.PRNGKey(5))
    # identical param trees: converted checkpoints are layout-agnostic
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert all(a.shape == b.shape
               for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    y0 = g0.apply(p0, mel, f0, rng=jr.PRNGKey(5))
    y1 = g1.apply(p0, mel, f0, rng=jr.PRNGKey(5))
    assert y0.shape == y1.shape == (2, 8 * cfg.hop_size)
    scale = float(jnp.abs(y0).max())
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4 * scale)
