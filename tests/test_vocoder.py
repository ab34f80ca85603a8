"""NSF-HiFiGAN vocoder parity tests.

The end-to-end test random-initializes the *reference torch generator*
(imported from /root/reference with a stubbed lightning module), converts its
state dict with our torch->JAX converter, and checks the JAX generator
reproduces the waveform (mini_nsf + noise_sigma=0 is fully deterministic).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffsinger_tpu.utils.torch_convert import convert_nsf_hifigan, fuse_weight_norm
from diffsinger_tpu.vocoders.nsf_hifigan_model import (
    ConvTranspose1dTorch,
    Generator,
    NsfHifiGanConfig,
    fast_sine_gen,
)


def _import_ref_models():
    # the reference file imports lightning only for rank_zero_info; stub it
    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        pytorch = types.ModuleType("lightning.pytorch")
        utilities = types.ModuleType("lightning.pytorch.utilities")
        rank_zero = types.ModuleType("lightning.pytorch.utilities.rank_zero")
        rank_zero.rank_zero_info = print
        lightning.pytorch = pytorch
        pytorch.utilities = utilities
        utilities.rank_zero = rank_zero
        sys.modules.update({
            "lightning": lightning,
            "lightning.pytorch": pytorch,
            "lightning.pytorch.utilities": utilities,
            "lightning.pytorch.utilities.rank_zero": rank_zero,
        })
    for name, path in [
        ("ref_nsf_env", "/root/reference/modules/nsf_hifigan/env.py"),
        ("ref_nsf_utils", "/root/reference/modules/nsf_hifigan/utils.py"),
    ]:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    # models.py does relative imports (.env, .utils): load as a package member
    pkg = types.ModuleType("ref_nsf")
    pkg.__path__ = ["/root/reference/modules/nsf_hifigan"]
    sys.modules["ref_nsf"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_nsf.models", "/root/reference/modules/nsf_hifigan/models.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_nsf.models"] = mod
    spec.loader.exec_module(mod)
    return mod


TINY = dict(
    num_mels=8,
    sampling_rate=44100,
    upsample_rates=[4, 4, 2, 2],
    upsample_kernel_sizes=[8, 8, 4, 4],
    upsample_initial_channel=32,
    resblock="1",
    resblock_kernel_sizes=[3, 5],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
    mini_nsf=True,
    noise_sigma=0.0,
)


def test_conv_transpose_matches_torch():
    for (cin, cout, k, s) in [(8, 4, 8, 4), (6, 3, 4, 2), (4, 4, 16, 8)]:
        p = (k - s) // 2
        x = np.random.default_rng(0).standard_normal((2, 20, cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=p)
        with torch.no_grad():
            golden = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
        mod = ConvTranspose1dTorch(features=cout, kernel_size=k, stride=s, padding=p)
        params = {
            "params": {
                "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 0, 1)),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))
        assert ours.shape == golden.shape == (2, 20 * s, cout)
        np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_fast_sine_gen_matches_reference():
    ref = _import_ref_models()
    h = ref.AttrDict(TINY)
    gen = ref.Generator(h)
    f0 = np.full((1, 50), 220.0, np.float32)
    f0[0, 20:] = 330.0
    with torch.no_grad():
        golden = gen.fastsinegen(torch.from_numpy(f0)).numpy()  # [B, 1, L]
    upp = int(np.prod(TINY["upsample_rates"][:2]))
    source_sr = TINY["sampling_rate"] / int(np.prod(TINY["upsample_rates"][2:]))
    ours = np.asarray(fast_sine_gen(jnp.asarray(f0), upp, source_sr))  # [B, L, 1]
    np.testing.assert_allclose(ours[:, :, 0], golden[:, 0, :], atol=1e-4)


def test_generator_matches_reference_e2e():
    ref = _import_ref_models()
    h = ref.AttrDict(TINY)
    torch.manual_seed(0)
    tgen = ref.Generator(h)
    tgen.eval()

    state = {k: v for k, v in tgen.state_dict().items()}
    cfg = NsfHifiGanConfig.from_json(TINY)
    params = convert_nsf_hifigan(state, cfg)

    rng = np.random.default_rng(1)
    mel = rng.uniform(-8, 0, (1, 25, TINY["num_mels"])).astype(np.float32)
    f0 = np.full((1, 25), 220.0, np.float32)

    with torch.no_grad():
        golden = tgen(torch.from_numpy(mel).transpose(1, 2), torch.from_numpy(f0)).numpy()

    jgen = Generator(cfg)
    ours = np.asarray(jgen.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(mel), jnp.asarray(f0)))
    hop = int(np.prod(TINY["upsample_rates"]))
    assert ours.shape == (1, 25 * hop)
    assert golden.shape == (1, 1, 25 * hop)
    np.testing.assert_allclose(ours, golden[:, 0, :], atol=5e-4)


def test_fuse_weight_norm():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    state = {f"c.{k}": v for k, v in conv.state_dict().items()}
    fused = fuse_weight_norm(state)
    assert "c.weight" in fused and "c.weight_g" not in fused
    with torch.no_grad():
        x = torch.randn(1, 4, 10)
        golden = conv(x)
        plain = torch.nn.Conv1d(4, 8, 3)
        plain.weight.data = torch.from_numpy(fused["c.weight"])
        plain.bias.data = torch.from_numpy(fused["c.bias"])
        np.testing.assert_allclose(plain(x).numpy(), golden.numpy(), atol=1e-6)


def test_full_sine_source_shape_and_uv():
    from diffsinger_tpu.vocoders.nsf_hifigan_model import sine_source_full

    f0 = np.zeros((1, 20), np.float32)
    f0[0, 5:15] = 220.0
    out = np.asarray(sine_source_full(jnp.asarray(f0), 16, 44100, 8, jax.random.PRNGKey(0)))
    assert out.shape == (1, 320, 9)
    # unvoiced region: small noise only (amp sine_amp/3)
    assert np.abs(out[0, :80]).max() < 0.15
    # voiced region: sine at amplitude ~0.1
    assert np.abs(out[0, 5 * 16 : 15 * 16, 0]).max() > 0.05
