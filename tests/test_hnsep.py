"""CascadedNet (vocal remover) parity vs the reference torch implementation."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffsinger_tpu.models.hnsep import CascadedNet, convert_cascaded_net, upsample_x2_align_corners


def _import_ref_nets():
    pkg = types.ModuleType("ref_vr")
    pkg.__path__ = ["/root/reference/modules/hnsep/vr"]
    sys.modules["ref_vr"] = pkg
    for name in ["layers", "nets"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_vr.{name}", f"/root/reference/modules/hnsep/vr/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_vr.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_vr.nets"]


def test_upsample_align_corners_matches_torch():
    x = np.random.default_rng(0).standard_normal((1, 6, 10, 3)).astype(np.float32)
    golden = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(upsample_x2_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-5)


@pytest.mark.slow
def test_cascaded_net_matches_reference():
    ref = _import_ref_nets()
    torch.manual_seed(0)
    n_fft, hop = 256, 64
    tnet = ref.CascadedNet(n_fft, hop, nout=8, nout_lstm=16, is_complex=True, is_mono=True)
    tnet.eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(1)
    spec = (rng.standard_normal((1, 1, n_fft // 2 + 1, 32))
            + 1j * rng.standard_normal((1, 1, n_fft // 2 + 1, 32))).astype(np.complex64)
    with torch.no_grad():
        golden = tnet(torch.from_numpy(spec)).numpy()

    jnet = CascadedNet(n_fft, hop, nout=8, nout_lstm=16, is_complex=True, is_mono=True)
    params = jax.tree.map(jnp.asarray, convert_cascaded_net(tnet.state_dict()))
    ours = np.asarray(jnet.apply(params, jnp.asarray(spec)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours.real, golden.real, atol=5e-4)
    np.testing.assert_allclose(ours.imag, golden.imag, atol=5e-4)


@pytest.mark.slow
def test_predict_harmonic_matches_reference_pipeline(tmp_path):
    """Full vr pipeline (stft -> mask -> istft, one jitted program) vs the
    reference's predict_from_audio (nets.py:175-197) from a saved torch
    checkpoint + config.yaml, via the public predict_harmonic entry."""
    import yaml

    from diffsinger_tpu.models.hnsep import predict_harmonic

    ref = _import_ref_nets()
    torch.manual_seed(3)
    n_fft, hop = 256, 64
    tnet = ref.CascadedNet(n_fft, hop, nout=8, nout_lstm=16, is_complex=True,
                           is_mono=True)
    tnet.eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    ckpt = tmp_path / "model.pt"
    torch.save(tnet.state_dict(), ckpt)
    (tmp_path / "config.yaml").write_text(yaml.safe_dump({
        "n_fft": n_fft, "hop_length": hop, "n_out": 8, "n_out_lstm": 16,
        "is_mono": True,
    }))

    t = np.arange(int(0.5 * 8000)) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * np.random.default_rng(7).standard_normal(len(t))
           ).astype(np.float32)
    with torch.no_grad():
        golden = tnet.predict_from_audio(
            torch.from_numpy(wav)[None, None]).numpy()[0, 0]
    ours = predict_harmonic(ckpt, wav)
    assert ours.shape == wav.shape
    # interior parity (istft edge frames differ by one window of padding)
    sl = slice(n_fft, len(wav) - n_fft)
    np.testing.assert_allclose(ours[sl], golden[sl], atol=2e-3)
