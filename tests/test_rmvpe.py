"""RMVPE parity: random-init the reference torch E2E0 (eval), convert weights,
compare JAX output. Also covers GRU math and the cents decoders."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffsinger_tpu.models.rmvpe import (
    E2E0, convert_rmvpe, to_local_average_f0, to_viterbi_f0,
)


def _import_ref_e2e0():
    pkg = types.ModuleType("ref_rmvpe")
    pkg.__path__ = ["/root/reference/modules/pe/rmvpe"]
    sys.modules["ref_rmvpe"] = pkg
    for name in ["constants", "deepunet", "seq", "model"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_rmvpe.{name}", f"/root/reference/modules/pe/rmvpe/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_rmvpe.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_rmvpe.model"]


@pytest.mark.slow
def test_e2e0_matches_reference():
    ref = _import_ref_e2e0()
    torch.manual_seed(0)
    tmodel = ref.E2E0(2, 1, (2, 2), en_de_layers=3, inter_layers=2)  # smaller for CPU
    tmodel.eval()
    # randomize BN stats so the parity test exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    mel = np.random.default_rng(0).standard_normal((1, 64, 128)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(mel).transpose(1, 2)).numpy()

    jmodel = E2E0(2, 1, (2, 2), en_de_layers=3, inter_layers=2)
    params = jax.tree.map(
        jnp.asarray,
        convert_rmvpe(tmodel.state_dict(), n_blocks=2, en_de_layers=3, inter_layers=2),
    )
    ours = np.asarray(jmodel.apply(params, jnp.asarray(mel)))
    assert ours.shape == golden.shape == (1, 64, 360)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_local_average_decode():
    hidden = np.zeros((10, 360), np.float32)
    hidden[:, 100] = 0.9  # cents = 100*20 + CONST
    f0 = to_local_average_f0(hidden)
    expected = 10 * 2 ** ((100 * 20 + 1997.3794084376191) / 1200)
    np.testing.assert_allclose(f0, expected, rtol=1e-6)
    # below threshold -> unvoiced
    hidden2 = hidden * 0.02
    assert (to_local_average_f0(hidden2) == 0).all()


def test_viterbi_decode_smooths_outliers():
    hidden = np.zeros((20, 360), np.float32)
    hidden[:, 100] = 0.8
    hidden[10, 100] = 0.0
    hidden[10, 300] = 0.9  # single-frame jump that viterbi should reject
    f0_local = to_local_average_f0(hidden)
    f0_viterbi = to_viterbi_f0(hidden)
    assert f0_local[10] > 2 * f0_local[9]  # local decode follows the outlier
    # viterbi cannot jump 200 bins in one frame: the path stays near bin 100,
    # where frame 10 has no mass -> reference semantics give ~10 Hz there
    assert f0_viterbi[10] < 0.5 * f0_local[10]
    np.testing.assert_allclose(f0_viterbi[9], f0_local[9], rtol=1e-6)
