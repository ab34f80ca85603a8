"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import, hence the env mutation at module import time.
This emulates a TPU pod slice for sharding tests without TPU hardware
(SURVEY.md §4 implication) and keeps numeric tests deterministic.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Parity tests compare fp32 math against torch; XLA's default matmul/conv
# precision on CPU introduces ~1e-3 relative error otherwise.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
