"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import, hence the env mutation at module import time.
This emulates a TPU pod slice for sharding tests without TPU hardware
(SURVEY.md §4 implication) and keeps numeric tests deterministic.
"""

import os

# The image's sitecustomize.py (PYTHONPATH=/root/.axon_site) pre-imports jax and
# registers the 'axon' TPU backend before conftest runs, so env vars are too
# late — but backends initialize lazily, so jax.config still wins here.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare fp32 math against torch; XLA's default matmul/conv
# precision on CPU introduces ~1e-3 relative error otherwise.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
