"""Multi-process (multi-host) runtime initialization.

The reference trains multi-node DDP via Lightning + NCCL
(reference configs/base.yaml:79-83, utils/training_utils.py:367-445,
pl_trainer_num_nodes at basics/base_task.py:401). The TPU-native equivalent is
single-controller JAX: every host runs the same program, calls
``jax.distributed.initialize()``, and the global device mesh spans all hosts;
gradient reductions are XLA collectives over ICI/DCN — no process-group
backend code.

Launch contract (the analogue of ``torchrun``/Lightning's node env):

* On Cloud TPU pods, ``jax.distributed.initialize()`` auto-detects the
  cluster; set ``pl_trainer_num_nodes > 1`` (or DS_DIST=1) to opt in.
* Anywhere else (including CPU test rigs), set::

      DS_COORDINATOR_ADDRESS=host:port  DS_NUM_PROCESSES=N  DS_PROCESS_ID=r

  on every process. This is how tests/test_multihost.py launches 2 real
  processes on the CPU backend.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(hp: dict | None = None) -> bool:
    """Initialize ``jax.distributed`` when a cluster environment is present.

    Must be called before the first touch of ``jax.devices()``. Returns True
    if distributed was initialized. Safe no-op on single-host runs.
    """
    import jax

    if os.environ.get("DS_COORDINATOR_ADDRESS"):
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # Force the platform through config as well: plugin sitecustomize
            # hooks can override the env by setting jax_platforms directly.
            jax.config.update("jax_platforms", "cpu")
            # The CPU client is single-process unless a cross-process
            # collectives implementation is selected (gloo ships in jaxlib).
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=os.environ["DS_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["DS_NUM_PROCESSES"]),
            process_id=int(os.environ["DS_PROCESS_ID"]),
        )
        return True
    if (hp or {}).get("pl_trainer_num_nodes", 1) > 1 or os.environ.get("DS_DIST") == "1":
        # TPU pod / auto-detectable cluster
        jax.distributed.initialize()
        return True
    return False


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
