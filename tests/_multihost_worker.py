"""Worker process for the 2-process multi-host training test.

Launched by tests/test_precision_and_multihost.py with DS_COORDINATOR_ADDRESS/
DS_NUM_PROCESSES/DS_PROCESS_ID and JAX_PLATFORMS=cpu, JAX_NUM_CPU_DEVICES=2 in
the environment; drives the real multi-host path in BaseTask.start():
jax.distributed.initialize -> rank-strided DsBatchSampler -> deterministic
cross-host pad targets -> jax.make_array_from_process_local_data -> psum train
step -> rank-0-only checkpointing -> multi-host validation.
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    work_dir = pathlib.Path(sys.argv[1])

    from diffsinger_tpu.parallel.dist import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "distributed env not detected"

    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())  # 2 local CPU devs x 2 procs

    from tests.minitask import make_mini_task, mini_hparams, write_mini_dict

    rank = jax.process_index()
    dict_path = work_dir / "mini_dict.txt"
    if rank == 0 and not dict_path.exists():
        write_mini_dict(work_dir)
    # both processes need the file; rank 0 writes it before the barrier below
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dict_written")

    hp = mini_hparams(work_dir, dict_path)
    task = make_mini_task(hp)
    state = task.start(max_steps=3)

    from diffsinger_tpu.training.train_state import optimizer_step

    step = optimizer_step(state)
    # params are fully replicated -> locally addressable on every host; the
    # parent test asserts the sums match across ranks (grads were psum'd)
    w_local = jax.device_get(state.params["w"])
    import numpy as np

    out = {
        "rank": rank,
        "step": int(step),
        "w_sum": float(np.asarray(w_local).sum()),
        "ckpts": sorted(p.name for p in work_dir.glob("model_ckpt_steps_*")),
    }
    (work_dir / f"result_rank{rank}.json").write_text(json.dumps(out))
    print(f"WORKER_OK rank={rank} step={step}")


if __name__ == "__main__":
    main()
