"""Order-preserving multiprocess runner (reference utils/multiprocess_utils.py:28-52).

Spawn-based workers with per-worker queues drained round-robin so results come
back in submission order regardless of per-item latency.
"""

from __future__ import annotations

import multiprocessing
import os
import traceback

is_main_process = multiprocessing.current_process().name == "MainProcess"


def _worker(fn, args_chunk, queue):
    # Pin workers to the CPU backend before any jax array exists: a TPU (or
    # any PJRT accelerator) is a single-client device — N workers dialing it
    # would contend or crash, and worker-side DSP is CPU-appropriate anyway
    # (SURVEY.md §7.2#8: host DSP multiprocess on CPU, NN extraction batched
    # on the chip from the main process). The config update wins over the
    # sitecustomize-registered platform as long as it runs before first use.
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    for job_idx, args in args_chunk:
        try:
            result = fn(*args)
            queue.put((job_idx, result, None))
        except KeyboardInterrupt:
            break
        except Exception:
            queue.put((job_idx, None, traceback.format_exc()))


def chunked_multiprocess_run(fn, args_list, num_workers: int, q_max_size: int = 100):
    """Yield fn(*args) results in order. ``fn`` must be picklable (top-level)."""
    if num_workers <= 0:
        for args in args_list:
            yield fn(*args)
        return

    ctx = multiprocessing.get_context("spawn")
    n = len(args_list)
    queues = [ctx.Queue(maxsize=q_max_size // num_workers + 1) for _ in range(num_workers)]
    chunks = [[] for _ in range(num_workers)]
    for i, args in enumerate(args_list):
        chunks[i % num_workers].append((i, args))
    procs = [
        ctx.Process(target=_worker, args=(fn, chunk, q), daemon=True)
        for chunk, q in zip(chunks, queues)
    ]
    # children inherit the env at exec: steer their lazy backend choice to CPU
    # even for jax arrays materialized during argument unpickling (e.g. NN
    # extractor params captured in `fn`), which happens before _worker runs
    prev = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        for p in procs:
            p.start()
    finally:
        if prev is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = prev
    try:
        for i in range(n):
            job_idx, result, err = queues[i % num_workers].get()
            assert job_idx == i, f"result order broken: expected {i}, got {job_idx}"
            if err is not None:
                raise RuntimeError(f"Worker error on item {i}:\n{err}")
            yield result
    finally:
        for p in procs:
            p.join(timeout=1)
            if p.is_alive():
                p.terminate()
