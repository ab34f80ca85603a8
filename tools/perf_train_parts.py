"""Decompose one production-budget training step: host collate vs upload vs
device compute (BASELINE config #5 diagnosis).

tpu_train_bench.py measures the full loop (~1.9 opt steps/s, MFU ~9% at the
50k-frame budget); this tool answers WHERE the time goes, on a corpus large
enough that one batch actually FILLS the budget (the bench's default 24-item
corpus caps batches at ~29k frames — 57% of budget):

  collate_ms       host-only numpy: HDF5 reads + bucket pad + row pad (1 core)
  step_device_ms   jitted step on a device-RESIDENT batch, loss fetched per
                   step (pure device compute + one tunnel RTT)
  step_hostarg_ms  same step passed the host numpy batch each call (adds the
                   per-step upload) — minus step_device_ms ~= transfer cost
  step_amort_ms    8 steps dispatched back-to-back, loss fetched once — the
                   pipelined ceiling (donated-state pileup bounds this regime
                   on the axon runtime; see base_task.py sync_steps note)
  device_mfu       XLA cost-analysis flops / step_device_ms / peak

Writes docs/perf/train_parts.json.

Usage: python tools/perf_train_parts.py [--items 72] [--frames 50000]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=72)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--frames", type=int, default=50000)
    ap.add_argument("--work", type=str, default=str(ROOT / ".trainprobe"))
    args = ap.parse_args()

    from tools.tpu_train_bench import make_corpus, write_config

    work = pathlib.Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    raw, dict_path = work / "raw", work / "dict.txt"
    cfg = write_config(work, raw, dict_path, args.frames)
    if not (work / "binary" / "train.data").exists():
        make_corpus(raw, dict_path, args.items, args.seconds)
        env_cpu = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "binarize.py"), "--config", str(cfg)],
            env=env_cpu, cwd=ROOT, check=True)

    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import numpy as np

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.data.batch_sampler import DsBatchSampler
    from diffsinger_tpu.parallel.mesh import replicated_sharding, shard_batch
    from diffsinger_tpu.training.base_task import _bucket_batch_size, pad_batch_rows
    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step,
    )
    from diffsinger_tpu.utils import load_class_from_name, remap_reference_class_name

    hp = load_config(str(cfg), exp_name="train_parts", reset=True,
                     ckpt_root=work / "ckpt")
    task = load_class_from_name(remap_reference_class_name(hp["task_cls"]))(hp)
    train_ds, _ = task.build_datasets()
    sampler = DsBatchSampler(
        train_ds.sizes, max_batch_frames=args.frames,
        max_batch_size=hp.get("max_batch_size", 64), num_replicas=1, rank=0,
        frame_count_grid=hp.get("sampler_frame_count_grid", 6),
        shuffle_sample=False, shuffle_batch=False, seed=0)
    sampler.set_epoch(0)
    batches = [b for b in sampler if b]
    indices = max(batches, key=lambda b: len(b) * max(train_ds.sizes[i] for i in b))
    n_local = max(1, len(jax.local_devices()))

    def build_batch():
        batch = train_ds.collater([train_ds[i] for i in indices])
        batch.pop("indices", None)
        size = batch.pop("size")
        return pad_batch_rows(batch, size, _bucket_batch_size(size, n_local))

    batch = build_batch()
    frames = int(batch["mel2ph"].shape[0] * batch["mel2ph"].shape[1])
    print(f"| probe batch: {batch['mel2ph'].shape[0]} rows x "
          f"{batch['mel2ph'].shape[1]} frames = {frames} (budget {args.frames})",
          flush=True)

    tx, _ = build_optimizer(hp)
    state = create_train_state(task.model.init(jax.random.PRNGKey(0)), tx)
    state = jax.device_put(state, replicated_sharding(task.mesh))
    train_step = make_train_step(task.loss_fn, tx)
    rng = jax.random.PRNGKey(0)
    dev_batch = shard_batch(task.mesh, batch)

    # the FIRST compile in a process pays the axon fixed cost — do it first
    with task.mesh:
        compiled = jax.jit(train_step, donate_argnums=0).lower(
            state, dev_batch, rng).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    def run_sync(state, b, n):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            state, metrics = compiled(state, b, rng)
            float(metrics["total_loss"])
            times.append(time.perf_counter() - t0)
        return state, times

    state, _ = run_sync(state, dev_batch, 2)  # warmup
    state, t_dev = run_sync(state, dev_batch, 10)

    # host-arg variant: per-call upload of the numpy batch
    state, _ = run_sync(state, batch, 1)
    state, t_host = run_sync(state, batch, 6)

    # amortized: dispatch 8, fetch once (bounded depth: small enough that the
    # donated-state pileup measured on axon shouldn't dominate)
    t0 = time.perf_counter()
    metrics = None
    for _ in range(8):
        state, metrics = compiled(state, dev_batch, rng)
    float(metrics["total_loss"])
    t_amort = (time.perf_counter() - t0) / 8

    # host-only collate cost
    t0 = time.perf_counter()
    for _ in range(5):
        build_batch()
    collate = (time.perf_counter() - t0) / 5

    med = lambda ts: sorted(ts)[len(ts) // 2]
    peak = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197")) * 1e12
    result = {
        "device": jax.devices()[0].platform,
        "batch_rows": int(batch["mel2ph"].shape[0]),
        "batch_frames": frames,
        "collate_ms": round(collate * 1e3, 1),
        "step_device_ms": round(med(t_dev) * 1e3, 1),
        "step_hostarg_ms": round(med(t_host) * 1e3, 1),
        "upload_ms_implied": round((med(t_host) - med(t_dev)) * 1e3, 1),
        "step_amort_ms": round(t_amort * 1e3, 1),
        "train_step_flops": flops,
        "device_mfu": round(flops / med(t_dev) / peak, 4) if flops else None,
        "amort_mfu": round(flops / t_amort / peak, 4) if flops else None,
        "loop_steps_per_s_implied": round(1.0 / (collate + med(t_host)), 2),
    }
    out = ROOT / "docs" / "perf" / "train_parts.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
