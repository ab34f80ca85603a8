"""Can the runtime overlap host->device transfers with device compute?

The training loop prepares and commits batch k+1 while step k executes
(training/base_task.py prepared_batches); whether that actually hides the
upload depends on the runtime. On a local TPU host, device_put DMAs
concurrently with execution. Over the axon tunnel the measured steady state
(~654 ms/step = 277 ms compute + ~325 ms f16 upload, docs/perf/train_bench
.json) suggests the RPC layer serializes them — this probe settles it.

Method: time (a) a long matmul loop alone, (b) a production-batch-sized
device_put alone, (c) dispatch the matmul THEN immediately device_put and
block on both. overlap_ratio = (a+b-c)/min(a,b): 1.0 = full overlap,
0.0 = fully serialized.

Writes docs/perf/overlap_probe.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]

    # compute: a matmul chain sized to ~300 ms on a v5e chip
    n, iters = 4096, 220

    def chain(x):
        def body(i, y):
            return jnp.tanh(y @ w)

        return jax.lax.fori_loop(0, iters, body, x).mean()

    w = jax.device_put(
        jnp.eye(n, dtype=jnp.bfloat16) * 0.999, dev)
    x0 = jax.device_put(
        jnp.ones((n, n), dtype=jnp.bfloat16), dev)
    compiled = jax.jit(chain).lower(x0).compile()
    float(compiled(x0))  # warm

    # transfer: the production 50k-frame f16 wire batch is ~15 MB; use 32 MB
    # so the transfer leg is unambiguous
    host = np.ones((16, 1024, 1024), np.float16)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    records = {"device": dev.platform, "matmul_n": n, "iters": iters,
               "transfer_mb": host.nbytes / 1e6}

    # (a) compute alone (scalar fetch forces completion on the tunnel)
    t_compute, _ = timed(lambda: float(compiled(x0)))
    # (b) transfer alone
    def xfer():
        buf = jax.device_put(host, dev)
        jax.block_until_ready(buf)
        return buf

    t_xfer, _ = timed(xfer)
    del _

    # (c) dispatch compute, then transfer, then block on both
    def both():
        fut = compiled(x0)
        buf = jax.device_put(host, dev)
        jax.block_until_ready(buf)
        return float(fut)

    t_both, _ = timed(both)

    # repeat the combined leg to dodge one-off noise
    t_both2, _ = timed(both)
    t_both = min(t_both, t_both2)

    overlap = (t_compute + t_xfer - t_both) / max(min(t_compute, t_xfer), 1e-9)
    records.update({
        "compute_s": round(t_compute, 4),
        "transfer_s": round(t_xfer, 4),
        "combined_s": round(t_both, 4),
        "overlap_ratio": round(overlap, 3),
        "verdict": ("transfers overlap compute" if overlap > 0.5 else
                    "transfers serialize behind compute"),
    })
    out = ROOT / "docs" / "perf" / "overlap_probe.json"
    out.write_text(json.dumps(records, indent=2) + "\n")
    print(json.dumps(records, indent=2))


if __name__ == "__main__":
    main()
