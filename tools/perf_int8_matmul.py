"""int8-vs-bf16 MXU throughput probe at the sampler's pointwise-conv shapes.

Scopes the one unexplored serving-perf lever: TPU v5e lists 394.7 int8 TOPS
vs 197.4 bf16 TFLOP/s.  If XLA reaches ~2x on int8 dots at the LYNXNet
pointwise shapes ([B*T, C] x [C, 2*inner] and [B*T, inner] x [inner, C],
B=16/T=1024/C=1024/inner=2048), weight+activation int8 quantization of the
denoiser matmuls could buy a real e2e win; if the reached ratio is ~1x the
idea is a dead end on this runtime and gets recorded as such.

Prints JSON lines: {"shape", "dtype", "ms", "top_s"} plus a final ratio line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax import lax

    shapes = [
        # (M, K, N): LYNX pw1, pw2, and a square control
        (16384, 1024, 4096),
        (16384, 2048, 1024),
        (8192, 2048, 2048),
    ]
    results = []
    for m, k, n in shapes:
        rng = np.random.default_rng(0)
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
        abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        def dot_i8(a, b):
            out = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            return jnp.abs(out).max()

        def dot_bf(a, b):
            out = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            return jnp.abs(out).max()

        row = {}
        for name, fn, args in (("int8", dot_i8, (a8, b8)), ("bf16", dot_bf, (abf, bbf))):
            jitted = jax.jit(fn)
            float(jitted(*args))  # compile + warmup
            float(jitted(*args))
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                v = float(jitted(*args))
            dt = (time.perf_counter() - t0) / iters
            ops = 2.0 * m * k * n
            rec = {"shape": f"{m}x{k}x{n}", "dtype": name,
                   "ms": round(dt * 1e3, 3), "top_s": round(ops / dt / 1e12, 1)}
            print(json.dumps(rec), flush=True)
            row[name] = dt
        results.append(row)

    ratios = [r["bf16"] / r["int8"] for r in results]
    print(json.dumps({"int8_speedup_ratios": [round(x, 2) for x in ratios],
                      "mean": round(float(np.mean(ratios)), 2)}))


if __name__ == "__main__":
    main()
