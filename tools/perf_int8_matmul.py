"""int8-vs-bf16 MXU throughput probe at the sampler's pointwise-conv shapes.

Scopes the one unexplored serving-perf lever: TPU v5e lists 394.7 int8 TOPS
vs 197.4 bf16 TFLOP/s.  If XLA reaches ~2x on int8 dots at the LYNXNet
pointwise shapes ([B*T, C] x [C, 2*inner] and [B*T, inner] x [inner, C],
B=16/T=1024/C=1024/inner=2048), weight+activation int8 quantization of the
denoiser matmuls could buy a real e2e win; if the reached ratio is ~1x the
idea is a dead end on this runtime and gets recorded as such.

MEASURED (2026-08-18, v5e chip, ITERS=50 fori_loop-amortized):
  16384x1024x4096  int8 140.8 TOP/s  vs bf16 104.2 TFLOP/s  -> 1.35x
  16384x2048x1024  int8  99.9        vs       82.8          -> 1.21x
  8192x2048x2048   int8 103.4        vs       77.9          -> 1.33x
  mean 1.29x (int32 accumulator output materialization eats the nominal
  2x; the naive single-dispatch version of this probe read ~1.0x at 2-6
  TOP/s -- pure tunnel-latency artifact, kept as a lesson).
VERDICT: ~1.3x on the matmul fraction (~60% of sampler time) bounds the
e2e win at ~15%, against full weight+activation quantization machinery
and audio-quality risk in a diffusion denoiser. Not wired; recorded as
the measured ceiling if serving efficiency ever becomes the constraint.

Measurement discipline (lesson from ops/lynx_fused.py round 3): a single
matmul is ~0.7 ms but a tunnel round trip is ~100x that, so single-dispatch
timings are pure latency artifacts.  Each timed program runs ITERS matmuls
inside one fori_loop, with the lhs perturbed by the loop index so XLA cannot
hoist the dot out of the loop; the elementwise perturbation adds <10% HBM
traffic at these shapes.

Prints JSON lines: {"shape", "dtype", "ms", "top_s"} plus a final ratio line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50  # matmuls per timed program (amortizes dispatch latency ~50x)


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
        a8 = jnp.asarray(rng.integers(-126, 126, (m, k), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
        abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        def looped(a, b, acc_dtype):
            # lhs depends on the loop index -> the dot cannot be hoisted;
            # the int8 perturbation stays in [-127, 127]
            def body(i, acc):
                ai = a + (i % 2).astype(a.dtype)
                out = lax.dot_general(ai, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_dtype)
                return acc + out.max().astype(jnp.float32)

            return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        def dot_i8(a, b):
            return looped(a, b, jnp.int32)

        def dot_bf(a, b):
            return looped(a, b, jnp.float32)

        row = {}
        for name, fn, args in (("int8", dot_i8, (a8, b8)), ("bf16", dot_bf, (abf, bbf))):
            jitted = jax.jit(fn)
            float(jitted(*args))  # compile + warmup
            float(jitted(*args))
            reps = 4
            t0 = time.perf_counter()
            for _ in range(reps):
                v = float(jitted(*args))
            dt = (time.perf_counter() - t0) / reps / ITERS
            assert np.isfinite(v)
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
