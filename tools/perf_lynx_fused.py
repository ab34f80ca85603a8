"""On-device A/B: fused LYNXConvModule Pallas kernel vs the XLA/Flax path.

Decides whether ops/lynx_fused.py gets wired into the LYNXNet backbone
(round-2 lesson: standalone Pallas dw-conv lost to XLA 2.4x — only a fused
win counts). Runs at the flagship sampler dims (B=8, T=1024, C=1024, I=2048,
k=31, bf16) and sweeps kernel tile sizes, since VMEM (~16 MB/core) is tight
with 12.3 MB of resident weights.

Prints one JSON line per variant; the fused kernel must beat `flax_xla` to
be wired.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=20):
    v = fn(*args)
    float(np.asarray(v).ravel()[0])  # force remote execution (axon tunnel)
    # warmup discard (bench-pollution note): one extra timed-region run
    float(np.asarray(fn(*args)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(*args)).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.models.backbones.lynxnet import LYNXConvModule
    from diffsinger_tpu.ops.lynx_fused import (
        conv_module_params_from_flax, fused_conv_module,
    )

    B, T, C, exp, k = 8, 1024, 1024, 2, 31
    dtype = jnp.bfloat16

    mod = LYNXConvModule(dim=C, expansion_factor=exp, kernel_size=k,
                         activation="PReLU", dropout=0.0, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)

    flax_fn = jax.jit(lambda p, x: jnp.abs(mod.apply(p, x)).mean())
    dt = timed(flax_fn, (params, x))
    print(json.dumps({"variant": "flax_xla", "ms": round(dt * 1e3, 3)}))
    base_ms = dt * 1e3

    fargs = conv_module_params_from_flax(params["params"])
    for tile in (64, 128, 256):
        try:
            fn = jax.jit(lambda x, tile=tile: jnp.abs(fused_conv_module(
                x, **fargs, kernel_size=k, tile=tile,
                compute_dtype=dtype)).mean())
            dt = timed(fn, (x,))
            print(json.dumps({
                "variant": f"fused_tile{tile}", "ms": round(dt * 1e3, 3),
                "speedup_vs_xla": round(base_ms / (dt * 1e3), 2),
            }))
        except Exception as e:
            print(json.dumps({
                "variant": f"fused_tile{tile}",
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }))


def main_scan():
    """Amortized variant: 50 chained module applications inside one lax.scan
    dispatch (the module's entry LayerNorm keeps iterated application stable),
    matching how the sampler actually amortizes the tunnel's per-dispatch
    overhead. This is the number the wiring decision uses."""
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.models.backbones.lynxnet import LYNXConvModule
    from diffsinger_tpu.ops.lynx_fused import (
        conv_module_params_from_flax, fused_conv_module,
    )

    B, T, C, exp, k, N = 8, 1024, 1024, 2, 31, 50
    dtype = jnp.bfloat16

    mod = LYNXConvModule(dim=C, expansion_factor=exp, kernel_size=k,
                         activation="PReLU", dropout=0.0, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    fargs = conv_module_params_from_flax(params["params"])

    def scan_of(step):
        def run(x):
            body = lambda c, _: (step(c).astype(jnp.float32), None)
            y, _ = jax.lax.scan(body, x, None, length=N)
            return jnp.abs(y).mean()
        return jax.jit(run)

    dt = timed(scan_of(lambda c: mod.apply(params, c)), (x,), iters=10)
    base = dt * 1e3 / N
    print(json.dumps({"variant": "flax_xla_scan", "ms_per_call": round(base, 3)}))

    for tile in (128, 256):
        fn = scan_of(lambda c, tile=tile: fused_conv_module(
            c, **fargs, kernel_size=k, tile=tile, compute_dtype=dtype))
        dt = timed(fn, (x,), iters=10)
        ms = dt * 1e3 / N
        print(json.dumps({"variant": f"fused_tile{tile}_scan",
                          "ms_per_call": round(ms, 3),
                          "speedup_vs_xla": round(base / ms, 2)}))


if __name__ == "__main__":
    main_scan() if "--scan" in sys.argv else main()
