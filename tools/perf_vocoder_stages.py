"""Per-stage NSF-HiFiGAN cost probe on the current backend.

Times each upsample stage (ConvTranspose + source-injection conv + 3 resblocks)
as an isolated jitted program at the flagship shapes (B=8, T=1024 frames,
hop 512), plus conv_pre/conv_post and the mini_nsf source. Random weights —
stage cost is weight-independent. Prints a JSON line per stage.

Usage: python tools/perf_vocoder_stages.py  (respects DS_BENCH_BATCH)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(jitted, args, iters=5):
    v = jitted(*args)
    float(v)  # force (axon: block_until_ready doesn't force remote exec)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jitted(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from diffsinger_tpu.vocoders.nsf_hifigan_model import (
        ConvTranspose1dTorch, NsfHifiGanConfig, ResBlock1, fast_sine_gen,
    )

    cfg = NsfHifiGanConfig(mini_nsf=True)
    B = int(os.environ.get("DS_BENCH_BATCH", "8"))
    T = 1024
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    results = []

    def bench_module(name, mod, x_shape, extra=None):
        x = jax.random.normal(key, x_shape, dtype)
        args = (x,) if extra is None else (x, extra)
        params = mod.init(jax.random.PRNGKey(1), *args)

        def run(params, *a):
            return jnp.abs(mod.apply(params, *a)).mean()

        dt = time_fn(jax.jit(run), (params, *args))
        results.append({"stage": name, "ms": round(dt * 1e3, 2), "shape": list(x_shape)})

    # conv_pre: mel [B, T, 128] -> [B, T, 512]
    bench_module("conv_pre", nn.Conv(cfg.upsample_initial_channel, (7,), padding=3, dtype=dtype),
                 (B, T, cfg.num_mels))

    # each upsample stage
    ch = cfg.upsample_initial_channel
    L = T
    num_kernels = len(cfg.resblock_kernel_sizes)

    class Stage(nn.Module):
        ch_out: int
        up: int
        k: int

        @nn.compact
        def __call__(self, x):
            x = jnp.where(x >= 0, x, 0.1 * x)
            x = ConvTranspose1dTorch(self.ch_out, self.k, self.up,
                                     (self.k - self.up) // 2, dtype=dtype)(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                b = ResBlock1(self.ch_out, rk, tuple(rd), dtype=dtype, name=f"rb{j}")(x)
                xs = b if xs is None else xs + b
            return xs / num_kernels

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch_out = ch // 2
        bench_module(f"stage{i}_u{u}_c{ch_out}", Stage(ch_out, u, k), (B, L, ch))
        ch = ch_out
        L *= u

    # conv_post at [B, L, 16]
    bench_module("conv_post", nn.Conv(1, (7,), padding=3, dtype=dtype), (B, L, ch))

    # mini_nsf source
    f0 = jnp.full((B, T), 220.0, jnp.float32)
    src_sr = cfg.sampling_rate / int(np.prod(cfg.upsample_rates[2:]))
    upp = int(np.prod(cfg.upsample_rates[:2]))
    dt = time_fn(jax.jit(lambda f: jnp.abs(fast_sine_gen(f, upp, src_sr)).mean()), (f0,))
    results.append({"stage": "fast_sine_gen", "ms": round(dt * 1e3, 2), "shape": [B, T]})

    for r in results:
        print(json.dumps(r))
    print(json.dumps({"stage": "TOTAL", "ms": round(sum(r["ms"] for r in results), 2)}))


if __name__ == "__main__":
    main()
