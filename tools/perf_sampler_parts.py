"""Sampler cost probe: times the flagship LYNXNet denoiser and its pieces.

Times on the current backend at B=8, T=1024 (flagship serving shape):
* one full denoiser eval (what each of the ~30 effective sampler steps costs)
* the full 50-step reflow sampling from DiffSingerAcoustic.forward_infer
* isolated parts at layer dims: pointwise matmuls, depthwise k=31 grouped
  conv, LayerNorm+SwiGLU+PReLU elementwise chain

Prints JSON lines with ms and (where available) XLA cost-analysis GFLOPs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(jitted, args, iters=5):
    v = jitted(*args)
    float(np.asarray(v).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(jitted(*args)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    gf = None
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gf = float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        pass
    return dt, gf


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    B, T, C = 8, 1024, 1024
    inner = C * 2
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    out = []

    def rec(name, dt, gf):
        row = {"part": name, "ms": round(dt * 1e3, 2)}
        if gf:
            row["gflops"] = round(gf, 1)
            row["tflops_per_s"] = round(gf / 1e3 / dt, 1)
        out.append(row)
        print(json.dumps(row))

    x = jax.random.normal(key, (B, T, C), dtype)
    xi = jax.random.normal(key, (B, T, inner), dtype)

    # pointwise matmuls at layer dims
    w1 = jax.random.normal(key, (C, inner * 2), dtype) * 0.02
    w2 = jax.random.normal(key, (inner, C), dtype) * 0.02
    rec("pw1_matmul_1024x4096", *timed(jax.jit(lambda x, w: (x @ w).sum()), (x, w1)))
    rec("pw2_matmul_2048x1024", *timed(jax.jit(lambda x, w: (x @ w).sum()), (xi, w2)))

    # depthwise k=31 grouped conv at [B, T, 2048]
    wd = jax.random.normal(key, (31, 1, inner), dtype) * 0.1

    def dw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(15, 15)], feature_group_count=inner,
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).sum()

    rec("dw_conv_k31_g2048", *timed(jax.jit(dw), (xi, wd)))

    # elementwise chain (LN + swiglu + prelu approximations)
    def ew(x):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        y = (x - m) * jax.lax.rsqrt(v + 1e-5)
        a, b = jnp.split(jnp.concatenate([y, y], -1), 2, -1)
        y = a * jax.nn.sigmoid(b) * b
        return jnp.where(y >= 0, y, 0.25 * y).sum()

    rec("elementwise_ln_swiglu_prelu", *timed(jax.jit(ew), (x,)))

    # one full denoiser eval + full sampling
    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    hp = load_config(str(root / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp["sampling_steps"] = 50
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=hp["audio_num_mel_bins"], dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 60, (B, 128)).astype(np.int32))
    mel2ph = jnp.asarray(np.tile(np.repeat(np.arange(1, 129), 8)[None], (B, 1)).astype(np.int32))
    f0 = jnp.full((B, T), 220.0, jnp.float32)

    def full_infer(params, rng_, tokens, mel2ph, f0):
        o = model.forward_infer(params, rng_, tokens, mel2ph, f0)
        return jnp.abs(o.diff_out).mean()

    rec("full_forward_infer_50step",
        *timed(jax.jit(full_infer), (params, jax.random.PRNGKey(2), tokens, mel2ph, f0)))


if __name__ == "__main__":
    main()
