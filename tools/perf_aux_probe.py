"""A/B probe: WHY does the ConvNeXt aux decoder run at 14% MFU
(docs/perf/train_step_parts.json) when its FLOPs are ~all matmul?

Variants of the block, timed fwd and fwd+bwd in ONE process (one fixed
axon compile cost) at the train-step shape B=64 x T=896 x C=512:

  base        as deployed: fp32 LayerNorm + fp32 gamma/residual between
              bf16 convs, dropout 0.1
  nodrop      dropout off (isolates threefry RNG cost)
  ln_bf16     LayerNorm computes in bf16 (params fp32)
  gamma_bf16  layer-scale multiply + residual kept in bf16
  all         nodrop + ln_bf16 + gamma_bf16
  matmul      pure pwconv1/pwconv2 chain only (the MXU floor)

Writes docs/perf/aux_probe.json.  Usage: python tools/perf_aux_probe.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    B, T, C, LAYERS = 64, 896, 512, 6
    INTER = C * 4

    class Block(nn.Module):
        variant: str

        @nn.compact
        def __call__(self, x, rng=None):
            v = self.variant
            residual = x
            x = nn.Conv(C, kernel_size=(7,), padding=3, feature_group_count=C,
                        dtype=jnp.bfloat16, name="dwconv")(x)
            ln_dtype = jnp.bfloat16 if v in ("ln_bf16", "all") else None
            x = nn.LayerNorm(epsilon=1e-6, dtype=ln_dtype, name="norm")(x)
            x = nn.Dense(INTER, dtype=jnp.bfloat16, name="pwconv1")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = nn.Dense(C, dtype=jnp.bfloat16, name="pwconv2")(x)
            gamma = self.param("gamma", nn.initializers.constant(1e-6), (C,))
            if v in ("gamma_bf16", "all"):
                x = gamma.astype(jnp.bfloat16) * x
            else:
                x = gamma * x
            if v in ("base", "ln_bf16", "gamma_bf16") and rng is not None:
                x = nn.Dropout(0.1)(x, deterministic=False, rng=rng)
            return (residual + x).astype(x.dtype if v in ("gamma_bf16", "all")
                                         else jnp.float32)

    class Stack(nn.Module):
        variant: str

        @nn.compact
        def __call__(self, x, rng):
            if self.variant == "matmul":
                for i in range(LAYERS):
                    h = nn.Dense(INTER, dtype=jnp.bfloat16, name=f"a{i}")(x)
                    h = jax.nn.gelu(h, approximate=False)
                    x = x + nn.Dense(C, dtype=jnp.bfloat16, name=f"b{i}")(h)
                return x
            for i in range(LAYERS):
                rng_i = jax.random.fold_in(rng, i)
                x = Block(variant=self.variant, name=f"blk{i}")(x, rng_i)
            return x

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, T, C)), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    peak = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197")) * 1e12
    results = {}

    for variant in ["base", "nodrop", "ln_bf16", "gamma_bf16", "all", "matmul"]:
        m = Stack(variant=variant)
        params = m.init(jax.random.PRNGKey(1), x, key)

        def fwd(p, x, k):
            return jnp.abs(m.apply(p, x, k).astype(jnp.float32)).mean()

        def fwdbwd(p, x, k):
            l, g = jax.value_and_grad(fwd)(p, x, k)
            return l + jax.tree_util.tree_reduce(
                lambda a, v: a + jnp.abs(v.astype(jnp.float32)).sum(), g, 0.0)

        row = {}
        for tag, fn in [("fwd", fwd), ("fwdbwd", fwdbwd)]:
            compiled = jax.jit(fn).lower(params, x, key).compile()
            flops = None
            try:
                cost = compiled.cost_analysis()
                cost = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(cost.get("flops", 0.0)) or None
            except Exception:
                pass
            for _ in range(2):
                float(compiled(params, x, key))
            ts = []
            for i in range(8):
                t0 = time.perf_counter()
                float(compiled(params, x, jax.random.fold_in(key, i)))
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2]
            row[tag] = {"ms": round(med * 1e3, 2), "flops": flops,
                        "mfu": round(flops / med / peak, 4) if flops else None}
        results[variant] = row
        print(f"| {variant:10s} fwd {row['fwd']['ms']:7.2f} ms "
              f"(MFU {100*(row['fwd']['mfu'] or 0):5.1f}%)  "
              f"fwd+bwd {row['fwdbwd']['ms']:7.2f} ms "
              f"(MFU {100*(row['fwdbwd']['mfu'] or 0):5.1f}%)", flush=True)

    out = ROOT / "docs" / "perf" / "aux_probe.json"
    out.write_text(json.dumps({"batch": B, "frames": T, "channels": C,
                               "variants": results}, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
