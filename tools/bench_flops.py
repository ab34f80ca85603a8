"""Compute the bench FLOP-model corrections on the CPU backend.

bench.py derives its MFU from XLA cost analysis of the ONE compiled e2e
program.  Two corrections are needed on top of that number:

1. XLA counts a ``lax.scan`` body once regardless of trip count, so the
   50-step sampler loop is undercounted by (steps-1) denoiser evaluations.
2. The folded (space-to-depth) vocoder tail trades ~5x cheap arithmetic for
   8x less HBM traffic (vocoders/folding.py); MFU should count the
   *algorithmic* (canonical) vocoder flops, so we need the folded/canonical
   delta.

Measuring these took three extra XLA compiles inside bench.py — which is what
pushed the round-2 driver bench over its time budget (the axon backend
compiles server-side, uncached).  This script computes the same numbers with
JAX_PLATFORMS=cpu (local, persistently cached compiles) and writes them to a
small JSON cache keyed by the relevant config, so bench.py on the TPU only
ever pays for its single e2e compile.

Run directly to (re)generate the committed cache:

    JAX_PLATFORMS=cpu python tools/bench_flops.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
CACHE_PATH = ROOT / "docs" / "perf" / "bench_flops_cache.json"


def cache_key(hp: dict, batch: int, t_mel: int, dtype_name: str) -> str:
    """Key the cache by everything the FLOP counts depend on."""
    import jax

    sig = {
        "jax": jax.__version__,
        "B": batch,
        "T_MEL": t_mel,
        "dtype": dtype_name,
        "n_mels": hp["audio_num_mel_bins"],
        "hidden": hp["hidden_size"],
        "backbone": hp["backbone_type"],
        "backbone_args": hp["backbone_args"],
        "sample_rate": hp["audio_sample_rate"],
        "hop": hp["hop_size"],
    }
    return json.dumps(sig, sort_keys=True)


def _flops_of(fn, fargs) -> float:
    import jax

    cost = jax.jit(fn).lower(*fargs).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def compute(batch: int, t_mel: int, dtype_name: str) -> dict:
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    # The image's sitecustomize pre-registers the axon TPU backend, so the
    # JAX_PLATFORMS env var is too late — but backends init lazily and the
    # config update still wins (same trick as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.vocoders.nsf_hifigan_model import Generator, NsfHifiGanConfig

    hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp["sampling_steps"] = 50
    n_mels = hp["audio_num_mel_bins"]
    dtype = {"bf16": jnp.bfloat16, "f32": None}[dtype_name]

    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=n_mels, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))

    voc_cfg = NsfHifiGanConfig(num_mels=n_mels, sampling_rate=hp["audio_sample_rate"],
                               mini_nsf=True, noise_sigma=0.0)
    vocoder = Generator(voc_cfg, dtype=dtype)
    voc_params = vocoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, n_mels)), jnp.zeros((1, 16))
    )

    n_layers = hp["backbone_args"]["num_layers"]
    n_ch = hp["backbone_args"]["num_channels"]
    x0 = jnp.zeros((batch, t_mel, n_mels), jnp.float32)
    t0_ = jnp.zeros((batch,), jnp.float32)
    cond0 = jnp.zeros((batch, t_mel, hp["hidden_size"]), jnp.float32)
    proj0 = jnp.zeros((n_layers, batch, t_mel, n_ch), dtype or jnp.float32)
    step_flops = _flops_of(
        lambda p, x, t, c, cp: model.module.apply(
            p, x, t, c, cond_proj=cp, method="denoise"),
        (params, x0, t0_, cond0, proj0),
    )

    mel0 = jnp.zeros((batch, t_mel, n_mels), jnp.float32)
    f0_0 = jnp.zeros((batch, t_mel), jnp.float32)
    voc_folded = _flops_of(
        lambda p, m, f: vocoder.apply(p, m, f), (voc_params, mel0, f0_0))
    canonical = vocoder.clone(fold_lanes=0)
    voc_canon = _flops_of(
        lambda p, m, f: canonical.apply(p, m, f), (voc_params, mel0, f0_0))

    return {
        "key": cache_key(hp, batch, t_mel, dtype_name),
        "sampling_steps": hp["sampling_steps"],
        "step_flops": step_flops,
        "voc_folded_flops": voc_folded,
        "voc_canonical_flops": voc_canon,
    }


def main():
    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        print("warning: JAX_PLATFORMS does not include 'cpu'; compiles may hit "
              "a remote backend", file=sys.stderr)
    batch = int(os.environ.get("DS_BENCH_BATCH", "16"))  # keep in sync with bench.py
    t_mel = int(os.environ.get("DS_BENCH_T_MEL", "1024"))
    dtype_name = os.environ.get("DS_BENCH_DTYPE", "bf16")
    result = compute(batch, t_mel, dtype_name)
    CACHE_PATH.parent.mkdir(parents=True, exist_ok=True)
    CACHE_PATH.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
