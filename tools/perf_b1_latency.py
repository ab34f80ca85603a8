"""B=1 (interactive / OpenUTAU-preview) latency decomposition.

docs/perf/SUMMARY.md records e2e serving throughput 24.0k mel frames/s at
B=16 but only ~10.5k at B=1 (`DS_BENCH_BATCH=1 bench.py`).  The single-phrase
path IS the OpenUTAU preview experience, so this probe answers where the B=1
run spends its time (VERDICT r3 weak #7):

  null       a jitted 8-float add — the pure dispatch+fetch round trip this
             process pays per program call (axon tunnel: milliseconds;
             local TPU host: ~100 us)
  sampler    encoder + aux + 50-step reflow sampling (no vocoder)
  vocoder    NSF-HiFiGAN mini-nsf on the sampler's output shape
  e2e        sampler + vocoder fused in ONE program (what serving runs)

Each program is timed at B=1 and B=16 on T=1024 (the ~11.9 s bench segment)
plus B=1 on T=384 (a ~4.5 s preview phrase), with XLA cost-analysis FLOPs +
bytes so the roofline floor (MXU peak vs HBM bandwidth, whichever binds) is
printed next to the measurement — "B=1 is slow" is only actionable if the
floor says it shouldn't be.

CAVEAT: XLA cost analysis counts a ``lax.scan`` body ONCE, so the
sampler/e2e floors here understate the true floor by ~the step count (the
null and vocoder rows are exact; bench.py applies the scan correction for
the headline MFU).  Cross-program comparisons of *measured* ms are what this
probe is for; treat sampler/e2e `sol_pct` as an upper bound on headroom.

Usage: python tools/perf_b1_latency.py [--record]
Writes docs/perf/b1_latency.json with --record.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.vocoders.nsf_hifigan_model import Generator, NsfHifiGanConfig

    hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp["sampling_steps"] = 50
    n_mels = hp["audio_num_mel_bins"]
    dtype = jnp.bfloat16
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=n_mels, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    voc_cfg = NsfHifiGanConfig(num_mels=n_mels, sampling_rate=hp["audio_sample_rate"],
                               mini_nsf=True, noise_sigma=0.0)
    vocoder = Generator(voc_cfg, dtype=dtype)
    voc_params = vocoder.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 16, n_mels)), jnp.zeros((1, 16)))

    peak = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197")) * 1e12
    hbm_bw = float(os.environ.get("DS_BENCH_HBM_GBPS", "819")) * 1e9

    def make_inputs(B, T_mel):
        T_txt = max(16, T_mel // 8)
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(1, 60, (B, T_txt)).astype(np.int32))
        mel2ph = jnp.asarray(np.tile(
            np.repeat(np.arange(1, T_txt + 1), T_mel // T_txt)[None],
            (B, 1)).astype(np.int32))
        f0 = jnp.asarray(np.full((B, T_mel), 220.0, np.float32))
        return tokens, mel2ph, f0

    def sampler_fn(params, voc_params, rng, tokens, mel2ph, f0):
        out = model.forward_infer(params, rng, tokens, mel2ph, f0)
        return jnp.abs(out.diff_out).mean()

    def e2e_fn(params, voc_params, rng, tokens, mel2ph, f0):
        out = model.forward_infer(params, rng, tokens, mel2ph, f0)
        wav = vocoder.apply(voc_params, out.diff_out, f0)
        return jnp.abs(wav).mean()

    def voc_fn(voc_params, mel, f0):
        return jnp.abs(vocoder.apply(voc_params, mel, f0)).mean()

    def null_fn(x):
        return (x + 1.0).sum()

    def run(name, fn, fargs):
        compiled = jax.jit(fn).lower(*fargs).compile()
        flops = bytes_acc = None
        try:
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0)) or None
            bytes_acc = float(cost.get("bytes accessed", 0.0)) or None
        except Exception:
            pass
        for _ in range(2):
            float(np.asarray(jax.device_get(compiled(*fargs))).ravel()[0])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(compiled(*fargs))).ravel()[0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        flop_floor = (flops / peak) if flops else 0.0
        bw_floor = (bytes_acc / hbm_bw) if bytes_acc else 0.0
        floor = max(flop_floor, bw_floor) or None
        row = {
            "ms": round(med * 1e3, 2),
            "flops": flops,
            "bytes_accessed": bytes_acc,
            "floor_ms": round(floor * 1e3, 2) if floor else None,
            "floor_bound": (None if not floor else
                            ("hbm" if bw_floor > flop_floor else "mxu")),
            "sol_pct": round(100 * floor / med, 1) if floor else None,
        }
        print(f"| {name:24s} {row['ms']:9.2f} ms  floor {row['floor_ms'] or 0:8.2f} ms "
              f"({row['floor_bound'] or '-':3s}) = {row['sol_pct'] or 0:5.1f}% SoL",
              flush=True)
        return row

    result = {"device": jax.devices()[0].platform, "steps": 50,
              "peak_tflops": peak / 1e12, "hbm_gbps": hbm_bw / 1e9, "parts": {}}

    key = jax.random.PRNGKey(2)
    result["parts"]["null_dispatch"] = run(
        "null_dispatch", null_fn, (jnp.zeros((8,), jnp.float32),))

    for tag, B, T in (("b1_t1024", 1, 1024), ("b16_t1024", 16, 1024),
                      ("b1_t384", 1, 384)):
        tokens, mel2ph, f0 = make_inputs(B, T)
        mel = jnp.zeros((B, T, n_mels), dtype)
        fa = (params, voc_params, key, tokens, mel2ph, f0)
        r_s = run(f"sampler_{tag}", sampler_fn, fa)
        r_v = run(f"vocoder_{tag}", voc_fn, (voc_params, mel, f0))
        r_e = run(f"e2e_{tag}", e2e_fn, fa)
        for nm, r in (("sampler", r_s), ("vocoder", r_v), ("e2e", r_e)):
            r["frames_per_s"] = round(B * T / (r["ms"] / 1e3), 1)
            result["parts"][f"{nm}_{tag}"] = r

    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk in
                          ("ms", "floor_ms", "floor_bound", "sol_pct",
                           "frames_per_s")}
                      for k, v in result["parts"].items()}, indent=1))
    if args.record:
        out = ROOT / "docs" / "perf" / "b1_latency.json"
        out.write_text(json.dumps(result, indent=2) + "\n")
        print(f"| wrote {out}")


if __name__ == "__main__":
    main()
