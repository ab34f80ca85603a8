"""Sampler sweep (BASELINE.md config #3): rectified-flow and DDPM-accelerator
sampling throughput on the flagship acoustic model.

The reference exposes euler/rk2/rk4/rk5 for rectified flow
(modules/core/reflow.py:66-102) and ddim/plms/dpm-solver/unipc accelerators
for DDPM (modules/core/ddpm.py:149-322); this sweep measures the rebuilt
samplers end-to-end (encoder + aux draft + sampler, no vocoder) at the
serving shape B=16 x T=1024 on whatever jax.devices() provides.

Each variant is one AOT compile of DiffSingerAcoustic.forward_infer with the
variant's (diffusion_type, algorithm, steps/speedup) baked in.  On the
remote-TPU runtime the FIRST compile pays the per-process fixed cost
(~3-6 min); subsequent programs compile in ~1 s, so the whole sweep fits one
window.  Timing discipline: AOT executable, 1 discarded warmup, mean of 3
fetched-scalar iterations.

Writes docs/perf/sampler_sweep.json with --record.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# (label, hparam overrides) — steps for reflow, speedup for ddpm
VARIANTS = [
    ("reflow/euler@10", dict(diffusion_type="reflow", sampling_algorithm="euler", sampling_steps=10)),
    ("reflow/euler@20", dict(diffusion_type="reflow", sampling_algorithm="euler", sampling_steps=20)),
    ("reflow/euler@50", dict(diffusion_type="reflow", sampling_algorithm="euler", sampling_steps=50)),
    ("reflow/rk4@20", dict(diffusion_type="reflow", sampling_algorithm="rk4", sampling_steps=20)),
    ("ddpm/ddim@x10", dict(diffusion_type="ddpm", diff_accelerator="ddim", diff_speedup=10)),
    ("ddpm/pndm@x10", dict(diffusion_type="ddpm", diff_accelerator="pndm", diff_speedup=10)),
    ("ddpm/dpm-solver@x10", dict(diffusion_type="ddpm", diff_accelerator="dpm-solver", diff_speedup=10)),
    ("ddpm/unipc@x10", dict(diffusion_type="ddpm", diff_accelerator="unipc", diff_speedup=10)),
    ("ddpm/ddim@x20", dict(diffusion_type="ddpm", diff_accelerator="ddim", diff_speedup=20)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model on CPU: smoke of the tool")
    ap.add_argument("--record", action="store_true", help="write docs/perf/sampler_sweep.json")
    args = ap.parse_args()

    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    base_hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
    B, T_TXT, T_MEL = (2, 8, 64) if args.tiny else (16, 128, 1024)
    if args.tiny:
        base_hp.update(
            hidden_size=32, enc_layers=1, audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
        )
        base_hp["shallow_diffusion_args"] = dict(
            base_hp["shallow_diffusion_args"],
            aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                                  dropout_rate=0.1),
        )

    rng0 = np.random.default_rng(0)
    tokens = jnp.asarray(rng0.integers(1, 60, (B, T_TXT)).astype(np.int32))
    mel2ph = jnp.asarray(
        np.tile(np.repeat(np.arange(1, T_TXT + 1), T_MEL // T_TXT)[None], (B, 1)).astype(np.int32))
    f0 = jnp.asarray(np.full((B, T_MEL), 220.0, np.float32))
    key = jax.random.PRNGKey(2)

    rows = []
    for label, over in VARIANTS:
        hp = dict(base_hp)
        hp.update(over)
        model = DiffSingerAcoustic(hp, vocab_size=62,
                                   out_dims=hp["audio_num_mel_bins"],
                                   dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0))

        def run(params, rng, tokens, mel2ph, f0):
            out = model.forward_infer(params, rng, tokens, mel2ph, f0)
            return jnp.abs(out.diff_out).mean()  # fetched scalar forces remote exec

        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(params, key, tokens, mel2ph, f0).compile()
        compile_s = time.perf_counter() - t0
        v = float(compiled(params, jax.random.fold_in(key, 99), tokens, mel2ph, f0))
        assert np.isfinite(v), label
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            float(compiled(params, jax.random.fold_in(key, i), tokens, mel2ph, f0))
        dt = (time.perf_counter() - t0) / iters
        n_evals = (over.get("sampling_steps") if "sampling_steps" in over
                   else hp.get("K_step_infer", 400) // over["diff_speedup"])
        row = {
            "variant": label,
            "ms": round(dt * 1e3, 1),
            "mel_frames_per_s": round(B * T_MEL / dt, 1),
            "denoiser_evals": int(n_evals),
            "ms_per_eval": round(dt * 1e3 / n_evals, 2),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    result = {
        "metric": "sampler_sweep_frames_per_s",
        "shape": f"B={B} T={T_MEL}",
        "model": "flagship acoustic (encoder+aux+sampler, no vocoder), bf16",
        "device": jax.devices()[0].platform,
        "tiny": bool(args.tiny),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    if args.record:
        rec = ROOT / "docs" / "perf" / "sampler_sweep.json"
        rec.write_text(json.dumps(result, indent=2) + "\n")
        print(f"| wrote {rec}")


if __name__ == "__main__":
    main()
