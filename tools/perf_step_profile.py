"""Per-fusion device-time attribution of the production train step (xprof).

perf_train_step_parts.py rooflines each sub-program with XLA's cost analysis,
but `bytes accessed` counts operands of every instruction INSIDE fusions, so
its HBM floor overstates true traffic (r4 recorded 114 GB/step; the profiler
measures ~95 GB device traffic for the same step).  This tool captures an
xprof trace of the chosen program on the real TPU, parses the op_profile tree,
and emits the per-fusion table that the roofline cannot see:

  - device ms per iteration (excludes the axon tunnel's ~25 ms dispatch charge
    that wall-clock timers include)
  - achieved TFLOP/s per fusion vs MXU peak, achieved GB/s vs HBM peak
  - a serial speed-of-light floor: sum over fusions of
    max(flops/peak_mxu, bytes/peak_hbm) -- TPU cores run fusions serially, so
    this is the tightest floor the current fusion split admits

Writes docs/perf/train_step_profile.json (for --program full, no overrides).

Usage: python tools/perf_step_profile.py [--program full|denoise_grad|fwd]
          [--batch 64] [--frames 896] [--iters 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pathlib
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def parse_op_profile(xplane_files, iters: int):
    """op_profile tree -> flat per-fusion rows (ms, flops, hbm bytes per iter)."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane_files, "op_profile", {})
    obj = json.loads(data)
    prog = obj["byProgramExcludeIdle"]["children"][0]
    rows = []
    for cat in prog.get("children", []):
        for n in cat.get("children", []):
            m = n["metrics"]
            t_ps = m.get("rawTime", 0) / iters
            if not t_ps:
                continue
            rows.append({
                "name": n["name"],
                "category": cat["name"],
                "ms": t_ps / 1e9,
                "flops": m.get("rawFlops", 0) / iters,
                "hbm_bytes": (m.get("rawBytesAccessedArray", [0]) or [0])[0] / iters,
            })
    rows.sort(key=lambda r: -r["ms"])
    return rows, prog["metrics"]["rawTime"] / iters / 1e9


def parse_module_times(xplane_files, iters: int):
    """hlo_stats -> device self-time aggregated by model module.

    The jax op_name metadata carries the flax module path
    (e.g. 'jit(<lambda>)/transpose(jvp(AcousticModule.denoise))/denoiser/
    residual_layers_0/...'); grouping self-time by the jvp/transpose segment
    splits the step into encoder/aux/denoiser x fwd/bwd plus optimizer/other.
    """
    import re

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane_files, "hlo_stats", {})
    obj = json.loads(data)
    cols = [c["id"] for c in obj["cols"]]
    i_name = cols.index("tf_op_name")
    i_self = cols.index("total_self_time")
    groups: dict[str, float] = {}
    for row in obj["rows"]:
        c = row["c"] if isinstance(row, dict) else row
        name = c[i_name]["v"] or ""
        us = float(c[i_self]["v"] or 0.0)
        m = re.search(r"(transpose\()?jvp\(\w+\.(\w+)\)", name)
        if m:
            key = f"{m.group(2)}_{'bwd' if m.group(1) else 'fwd'}"
        elif "adamw" in name or "optimizer" in name:
            key = "optimizer"
        else:
            key = "other"
        groups[key] = groups.get(key, 0.0) + us
    return {k: round(v / iters / 1e3, 1)  # us-total -> ms/iter
            for k, v in sorted(groups.items(), key=lambda kv: -kv[1])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", default="full",
                    choices=["full", "denoise_grad", "fwd", "serve"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--tokens", type=int, default=112)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn
    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step,
    )

    hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp.update(use_energy_embed=False, use_breathiness_embed=False,
              use_key_shift_embed=False, use_speed_embed=False,
              pl_trainer_precision="16-mixed")
    if args.program == "serve":
        # bench.py's exact headline program: 50-step sampling + NSF-HiFiGAN
        hp["sampling_steps"] = 50
    n_mels = hp["audio_num_mel_bins"]
    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=n_mels, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    B, T_MEL, T_TXT = args.batch, args.frames, args.tokens
    rng_np = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng_np.integers(1, 60, (B, T_TXT)).astype(np.int32)),
        "mel2ph": jnp.asarray(np.tile(
            np.repeat(np.arange(1, T_TXT + 1), T_MEL // T_TXT)[None], (B, 1)
        ).astype(np.int32)),
        "f0": jnp.asarray(np.full((B, T_MEL), 220.0, np.float32)),
        "mel": jnp.asarray(
            rng_np.normal(-6.0, 2.0, (B, T_MEL, n_mels)).astype(np.float32)),
    }
    key = jax.random.key(2, impl="rbg")

    if args.program == "serve":
        from diffsinger_tpu.vocoders.nsf_hifigan_model import (
            Generator, NsfHifiGanConfig,
        )

        B_s = int(os.environ.get("DS_BENCH_BATCH", "16"))
        T_TXT_S, T_MEL_S = 128, 1024
        rng_s = np.random.default_rng(0)
        tokens_s = jnp.asarray(
            rng_s.integers(1, 60, (B_s, T_TXT_S)).astype(np.int32))
        mel2ph_s = jnp.asarray(np.tile(
            np.repeat(np.arange(1, T_TXT_S + 1), T_MEL_S // T_TXT_S)[None],
            (B_s, 1)).astype(np.int32))
        f0_s = jnp.asarray(np.full((B_s, T_MEL_S), 220.0, np.float32))
        voc_cfg = NsfHifiGanConfig(
            num_mels=n_mels, sampling_rate=hp["audio_sample_rate"],
            mini_nsf=True, noise_sigma=0.0)
        vocoder = Generator(voc_cfg, dtype=jnp.bfloat16)
        voc_params = vocoder.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 16, n_mels)), jnp.zeros((1, 16)))

        def e2e(params, voc_params, rng, tokens, mel2ph, f0):
            out = model.forward_infer(params, rng, tokens, mel2ph, f0)
            wav = vocoder.apply(voc_params, out.diff_out, f0)
            return jnp.abs(wav).mean()

        f = jax.jit(e2e)
        key_s = jax.random.PRNGKey(2)

        def run(i):
            return f(params, voc_params, jax.random.fold_in(key_s, i),
                     tokens_s, mel2ph_s, f0_s)
    elif args.program == "full":
        loss_fn = make_acoustic_loss_fn(model)
        tx, _ = build_optimizer(hp)
        state = create_train_state(params, tx)
        train_step = make_train_step(loss_fn, tx)
        step = jax.jit(
            lambda s, b, r: train_step(s, b, r), donate_argnums=0)
        holder = {"state": jax.device_put(state)}

        def run(i):
            new_state, metrics = step(
                holder["state"], batch, jax.random.fold_in(key, i))
            holder["state"] = new_state
            return metrics["total_loss"]
    elif args.program == "fwd":
        loss_fn = make_acoustic_loss_fn(model)
        f = jax.jit(lambda p, b, r: loss_fn(p, b, r)[0])

        def run(i):
            return f(params, batch, jax.random.fold_in(key, i))
    else:  # denoise_grad
        cond = jnp.asarray(rng_np.normal(
            0, 1, (B, T_MEL, hp["hidden_size"])).astype(np.float32))

        def dfwd(p, x, t, c):
            out = model.module.apply(p, x, t, c, method="denoise")
            return jnp.abs(out.astype(jnp.float32)).mean()

        def dgrad(p, x, t, c):
            g = jax.grad(dfwd)(p, x, t, c)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.abs(l.astype(jnp.float32)).sum(), g, 0.0)

        x = jnp.asarray(rng_np.normal(0, 1, (B, T_MEL, n_mels)).astype(np.float32))
        t_vec = jnp.asarray(np.full((B,), 500.0, np.float32))
        f = jax.jit(dgrad)

        def run(i):
            return f(params, x, t_vec, cond)

    for i in range(2):  # warmup/compile
        v = float(np.asarray(jax.device_get(run(100 + i))).ravel()[0])
        assert np.isfinite(v)

    tracedir = tempfile.mkdtemp(prefix="xprof_step_")
    jax.profiler.start_trace(tracedir)
    for i in range(args.iters):
        float(np.asarray(jax.device_get(run(i))).ravel()[0])
    jax.profiler.stop_trace()

    files = glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb")
    rows, device_ms = parse_op_profile(files, args.iters)
    module_ms = parse_module_times(files, args.iters)

    peak = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197")) * 1e12
    hbm_bw = float(os.environ.get("DS_BENCH_HBM_GBPS", "819")) * 1e9
    serial_floor_ms = 0.0
    total_flops = 0.0
    total_bytes = 0.0
    for r in rows:
        r["tflops_per_s"] = round(r["flops"] / (r["ms"] / 1e3) / 1e12, 1)
        r["gb_per_s"] = round(r["hbm_bytes"] / (r["ms"] / 1e3) / 1e9, 0)
        floor = max(r["flops"] / peak, r["hbm_bytes"] / hbm_bw) * 1e3
        r["floor_ms"] = round(floor, 2)
        r["sol"] = round(floor / r["ms"], 2) if r["ms"] else None
        r["ms"] = round(r["ms"], 2)
        r["flops"] = round(r["flops"])
        r["hbm_bytes"] = round(r["hbm_bytes"])
        serial_floor_ms += floor
        total_flops += r["flops"]
        total_bytes += r["hbm_bytes"]

    result = {
        "program": args.program,
        "batch": B, "frames": T_MEL,
        "device_ms_per_iter": round(device_ms, 1),
        "measured_hbm_gb": round(total_bytes / 1e9, 1),
        "measured_tflop": round(total_flops / 1e12, 2),
        "serial_sol_floor_ms": round(serial_floor_ms, 1),
        "pct_of_serial_sol": round(serial_floor_ms / device_ms * 100, 1),
        "device_mfu": round(total_flops / (device_ms / 1e3) / peak, 4),
        "note": "serial floor = sum over fusions of max(mxu, hbm) time; "
                "device ms excludes the axon tunnel dispatch charge that "
                "wall-clock timers include",
        "module_ms": module_ms,
        "top_fusions": rows[:20],
    }
    print(f"| device {device_ms:.1f} ms/iter, serial-SoL floor "
          f"{serial_floor_ms:.1f} ms -> {result['pct_of_serial_sol']}% of SoL, "
          f"MFU {result['device_mfu']*100:.1f}%, "
          f"HBM traffic {result['measured_hbm_gb']} GB")
    for r in rows[:12]:
        print(f"| {r['ms']:7.2f} ms {r['tflops_per_s']:7.1f} TF/s "
              f"{r['gb_per_s']:5.0f} GB/s sol={r['sol']:4.2f} {r['name'][:56]}")
    print(f"| per-module device ms/iter: {json.dumps(module_ms)}")
    if args.program in ("full", "serve"):
        out = ROOT / "docs" / "perf" / (
            "train_step_profile.json" if args.program == "full"
            else "serve_profile.json")
        out.write_text(json.dumps(result, indent=2) + "\n")
        print(f"| wrote {out}")
    print(json.dumps({k: v for k, v in result.items() if k != "top_fusions"}))


if __name__ == "__main__":
    main()
