"""Realistic-batch training throughput on the real chip (BASELINE config #5).

The smoke (tpu_train_smoke.py) validates semantics at tiny batches; this tool
measures optimizer-steps/s and mel-frames/s at a production frame budget
(max_batch_frames 50k, flagship acoustic config, bf16) on a synthetic corpus
large enough to fill those batches.

Writes docs/perf/train_bench.json.

Usage: python tools/tpu_train_bench.py [--steps 60] [--frames 50000]
"""

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
SR = 44100
HOP = 512


def make_corpus(raw: pathlib.Path, dict_path: pathlib.Path, n_items: int, seconds: float):
    import numpy as np

    sys.path.insert(0, str(ROOT))
    from diffsinger_tpu.utils.infer_utils import save_wav

    (raw / "wavs").mkdir(parents=True, exist_ok=True)
    dict_path.write_text("a\ta\nka\tk a\n")
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur,note_slur"]
    rng = np.random.default_rng(0)
    for i in range(n_items):
        f0 = 140.0 + 7 * (i % 20)
        t = np.arange(int(SR * seconds)) / SR
        vib = 1.0 + 0.003 * np.sin(2 * np.pi * 5.5 * t)
        y = 0.25 * np.sin(2 * np.pi * f0 * np.cumsum(vib) / SR)
        y += 0.12 * np.sin(2 * np.pi * 2 * f0 * t) + 0.01 * rng.standard_normal(len(t))
        save_wav(y.astype(np.float32), raw / "wavs" / f"item{i}.wav", SR)
        # 8 phonemes: AP + 3x(k a) + SP; words are (1, 2, 2, 2, 1) phonemes
        # so note durations (d, 2d, 2d, 2d, d) sum exactly to the audio length
        n_words = 5
        d = seconds / 8
        ph = "AP " + " ".join(["k a"] * 3) + " SP"
        dur = " ".join([f"{d:.4f}"] * 8)
        num = "1 " + " ".join(["2"] * 3) + " 1"
        notes = "rest " + " ".join(["A3"] * 3) + " rest"
        ndur = " ".join(f"{w * d:.4f}" for w in (1, 2, 2, 2, 1))
        slur = " ".join(["0"] * n_words)
        rows.append(f"item{i},{ph},{dur},{num},{notes},{ndur},{slur}")
    (raw / "transcriptions.csv").write_text("\n".join(rows) + "\n")


def write_config(work, raw, dict_path, frames, wire="float32", task="acoustic"):
    cfg = work / "config_bench.yaml"
    cfg.write_text(
        f"""\
train_wire_dtype: {wire}
base_config:
  - {ROOT}/configs/{task}.yaml
dictionaries:
  zh: {dict_path}
datasets:
  - raw_data_dir: {raw}
    speaker: bench
    spk_id: 0
    language: zh
    test_prefixes: [item0]
binary_data_dir: {work}/binary
binarization_args:
  num_workers: 0
  shuffle: false
pe: parselmouth
use_energy_embed: false
use_breathiness_embed: false
use_key_shift_embed: false
use_speed_embed: false
augmentation_args:
  random_pitch_shifting: {{enabled: false}}
  fixed_pitch_shifting: {{enabled: false}}
  random_time_stretching: {{enabled: false}}
max_batch_frames: {frames}
max_batch_size: 64
log_interval: 5
val_check_interval: 10000
num_sanity_val_steps: 0
num_valid_plots: 0
pl_trainer_precision: 16-mixed
"""
    )
    return cfg


def run(cmd, log_path, env=None):
    print(f"+ {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run([str(c) for c in cmd], stdout=f, stderr=subprocess.STDOUT,
                           env=env, cwd=ROOT)
    dt = time.time() - t0
    text = pathlib.Path(log_path).read_text()
    if p.returncode != 0:
        print(text[-4000:])
        raise SystemExit(f"command failed rc={p.returncode}: {cmd}")
    return text, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["acoustic", "variance"], default="acoustic")
    ap.add_argument("--steps", type=int, default=60)
    # production budgets: acoustic.yaml max_batch_frames=50k, variance.yaml=80k
    ap.add_argument("--frames", type=int, default=None)
    # acoustic: 58 items x ~862 frames -> 57 train items = exactly ONE batch
    # that FILLS the 50k-frame budget (one shape bucket, clean steady-state
    # numbers); a smaller corpus caps batches below budget and understates
    # both frames/s and MFU. variance: the 64-row max_batch_size cap binds
    # first (64 x ~862 = ~55k of the 80k budget), so 65 items -> one
    # cap-bound batch.
    ap.add_argument("--items", type=int, default=None)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--wire", type=str, default="float32",
                    help="train_wire_dtype (float16 halves the host->device "
                         "batch transfer; see docs/perf/train_parts.json)")
    ap.add_argument("--work", type=str, default=None)
    args = ap.parse_args()
    if args.frames is None:
        args.frames = 50000 if args.task == "acoustic" else 80000
    if args.items is None:
        args.items = 58 if args.task == "acoustic" else 65
    if args.work is None:
        args.work = str(ROOT / (".trainbench" if args.task == "acoustic"
                                else ".trainbench_var"))

    work = pathlib.Path(args.work)
    if (work / "ckpt").exists():
        import shutil

        shutil.rmtree(work / "ckpt")
    work.mkdir(parents=True, exist_ok=True)
    raw = work / "raw"
    dict_path = work / "dict.txt"
    if not (work / "binary" / "train.data").exists():
        make_corpus(raw, dict_path, args.items, args.seconds)
    cfg = write_config(work, raw, dict_path, args.frames, wire=args.wire,
                       task=args.task)

    env_cpu = dict(os.environ, JAX_PLATFORMS="cpu")
    if not (work / "binary" / "train.data").exists():
        run([sys.executable, ROOT / "scripts" / "binarize.py", "--config", cfg],
            work / "binarize.log", env=env_cpu)

    log, dt = run(
        [sys.executable, ROOT / "scripts" / "train.py", "--config", cfg,
         "--exp_name", "tpu_bench", "--ckpt_root", work / "ckpt",
         "--max_steps", str(args.steps)],
        work / "train.log",
        env=dict(os.environ, DS_LOG_FLOPS="1"),
    )

    # parse "(X.XX it/s)" windows from log_interval lines
    windows = [float(m) for m in re.findall(r"\(([0-9.]+) it/s\)", log)]
    post = windows[1:] or windows  # drop the compile-dominated first window
    steady = round(sum(post) / len(post), 3) if windows else None
    best = round(max(post), 3) if windows else None
    # DS_LOG_FLOPS lines: one per shape bucket (XLA cost analysis of the
    # compiled train step; no scan in the training graph, so no undercount)
    flops_lines = re.findall(
        r"train_step_flops batch=(\d+) frames=(\d+) flops=([0-9.e+]+)", log)
    step_flops = [
        {"batch": int(b), "frames": int(f), "flops": float(fl)}
        for b, f, fl in flops_lines
    ]
    peak_tflops = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197"))
    mfu = None
    if step_flops and steady:
        # uniform synthetic corpus -> typically one bucket; use the largest
        mfu = round(max(s["flops"] for s in step_flops) * steady
                    / (peak_tflops * 1e12), 4)
    # ACTUAL content frames/s: steady steps/s x (corpus frames / batches per
    # epoch), from the binarized metadata + the real sampler — the budget
    # upper bound overstates throughput whenever batches don't fill it
    frames_actual = None
    try:
        sys.path.insert(0, str(ROOT))
        from diffsinger_tpu.config import load_config
        from diffsinger_tpu.data.dataset import AcousticDataset, VarianceDataset
        from diffsinger_tpu.data.batch_sampler import DsBatchSampler

        ds_cls = AcousticDataset if args.task == "acoustic" else VarianceDataset
        hp = load_config(str(cfg), save_snapshot=False)
        ds = ds_cls(hp["binary_data_dir"], hp, "train")
        sampler = DsBatchSampler(
            ds.sizes, max_batch_frames=args.frames,
            max_batch_size=hp.get("max_batch_size", 64), num_replicas=1,
            rank=0, frame_count_grid=hp.get("sampler_frame_count_grid", 6),
            shuffle_sample=True, shuffle_batch=True, seed=hp.get("seed") or 0)
        sampler.set_epoch(0)
        n_batches = sum(1 for b in sampler if b)
        if steady and n_batches:
            frames_actual = round(
                float(sum(int(s) for s in ds.sizes)) / n_batches * steady, 1)
    except Exception:
        pass
    import jax

    result = {
        "task": args.task,
        "device": jax.devices()[0].platform,
        "precision": "16-mixed (bf16 compute / fp32 params)",
        "config": str(cfg),
        "max_batch_frames": args.frames,
        "steps": args.steps,
        "wall_s": round(dt, 1),
        "steps_per_s_windows": windows,
        "steps_per_s_steady": steady,       # mean of post-compile windows
        "steps_per_s_best_window": best,
        "mel_frames_per_s_upper_bound": (
            round(args.frames * steady, 1) if steady else None
        ),
        "mel_frames_per_s_actual": frames_actual,
        "train_step_flops": step_flops,
        "mfu": mfu,  # whole-loop MFU (includes host collate + transfer time;
        # device-only MFU is decomposed in docs/perf/train_parts.json)
        "wire_dtype": args.wire,
        # mirrors the loop's resolution (base_task.py): env override, else
        # the config default (base.yaml train_prefetch_depth: 1)
        "prefetch_depth": int(os.environ.get("DS_PREFETCH_DEPTH", 1)),
        "peak_tflops_assumed": peak_tflops,
    }
    out = ROOT / "docs" / "perf" / (
        "train_bench.json" if args.task == "acoustic" else "train_bench_variance.json")
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
