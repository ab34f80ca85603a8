"""Variance->acoustic chain throughput on shipped reference-scale samples
(BASELINE config #2: the full `.ds` score -> wav pipeline).

Runs the real inference drivers (flagship configs, random weights — the
timing does not depend on weight values) on `samples/10_shan_lu.ds`
(score-only, 6 segments, ~43 s): the variance stage auto-completes phoneme
durations + pitch (+ any configured variance curves), the acoustic stage
synthesizes mel and vocodes with the production NSF-HiFiGAN topology.

The chain is run twice; the first run pays every compile (persistent cache
makes repeats cheap), the second is the timed measurement. Writes
docs/perf/chain_bench.json when --record is given.

Usage:
  python tools/tpu_chain_bench.py                # flagship scale (chip)
  python tools/tpu_chain_bench.py --tiny         # CPU smoke of the tool
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from diffsinger_tpu.utils.jax_setup import setup_jax  # noqa: E402

TINY = dict(hidden_size=32, enc_layers=1, sampling_steps=2)
TINY_ACOUSTIC = dict(
    TINY,
    backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                       dropout_rate=0.0, strong_cond=True),
    shallow_diffusion_args=dict(
        train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
        aux_decoder_arch="convnext",
        aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                              dropout_rate=0.1),
        aux_decoder_grad=0.1,
    ),
)
TINY_VARIANCE = dict(
    TINY,
    dur_prediction_args=dict(
        arch="fs2", hidden_size=32, dropout=0.1, num_layers=2, kernel_size=3,
        log_offset=1.0, loss_type="mse",
        lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
    ),
    pitch_prediction_args=dict(
        pitd_norm_min=-8.0, pitd_norm_max=8.0, pitd_clip_min=-12.0,
        pitd_clip_max=12.0, repeat_bins=8, backbone_type="wavenet",
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    ),
)
# production NSF-HiFiGAN topology (hop 512, 128 mel)
VOC_CONFIG = dict(
    num_mels=128, sampling_rate=44100,
    upsample_rates=[8, 8, 2, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4, 4],
    upsample_initial_channel=512, resblock="1",
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)
TINY_VOC_CONFIG = dict(
    num_mels=16, sampling_rate=44100,
    upsample_rates=[4, 4, 2, 2], upsample_kernel_sizes=[8, 8, 4, 4],
    upsample_initial_channel=16, resblock="1",
    resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
    mini_nsf=True,
)


def make_exp(root: pathlib.Path, base_cfg: str, name: str, overrides: dict,
             category: str):
    import yaml
    import jax

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    work = root / "checkpoints" / name
    work.mkdir(parents=True, exist_ok=True)
    hp = load_config(base_cfg, save_snapshot=False)
    hp.update(overrides)
    hp["work_dir"] = str(work)
    hp["dictionary"] = str(ROOT / "dictionaries" / "opencpop-extension.txt")
    hp.pop("dictionaries", None)
    hp["infer"] = True
    with open(work / "config.yaml", "w") as f:
        yaml.safe_dump(dict(hp), f, allow_unicode=True)
    shutil.copy(hp["dictionary"], work / "dictionary.txt")

    vocab = len(load_phoneme_dictionary(hp))
    if category == "acoustic":
        from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

        model = DiffSingerAcoustic(hp, vocab_size=vocab,
                                   out_dims=hp["audio_num_mel_bins"])
    else:
        from diffsinger_tpu.models.toplevel import DiffSingerVariance

        model = DiffSingerVariance(hp, vocab_size=vocab)
    save_checkpoint(checkpoint_path(str(work), 10), model.init(jax.random.PRNGKey(0)),
                    category=category, global_step=10)
    return hp


def run_chain(var_infer, ac_infer, segments, out_dir: pathlib.Path, steps):
    import json as _json

    t0 = time.perf_counter()
    var_infer.run_inference([dict(s) for s in segments], out_dir=out_dir,
                            title="chain_stage1", seed=3, steps=steps)
    t_var = time.perf_counter() - t0
    with open(out_dir / "chain_stage1.ds", encoding="utf8") as f:
        chained = _json.load(f)
    t0 = time.perf_counter()
    ac_infer.run_inference(chained, out_dir=out_dir, title="chain_stage2",
                           seed=4, steps=steps)
    t_ac = time.perf_counter() - t0
    return t_var, t_ac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models + tiny sample: CPU smoke of the tool")
    ap.add_argument("--sample", default=None, help=".ds path override")
    ap.add_argument("--steps", type=int, default=None,
                    help="sampler steps override for both stages")
    ap.add_argument("--batch", type=int, default=0,
                    help="acoustic stage via AcousticServer with this max "
                         "batch size (bucket-grouped segment batching)")
    ap.add_argument("--var_batch", type=int, default=0,
                    help="variance stage via VarianceServer with this max "
                         "batch size (bucket-grouped segment batching)")
    ap.add_argument("--precision", default=None, choices=["f32", "bf16"],
                    help="infer_precision for both stages (default: bf16 at "
                         "flagship scale — the production serving posture — "
                         "f32 under --tiny)")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed repetitions (reports median; best also recorded)")
    ap.add_argument("--record", action="store_true",
                    help="write docs/perf/chain_bench.json")
    args = ap.parse_args()
    precision = args.precision or ("f32" if args.tiny else "bf16")

    setup_jax()
    import warnings

    import jax

    if args.tiny:
        # force the CPU backend in-process: on axon hosts the platform env
        # var is consumed before user code runs, so only config.update works
        jax.config.update("jax_platforms", "cpu")

    sample = pathlib.Path(args.sample) if args.sample else (
        ROOT / "samples" / ("01_score_only.ds" if args.tiny else "10_shan_lu.ds"))
    with open(sample, encoding="utf8") as f:
        segments = json.load(f)
    audio_s = sum(sum(map(float, s["note_dur"].split())) for s in segments)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="chain_bench_"))
    voc_cfg = TINY_VOC_CONFIG if args.tiny else VOC_CONFIG
    (tmp / "config.json").write_text(json.dumps(voc_cfg))
    ac_over = dict(TINY_ACOUSTIC) if args.tiny else {}
    if args.tiny:
        ac_over["audio_num_mel_bins"] = 16
    ac_over["vocoder_ckpt"] = str(tmp / "missing_vocoder.ckpt")
    ac_over["infer_precision"] = precision
    hp_ac = make_exp(tmp, str(ROOT / "configs" / "acoustic.yaml"),
                     "chain_ac", ac_over, "acoustic")
    var_over = dict(TINY_VARIANCE) if args.tiny else {}
    var_over["infer_precision"] = precision
    hp_var = make_exp(tmp, str(ROOT / "configs" / "variance.yaml"),
                      "chain_var", var_over, "variance")

    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer
    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer

    if args.var_batch:
        from diffsinger_tpu.inference.serving import VarianceServer

        var_infer = VarianceServer(hp_var, max_batch_size=args.var_batch,
                                   predictions=set())  # auto-complete
    else:
        var_infer = DiffSingerVarianceInfer(hp_var, predictions=set())  # auto-complete
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random vocoder weights
        if args.batch:
            from diffsinger_tpu.inference.serving import AcousticServer

            ac_infer = AcousticServer(hp_ac, max_batch_size=args.batch)
        else:
            ac_infer = DiffSingerAcousticInfer(hp_ac)

    out = tmp / "out"
    print(f"| chain bench: {sample.name}, {len(segments)} segments, "
          f"{audio_s:.1f} s audio, device={jax.devices()[0].platform}")
    w_var, w_ac = run_chain(var_infer, ac_infer, segments, out, args.steps)
    print(f"| warmup (compiles): variance {w_var:.1f}s acoustic {w_ac:.1f}s")
    walls = []
    for _ in range(max(1, args.runs)):
        t_var, t_ac = run_chain(var_infer, ac_infer, segments, out, args.steps)
        walls.append((t_var + t_ac, t_var, t_ac))
        print(f"| timed run: variance {t_var:.2f}s acoustic {t_ac:.2f}s "
              f"-> {audio_s / (t_var + t_ac):.1f}x")
    walls.sort()
    wall, t_var, t_ac = walls[len(walls) // 2]  # median by total wall
    frames = audio_s * hp_ac["audio_sample_rate"] / hp_ac["hop_size"]

    # one profiled pass: the per-chunk 1-element probe separates device
    # compute from the tunnel fetch, giving the wire-floor attribution
    # (the axon tunnel's bulk-fetch bandwidth fluctuates 10-20 MB/s; on a
    # local TPU host the same fetch is PCIe-speed and the e2e RTF converges
    # to the device-side number)
    wire = None
    if args.batch:
        import os as _os

        _os.environ["DS_SERVING_PROFILE"] = "1"
        p_var, p_ac = run_chain(var_infer, ac_infer, segments, out, args.steps)
        del _os.environ["DS_SERVING_PROFILE"]
        st = getattr(ac_infer, "last_stats", None) or []
        if st:
            compute_s = sum(c["compute_s"] or 0.0 for c in st)
            fetch_s = sum(c["fetch_s"] for c in st)
            mb = sum(c["wire_mb"] for c in st)
            dev_wall = t_var + compute_s  # variance wall + acoustic device
            wire = {
                "acoustic_device_s": round(compute_s, 3),
                "acoustic_fetch_s": round(fetch_s, 3),
                "wire_mb": round(mb, 1),
                "wire_mbps": round(mb / fetch_s, 1) if fetch_s else None,
                "device_side_rtf": round(audio_s / dev_wall, 1),
                "note": "device_side_rtf = audio_s / (variance wall + "
                        "acoustic device compute); the gap to chain_e2e_rtf "
                        "is the tunnel bulk-fetch at wire_mbps",
            }
            print(f"| wire attribution: acoustic device {compute_s:.2f}s, "
                  f"fetch {fetch_s:.2f}s ({mb:.1f} MB -> "
                  f"{mb/fetch_s if fetch_s else 0:.1f} MB/s), "
                  f"device-side RTF {audio_s/dev_wall:.1f}x")
    result = {
        "metric": "chain_e2e_rtf",
        "value": round(audio_s / wall, 2),
        "unit": "x realtime (.ds score -> wav, variance+acoustic+vocoder)",
        "sample": sample.name,
        "segments": len(segments),
        "audio_seconds": round(audio_s, 1),
        "wall_s": {"variance": round(t_var, 2), "acoustic_plus_vocoder": round(t_ac, 2)},
        "mel_frames_per_s": round(frames / wall, 1),
        "steps": args.steps or "config defaults",
        "acoustic_batch": args.batch or "sequential",
        "rtf_best": round(audio_s / walls[0][0], 2),
        "timed_runs": len(walls),
        "variance_batch": args.var_batch or "sequential",
        "infer_precision": precision,
        "tiny": bool(args.tiny),
        "device": jax.devices()[0].platform,
        "rtf_runs": [round(audio_s / w[0], 1) for w in walls],
    }
    if wire:
        result["wire_attribution"] = wire
    print(json.dumps(result))
    if args.record:
        rec = ROOT / "docs" / "perf" / "chain_bench.json"
        rec.write_text(json.dumps(result, indent=2) + "\n")
        print(f"| wrote {rec}")


if __name__ == "__main__":
    main()
