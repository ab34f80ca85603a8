"""Binarization throughput bench (BASELINE.md benchmark config #4).

Two measurements, printed as JSON lines and recorded by hand into
docs/perf/binarize_bench.json:

1. ``pipeline``: full AcousticBinarizer.process() wall time over a synthetic
   12-item / ~96 s corpus with the flagship feature set (mel, ACF pitch,
   comb-mask harmonic split, energy/breathiness/voicing/tension, pitch-shift
   + time-stretch augmentation) -> raw audio seconds per wall second.
2. ``rmvpe`` / ``hnsep_vr``: on-chip forward throughput of the two neural
   feature extractors at binarization shapes (random init — throughput does
   not depend on weights), in audio seconds per second.

The reference publishes no binarization numbers (BASELINE.md); these record
the rebuild's capability on one chip. Run on the axon TPU; CPU works too.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SR = 44100


def make_corpus(tmp: pathlib.Path, n_items: int = 12, seconds: float = 8.0):
    from diffsinger_tpu.utils.infer_utils import save_wav

    raw = tmp / "raw"
    (raw / "wavs").mkdir(parents=True)
    dict_path = tmp / "dict.txt"
    dict_path.write_text("a\ta\nka\tk a\n")
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur,note_slur"]
    rng = np.random.default_rng(0)
    total = 0.0
    for i in range(n_items):
        f0 = 160.0 * 2 ** ((i % 12) / 12)
        dur = seconds
        t = np.arange(int(SR * dur)) / SR
        vib = 1 + 0.01 * np.sin(2 * np.pi * 5.5 * t)
        y = sum(0.3 / h * np.sin(2 * np.pi * h * f0 * vib * t) for h in range(1, 6))
        y += 0.02 * rng.standard_normal(len(t))
        save_wav((0.5 * y).astype(np.float32), raw / "wavs" / f"item{i}.wav", SR)
        n_ph = 8
        d = dur / n_ph
        phs = "AP " + "k a " * 3 + "SP"
        durs = " ".join(f"{d:.4f}" for _ in range(n_ph))
        rows.append(
            f"item{i},{phs},{durs},1 2 2 2 1,"
            f"rest A3 B3 A3 rest,{2*d:.4f} {2*d:.4f} {2*d:.4f} {d:.4f} {d:.4f},0 0 0 0 0"
        )
        total += dur
    (raw / "transcriptions.csv").write_text("\n".join(rows) + "\n")
    return raw, dict_path, total


def bench_pipeline():
    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.data.acoustic_binarizer import AcousticBinarizer

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="ds_binbench_"))
    try:
        raw, dict_path, audio_s = make_corpus(tmp)
        hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
        hp.update(
            binary_data_dir=str(tmp / "binary"),
            dictionary=str(dict_path),
            datasets=[{"raw_data_dir": str(raw), "speaker": "synth",
                       "language": "zh", "test_prefixes": ["item0"]}],
            use_energy_embed=True, use_breathiness_embed=True,
            use_key_shift_embed=True, use_speed_embed=True,
            hnsep="comb", num_spk=8, work_dir="",
        )
        hp.pop("dictionaries", None)
        hp["augmentation_args"] = {
            "random_pitch_shifting": {"enabled": True, "range": [-5.0, 5.0], "scale": 0.5},
            "fixed_pitch_shifting": {"enabled": False, "targets": [-5.0, 5.0], "scale": 0.5},
            "random_time_stretching": {"enabled": True, "range": [0.8, 1.25], "scale": 0.5},
        }
        hp["binarization_args"] = dict(hp["binarization_args"], shuffle=False, num_workers=0)

        t0 = time.perf_counter()
        AcousticBinarizer(hp).process()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "part": "pipeline_acoustic_full", "raw_audio_seconds": audio_s,
            "wall_s": round(dt, 1),
            "audio_seconds_per_sec": round(audio_s / dt, 2),
            "note": "incl. 0.5x pitch-shift + 0.5x time-stretch augmented copies",
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_neural_extractors():
    import jax
    import jax.numpy as jnp

    def timed(fn, args, iters=8):
        v = fn(*args)
        float(np.asarray(v).ravel()[0])
        float(np.asarray(fn(*args)).ravel()[0])  # warmup discard
        t0 = time.perf_counter()
        for _ in range(iters):
            float(np.asarray(fn(*args)).ravel()[0])
        return (time.perf_counter() - t0) / iters

    # RMVPE: 16 kHz mel frontend, hop 160 -> T mel frames cover T*160/16000 s
    from diffsinger_tpu.models.rmvpe import E2E0

    B, T = 4, 1024  # 4 x 10.24 s
    model = E2E0(n_blocks=4, n_gru=1, kernel_size=(2, 2))
    mel = jnp.zeros((B, T, 128), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    fn = jax.jit(lambda p, m: jnp.abs(model.apply(p, m)).mean())
    dt = timed(fn, (params, mel))
    audio_s = B * T * 160 / 16000
    print(json.dumps({"part": "rmvpe_e2e0_forward", "batch": B, "mel_frames": T,
                      "ms": round(dt * 1e3, 1),
                      "audio_seconds_per_sec": round(audio_s / dt, 1)}))

    # hnsep vocal-remover (CascadedNet) at its 44.1 kHz STFT shapes
    from diffsinger_tpu.models.hnsep import CascadedNet

    n_fft, hop = 2048, 441
    Tf = 512  # frames -> 512*441/44100 = 5.12 s per item
    net = CascadedNet(n_fft=n_fft, hop_length=hop, nout=32, nout_lstm=128,
                      is_mono=True)
    # complex only INSIDE jit (as in predict_harmonic): complex64 at the jit
    # boundary is unimplemented for 4-D shapes on the axon TPU runtime
    re = jnp.zeros((B, 1, n_fft // 2 + 1, Tf), jnp.float32)
    im = jnp.zeros_like(re)
    params = jax.jit(
        lambda k, a, b: net.init(k, jax.lax.complex(a, b))
    )(jax.random.PRNGKey(0), re, im)
    fn = jax.jit(
        lambda p, a, b: jnp.abs(net.apply(p, jax.lax.complex(a, b))).mean())
    dt = timed(fn, (params, re, im))
    audio_s = B * Tf * hop / SR
    print(json.dumps({"part": "hnsep_cascaded_forward", "batch": B, "frames": Tf,
                      "ms": round(dt * 1e3, 1),
                      "audio_seconds_per_sec": round(audio_s / dt, 1)}))


def bench_world_split(seconds_list=(5.0, 15.0), iters: int = 3):
    """Host (float64 numpy golden) vs device (jitted float32) full WORLD
    decomposition — the `world`-mode binarization hot spot (VERDICT r4 #3).
    Two clip lengths: dispatch+transfer overheads amortize on longer items."""
    from diffsinger_tpu.dsp import golden_signals as gs
    from diffsinger_tpu.dsp.world import world_harmonic_aperiodic

    hop, fft_size = 512, 2048
    for seconds in seconds_list:
        wave = np.tile(gs.signal_bank()["vibrato"][0],
                       int(np.ceil(seconds / 2)))
        wave = wave[: int(SR * seconds)]
        n = int(np.ceil((len(wave) + 1) / hop))
        f0 = np.full(n, 220.0, np.float32)

        for backend in ("host", "device"):
            it = 1 if backend == "host" and seconds > 5 else iters
            world_harmonic_aperiodic(wave, f0, fs=SR, fft_size=fft_size,
                                     hop=hop, backend=backend)  # warm
            t0 = time.perf_counter()
            for _ in range(it):
                h, a = world_harmonic_aperiodic(
                    wave, f0, fs=SR, fft_size=fft_size, hop=hop,
                    backend=backend)
            dt = (time.perf_counter() - t0) / it
            assert np.isfinite(h).all() and np.isfinite(a).all()
            print(json.dumps({
                "part": f"world_decomposition_{backend}",
                "audio_seconds": seconds, "ms": round(dt * 1e3, 1),
                "audio_seconds_per_sec": round(seconds / dt, 1),
            }))


def main():
    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if "--world-only" in sys.argv:
        bench_world_split()
        return
    if "--pipeline-only" not in sys.argv:
        bench_neural_extractors()
    if "--stages-only" not in sys.argv:
        bench_pipeline()


if __name__ == "__main__":
    main()
