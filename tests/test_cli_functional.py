"""Functional CLI tests: drop_spk.py checkpoint surgery and vocode.py
mel->wav, run end to end via subprocess (reference scripts/drop_spk.py,
scripts/vocode.py behavior)."""

import pathlib
import subprocess
import sys

import numpy as np
import yaml

import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(*argv, extra_env=None):
    env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(REPO), "HOME": "/root"}
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, *argv],
        capture_output=True, text=True, timeout=600,
        env=env, cwd=str(REPO),
    )


def test_drop_spk_modes(tmp_path):
    from flax import serialization

    from diffsinger_tpu.utils.ckpt import load_checkpoint

    rng = np.random.default_rng(0)
    table = rng.standard_normal((4, 8)).astype(np.float32)
    blob = {
        "category": "acoustic", "global_step": 1,
        "params": {"fs2": {"spk_embed": {"embedding": table.copy()}}},
    }
    src = tmp_path / "in.dsckpt"
    src.write_bytes(serialization.msgpack_serialize(blob))

    # zeros mode
    out = tmp_path / "zeros.dsckpt"
    r = _run("scripts/drop_spk.py", str(src), str(out), "--spk", "1", "--mode", "zeros")
    assert r.returncode == 0, r.stderr
    edited = np.asarray(load_checkpoint(out)["params"]["fs2"]["spk_embed"]["embedding"])
    assert (edited[1] == 0).all()
    np.testing.assert_array_equal(edited[0], table[0])

    # mean mode: row 2 becomes the mean of the others
    out = tmp_path / "mean.dsckpt"
    r = _run("scripts/drop_spk.py", str(src), str(out), "--spk", "2", "--mode", "mean")
    assert r.returncode == 0, r.stderr
    edited = np.asarray(load_checkpoint(out)["params"]["fs2"]["spk_embed"]["embedding"])
    np.testing.assert_allclose(edited[2], table[[0, 1, 3]].mean(axis=0), atol=1e-6)

    # cyclic mode: row copied from another speaker
    out = tmp_path / "cyc.dsckpt"
    r = _run("scripts/drop_spk.py", str(src), str(out), "--spk", "3", "--mode", "cyclic")
    assert r.returncode == 0, r.stderr
    edited = np.asarray(load_checkpoint(out)["params"]["fs2"]["spk_embed"]["embedding"])
    np.testing.assert_array_equal(edited[3], table[0])


def test_vocode_cli_mel_to_wav(tmp_path):
    import wave

    # config pointing at a missing vocoder ckpt -> random-weight generator
    cfg = {
        "audio_sample_rate": 44100, "hop_size": 512, "win_size": 2048,
        "fft_size": 2048, "audio_num_mel_bins": 16, "fmin": 40, "fmax": 16000,
        "mel_base": "e", "vocoder": "NsfHifiGAN",
        "vocoder_ckpt": str(tmp_path / "missing.ckpt"),
    }
    # a config.json beside the "checkpoint" describes a tiny generator
    voc_config = {
        "num_mels": 16, "sampling_rate": 44100, "hop_size": 512, "win_size": 2048,
        "n_fft": 2048, "fmin": 40, "fmax": 16000, "audio_sample_rate": 44100,
        "upsample_rates": [8, 8, 8], "upsample_kernel_sizes": [16, 16, 16],
        "upsample_initial_channel": 32,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
    }
    import json
    (tmp_path / "config.json").write_text(json.dumps(voc_config))
    cfg_path = tmp_path / "voc.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    t = 64
    mel = np.random.default_rng(1).standard_normal((t, 16)).astype(np.float32) - 6
    f0 = np.full((t,), 220.0, np.float32)
    mel_path = tmp_path / "song.mel.npz"
    np.savez(mel_path, num_segments=1, mel_0=mel, f0_0=f0, offset_0=0.25)

    r = _run("scripts/vocode.py", str(mel_path), "--config", str(cfg_path),
             "--out", str(tmp_path / "out"))
    assert r.returncode == 0, r.stderr
    with wave.open(str(tmp_path / "out" / "song.wav")) as f:
        assert f.getframerate() == 44100
        # 0.25 s silence offset + t * hop samples
        assert f.getnframes() == round(0.25 * 44100) + t * 512

    # reference-format .mel.pt (torch.load list of {'mel','f0','offset'} with
    # batch-dim tensors, reference scripts/vocode.py:58-60) vocal-izes too —
    # drop-in migration for mels saved by the PyTorch framework
    import torch

    pt_path = tmp_path / "song_ref.mel.pt"
    torch.save(
        [{"mel": torch.from_numpy(mel)[None], "f0": torch.from_numpy(f0)[None],
          "offset": 0.25}],
        pt_path,
    )
    r = _run("scripts/vocode.py", str(pt_path), "--config", str(cfg_path),
             "--out", str(tmp_path / "out_pt"))
    assert r.returncode == 0, r.stderr
    with wave.open(str(tmp_path / "out_pt" / "song_ref.wav")) as f:
        assert f.getnframes() == round(0.25 * 44100) + t * 512


def test_cli_pipeline_binarize_train(tmp_path):
    """The user-facing pipeline through the actual CLI entry points:
    binarize.py -> train.py (2 steps + resume-capable checkpoint), using a
    config that chains onto the shipped configs/acoustic.yaml."""
    from tests.test_binarize import _make_corpus

    raw, dict_path = _make_corpus(tmp_path, n_items=3)
    cfg = {
        "base_config": ["configs/acoustic.yaml"],
        "dictionary": str(dict_path),
        "datasets": [{
            "raw_data_dir": str(raw), "speaker": "synth", "language": "zh",
            "test_prefixes": ["item0"],
        }],
        "binary_data_dir": str(tmp_path / "binary"),
        "binarization_args": {"shuffle": False, "num_workers": 0},
        "hnsep": "comb",
        "hidden_size": 32, "enc_layers": 1, "audio_num_mel_bins": 16,
        "backbone_args": {"num_channels": 32, "num_layers": 1, "kernel_size": 7,
                          "dropout_rate": 0.0, "strong_cond": True},
        "shallow_diffusion_args": {
            "train_aux_decoder": True, "train_diffusion": True, "val_gt_start": False,
            "aux_decoder_arch": "convnext",
            "aux_decoder_args": {"num_channels": 16, "num_layers": 1,
                                 "kernel_size": 7, "dropout_rate": 0.1},
            "aux_decoder_grad": 0.1,
        },
        "max_batch_frames": 4000, "max_batch_size": 8, "max_val_batch_size": 1,
        "log_interval": 1, "val_check_interval": 100, "num_valid_plots": 0,
        "val_with_vocoder": False,
        "vocoder_ckpt": str(tmp_path / "missing_vocoder.ckpt"),
    }
    cfg_path = tmp_path / "exp.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    r = _run("scripts/binarize.py", "--config", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "binary" / "train.data").exists()

    ckpt_root = tmp_path / "ckpts"
    r = _run("scripts/train.py", "--config", str(cfg_path), "--exp_name", "cli_exp",
             "--ckpt_root", str(ckpt_root), "--max_steps", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    work_dir = ckpt_root / "cli_exp"
    assert (work_dir / "config.yaml").exists()  # work-dir snapshot
    from diffsinger_tpu.utils.ckpt import list_checkpoints

    ckpts = list_checkpoints(work_dir)
    assert ckpts and ckpts[-1][0] == 2, ckpts


def test_val_nsf_hifigan_copysynth(tmp_path):
    """wav -> mel+f0 -> vocoder -> wav via the actual CLI (random vocoder
    weights: only the pipeline, shapes, and output length are checked)."""
    import json
    import wave

    from diffsinger_tpu.utils.infer_utils import save_wav

    sr, hop = 44100, 512
    t = np.arange(int(sr * 0.4)) / sr
    y = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav_path = tmp_path / "tone.wav"
    save_wav(y, wav_path, sr)

    voc_config = {
        "num_mels": 16, "sampling_rate": sr, "hop_size": hop, "win_size": 2048,
        "n_fft": 2048, "fmin": 40, "fmax": 16000, "audio_sample_rate": sr,
        "upsample_rates": [8, 8, 8], "upsample_kernel_sizes": [16, 16, 16],
        "upsample_initial_channel": 32,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
    }
    (tmp_path / "config.json").write_text(json.dumps(voc_config))
    cfg = {
        "audio_sample_rate": sr, "hop_size": hop, "win_size": 2048,
        "fft_size": 2048, "audio_num_mel_bins": 16, "fmin": 40, "fmax": 16000,
        "mel_base": "e", "pe": "parselmouth", "f0_min": 65, "f0_max": 1100,
        "vocoder": "NsfHifiGAN", "vocoder_ckpt": str(tmp_path / "missing.ckpt"),
    }
    cfg_path = tmp_path / "voc.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    r = _run("scripts/val_nsf_hifigan.py", str(wav_path), "--config", str(cfg_path),
             "--out", str(tmp_path / "out"))
    assert r.returncode == 0, r.stderr[-2000:]
    with wave.open(str(tmp_path / "out" / "tone_copysynth.wav")) as f:
        assert f.getframerate() == sr
        n = f.getnframes()
        # whole mel frames, within one hop of the input length
        assert n % hop == 0
        assert abs(n - len(y)) < 2 * hop


def test_infer_cli_acoustic_mel(tmp_path):
    """scripts/infer.py acoustic --mel end to end via subprocess, with the
    experiment resolved from DS_CKPT_ROOT (checkpoint-root override)."""
    import jax

    from tests.test_shipped_assets import _make_exp, REPO as REPO_SA
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    hp = _make_exp(
        tmp_path, REPO_SA / "configs" / "acoustic.yaml",
        dict(
            hidden_size=32, enc_layers=1, sampling_steps=2, audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "cli_infer_exp",
    )
    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    out_dir = tmp_path / "out"
    r = _run("scripts/infer.py", "acoustic", str(REPO_SA / "samples" / "00_xiao_xing_xing.ds"),
             "--exp", "cli_infer",  # prefix match exercises find_exp
             "--out", str(out_dir), "--title", "cli", "--steps", "2", "--mel",
             "--seed", "3",
             extra_env={"DS_CKPT_ROOT": str(tmp_path / "checkpoints")})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "match ckpt by prefix: cli_infer_exp" in r.stdout
    data = np.load(out_dir / "cli.mel.npz")
    assert int(data["num_segments"]) == 2
    assert data["mel_0"].shape[1] == 16


def test_infer_cli_variance_batched(tmp_path):
    """scripts/infer.py variance --batch_size: the batched VarianceServer
    path via subprocess (auto-completion of ph_dur/f0/energy on a stripped
    multi-segment score)."""
    import json

    import jax

    from tests.test_shipped_assets import _make_exp, REPO as REPO_SA
    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    hp = _make_exp(
        tmp_path, REPO_SA / "configs" / "variance.yaml",
        dict(
            hidden_size=32, enc_layers=1, sampling_steps=2,
            predict_energy=True,
            dur_prediction_args=dict(
                arch="fs2", hidden_size=32, dropout=0.1, num_layers=2,
                kernel_size=3, log_offset=1.0, loss_type="mse",
                lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
            ),
            pitch_prediction_args=dict(
                pitd_norm_min=-8.0, pitd_norm_max=8.0, pitd_clip_min=-12.0,
                pitd_clip_max=12.0, repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16,
                                   dilation_cycle_length=2),
            ),
            variances_prediction_args=dict(
                total_repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16,
                                   dilation_cycle_length=2),
            ),
        ),
        "cli_var_exp",
    )
    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    save_checkpoint(checkpoint_path(hp["work_dir"], 100),
                    model.init(jax.random.PRNGKey(0)),
                    category="variance", global_step=100)

    with open(REPO_SA / "samples" / "00_xiao_xing_xing.ds", encoding="utf8") as f:
        segs = json.load(f)
    assert len(segs) >= 2
    for s in segs:  # force dur+pitch+energy auto-completion
        s.pop("ph_dur", None)
        s.pop("f0_seq", None)
        s.pop("f0_timestep", None)
    score = tmp_path / "stripped.ds"
    score.write_text(json.dumps(segs, ensure_ascii=False))

    out_dir = tmp_path / "out"
    r = _run("scripts/infer.py", "variance", str(score),
             "--exp", "cli_var_exp", "--out", str(out_dir), "--title", "cliv",
             "--steps", "2", "--seed", "3", "--batch_size", "4",
             extra_env={"DS_CKPT_ROOT": str(tmp_path / "checkpoints")})
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_dir / "cliv.ds", encoding="utf8") as f:
        done = json.load(f)
    assert len(done) == len(segs)
    for seg in done:
        assert "ph_dur" in seg and "f0_seq" in seg and "energy" in seg
        f0 = np.asarray(seg["f0_seq"].split(), np.float32)
        assert np.isfinite(f0).all() and (f0 > 0).all()
