"""End-to-end smoke tests: .ds -> wav through the full acoustic pipeline and
.ds -> .ds through the variance pipeline, with tiny random-weight models
(SURVEY.md §4 implication: '.ds->wav smoke test on samples/*.ds')."""

import json
import pathlib
import shutil
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

import jax

REPO = pathlib.Path(__file__).resolve().parents[1]
SAMPLE = str(REPO / "samples" / "00_xiao_xing_xing.ds")
DICT = str(REPO / "dictionaries" / "opencpop-extension.txt")


def _make_exp(tmp_path, base_cfg: str, overrides: dict, name: str):
    """Create a work dir with a config snapshot + dictionary, reference-style."""
    work_dir = tmp_path / "checkpoints" / name
    work_dir.mkdir(parents=True)
    from diffsinger_tpu.config import load_config

    hp = load_config(base_cfg, save_snapshot=False)
    hp.update(overrides)
    hp["work_dir"] = str(work_dir)
    hp["dictionary"] = DICT
    hp.pop("dictionaries", None)
    with open(work_dir / "config.yaml", "w") as f:
        yaml.safe_dump(dict(hp), f, allow_unicode=True)
    shutil.copy(DICT, work_dir / "dictionary.txt")
    return hp


TINY_COMMON = dict(
    hidden_size=32, enc_layers=1, sampling_steps=2,
)


@pytest.fixture(scope="module")
def ds_segments():
    with open(SAMPLE, encoding="utf-8") as f:
        segments = json.load(f)
    return segments[:2]  # keep the smoke test small


def test_acoustic_ds_to_wav(tmp_path, ds_segments):
    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            shallow_diffusion_args=dict(
                train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
                aux_decoder_arch="convnext",
                aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                                      dropout_rate=0.1),
                aux_decoder_grad=0.1,
            ),
            vocoder_ckpt=str(tmp_path / "nonexistent_vocoder.ckpt"),
        ),
        "tiny_acoustic",
    )
    hp["infer"] = True

    # save a random checkpoint so the loader path is exercised
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(
        checkpoint_path(hp["work_dir"], 1000), params, category="acoustic", global_step=1000
    )

    with pytest.warns(UserWarning):  # random vocoder weights
        infer_ins = DiffSingerAcousticInfer(hp)
    out_dir = tmp_path / "out"
    infer_ins.run_inference(ds_segments, out_dir=out_dir, title="smoke", seed=42, steps=2)

    wav_path = out_dir / "smoke.wav"
    assert wav_path.exists()
    with wave.open(str(wav_path)) as f:
        assert f.getframerate() == hp["audio_sample_rate"]
        n = f.getnframes()
    # length covers last segment's offset + duration
    last = ds_segments[-1]
    expected_min = last["offset"] * hp["audio_sample_rate"]
    assert n > expected_min


def test_acoustic_gender_velocity_mapping(tmp_path, ds_segments):
    """gender -> key_shift and velocity -> speed curves in preprocess_input
    (reference inference/ds_acoustic.py:137-177): static gender scales by the
    augmentation range asymmetrically, dynamic gender resamples + clips, and
    velocity clips into the stretching range."""
    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

    hp = _make_exp(
        tmp_path, str(REPO / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            use_key_shift_embed=True,
            use_speed_embed=True,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            augmentation_args={
                "random_pitch_shifting": {"enabled": False, "range": [-5.0, 5.0],
                                          "scale": 0.5},
                "fixed_pitch_shifting": {"enabled": False, "targets": [-5.0, 5.0],
                                         "scale": 0.5},
                "random_time_stretching": {"enabled": False, "range": [0.5, 2.0],
                                           "scale": 0.5},
            },
            use_shallow_diffusion=False,
            vocoder_ckpt=str(tmp_path / "nonexistent_vocoder.ckpt"),
        ),
        "tiny_acoustic_gender",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp["work_dir"], 10),
                    model.init(jax.random.PRNGKey(0)),
                    category="acoustic", global_step=10)
    with pytest.warns(UserWarning):
        infer_ins = DiffSingerAcousticInfer(hp)

    param = dict(ds_segments[0])
    # static gender: +0.4 -> 0.4*shift_max, -0.4 -> -0.4*|shift_min|
    param["gender"] = 0.4
    batch = infer_ins.preprocess_input(param)
    np.testing.assert_allclose(np.asarray(batch["key_shift"]), 0.4 * 5.0, rtol=1e-6)
    param["gender"] = -0.4
    batch = infer_ins.preprocess_input(param)
    np.testing.assert_allclose(np.asarray(batch["key_shift"]), -0.4 * 5.0, rtol=1e-6)
    # dynamic gender: curve resampled to frames and clipped to the range
    param["gender"] = "0.0 1.0 -2.0"
    param["gender_timestep"] = "0.5"
    batch = infer_ins.preprocess_input(param)
    ks = np.asarray(batch["key_shift"])[0]
    assert ks.min() >= -5.0 and ks.max() <= 5.0
    assert ks.max() > 0 and ks.min() < 0
    # velocity: clipped into the stretching range
    del param["gender"]
    param["velocity"] = "0.1 1.0 10.0"
    param["velocity_timestep"] = "0.5"
    batch = infer_ins.preprocess_input(param)
    sp = np.asarray(batch["speed"])[0]
    assert sp.min() == pytest.approx(0.5) and sp.max() == pytest.approx(2.0)


def test_acoustic_category_check(tmp_path):
    from diffsinger_tpu.utils.ckpt import checkpoint_path, load_checkpoint, save_checkpoint

    p = checkpoint_path(tmp_path, 10)
    save_checkpoint(p, {"w": np.zeros(2)}, category="variance", global_step=10)
    with pytest.raises(RuntimeError, match="Category"):
        load_checkpoint(p, expected_category="acoustic")


def test_variance_ds_roundtrip(tmp_path, ds_segments):
    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"),
        dict(
            TINY_COMMON,
            predict_energy=True,
            dur_prediction_args=dict(
                arch="fs2", hidden_size=32, dropout=0.1, num_layers=2, kernel_size=3,
                log_offset=1.0, loss_type="mse",
                lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
            ),
            pitch_prediction_args=dict(
                pitd_norm_min=-8.0, pitd_norm_max=8.0, pitd_clip_min=-12.0, pitd_clip_max=12.0,
                repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
            ),
            variances_prediction_args=dict(
                total_repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
            ),
        ),
        "tiny_variance",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(
        checkpoint_path(hp["work_dir"], 500), params, category="variance", global_step=500
    )

    infer_ins = DiffSingerVarianceInfer(hp, predictions=set())  # auto-completion
    out_dir = tmp_path / "out"
    infer_ins.run_inference(ds_segments, out_dir=out_dir, title="var_smoke", seed=7, steps=2)

    out_path = out_dir / "var_smoke.ds"
    assert out_path.exists()
    with open(out_path, encoding="utf8") as f:
        results = json.load(f)
    assert len(results) == len(ds_segments)
    for seg_in, seg_out in zip(ds_segments, results):
        # input had ph_dur and f0_seq -> auto-completion predicts energy only
        assert "energy" in seg_out and "energy_timestep" in seg_out
        energy = np.array(seg_out["energy"].split(), np.float32)
        assert np.isfinite(energy).all()
        assert energy.min() >= hp["energy_db_min"] - 1e-3
        assert seg_out["ph_dur"] == seg_in["ph_dur"]  # not re-predicted
