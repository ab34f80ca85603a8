"""Variance -> acoustic chained inference (BASELINE config #2): the variance
model predicts ph_dur/f0/energy into a new .ds, which the acoustic model (with
multi-speaker mix + energy embed) synthesizes to a wav."""

import pathlib
import json
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from tests.test_e2e_infer import DICT, SAMPLE, TINY_COMMON, _make_exp


def test_variance_to_acoustic_chain(tmp_path):
    with open(SAMPLE, encoding="utf-8") as f:
        segments = json.load(f)[:1]
    # strip f0 so the variance model must predict it (auto-completion)
    seg = dict(segments[0])
    seg.pop("f0_seq", None)
    seg.pop("f0_timestep", None)

    # ---------------- variance model ----------------
    hp_var = _make_exp(
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
        "chain_variance",
    )
    hp_var["infer"] = True

    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic, DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp_var))
    vmodel = DiffSingerVariance(hp_var, vocab_size=vocab)
    save_checkpoint(checkpoint_path(hp_var["work_dir"], 10),
                    vmodel.init(jax.random.PRNGKey(0)), category="variance", global_step=10)

    var_infer = DiffSingerVarianceInfer(hp_var, predictions=set())
    out_dir = tmp_path / "chain_out"
    var_infer.run_inference([seg], out_dir=out_dir, title="stage1", seed=3, steps=2)
    with open(out_dir / "stage1.ds", encoding="utf8") as f:
        chained = json.load(f)
    assert "f0_seq" in chained[0] and "energy" in chained[0]

    # ---------------- acoustic model (multi-speaker + energy embed) -------
    hp_ac = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            use_spk_id=True, num_spk=4,
            use_energy_embed=True,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            shallow_diffusion_args=dict(
                train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
                aux_decoder_arch="convnext",
                aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                                      dropout_rate=0.1),
                aux_decoder_grad=0.1,
            ),
            vocoder_ckpt=str(tmp_path / "none.ckpt"),
        ),
        "chain_acoustic",
    )
    hp_ac["infer"] = True
    with open(tmp_path / "checkpoints" / "chain_acoustic" / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    amodel = DiffSingerAcoustic(hp_ac, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp_ac["work_dir"], 20),
                    amodel.init(jax.random.PRNGKey(1)), category="acoustic", global_step=20)

    for p in chained:
        p["spk_mix"] = {"alice": 0.6, "bob": 0.4}

    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

    with pytest.warns(UserWarning):  # random vocoder weights
        ac_infer = DiffSingerAcousticInfer(hp_ac)
    ac_infer.run_inference(chained, out_dir=out_dir, title="stage2", seed=4, steps=2)

    wav_path = out_dir / "stage2.wav"
    assert wav_path.exists()
    with wave.open(str(wav_path)) as f:
        assert f.getnframes() > 0


def test_legacy_predictor_modules():
    """Inventory parity: the conv PitchPredictor/VariancePredictor modules."""
    import jax.numpy as jnp

    from diffsinger_tpu.models.variance_encoder import PitchPredictor, VariancePredictor

    xs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 32)).astype(np.float32))
    vp = VariancePredictor(vmin=-96.0, vmax=-12.0, n_layers=2, n_chans=16)
    params = vp.init(jax.random.PRNGKey(0), xs)
    out = vp.apply(params, xs, infer=True)
    assert out.shape == (2, 20)
    assert float(out.min()) >= -96.0 - 50 and np.isfinite(np.asarray(out)).all()

    base = jnp.full((2, 20), 60.0)
    pp = PitchPredictor(vmin=-8.0, vmax=8.0, num_bins=32, n_layers=2, n_chans=16)
    params = pp.init(jax.random.PRNGKey(1), xs, base)
    pitch, logits = pp.apply(params, xs, base)
    assert pitch.shape == (2, 20) and logits.shape == (2, 20, 32)
    # with near-uniform random logits, prediction stays near base +- range
    assert np.all(np.abs(np.asarray(pitch) - 60.0) <= 8.5)
