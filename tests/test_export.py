"""Deployment export tests: StableHLO artifacts round-trip through
jax.export.deserialize and produce the same outputs as the live model."""

import pathlib

import numpy as np
import yaml
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from tests.test_e2e_infer import TINY_COMMON, _make_exp


def test_acoustic_export_roundtrip(tmp_path):
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
        ),
        "tiny_export",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "artifacts"
    exporter = DiffSingerAcousticExporter(hp, out_dir)
    exporter.export()

    assert (out_dir / "dsconfig.yaml").exists()
    assert (out_dir / "phonemes.json").exists()
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    # OpenUTAU deployment contract keys (reference acoustic_exporter.py:125-161)
    assert manifest["mel_scale"] == "slaney" and manifest["mel_base"] == "e"
    assert "use_lang_id" in manifest
    if manifest["use_key_shift_embed"]:
        assert manifest["augmentation_args"]["random_pitch_shifting"]["range"]
    sampler_path = next(out_dir.glob("*.diffusion.stablehlo"))

    from jax import export as jexport

    exp = jexport.deserialize(sampler_path.read_bytes())
    tokens = jnp.zeros((1, 64), jnp.int32).at[0, :10].set(jnp.arange(1, 11))
    mel2ph = jnp.zeros((1, 512), jnp.int32).at[0, :500].set(jnp.repeat(jnp.arange(1, 11), 50))
    f0 = jnp.full((1, 512), 220.0, jnp.float32)
    rng = jax.random.PRNGKey(7)
    # depth/steps are runtime inputs of the exported sampler
    depth = jnp.float32(1.0 - hp.get("T_start", 0.4))
    steps = jnp.int32(hp["sampling_steps"])
    mel_exported = exp.call(exporter.params, rng, tokens, mel2ph, f0, depth, steps)
    mel_live = exporter.model.forward_infer_dynamic(
        exporter.params, rng, tokens, mel2ph, f0, depth=depth, steps=steps
    ).diff_out
    np.testing.assert_allclose(np.asarray(mel_exported), np.asarray(mel_live),
                               atol=1e-4, rtol=1e-4)


def test_acoustic_export_gender_velocity_exposure(tmp_path):
    """Models trained with key_shift/speed embeds export correctly (this
    crashed before the conditional-inputs fix): gender is exposed by default
    as a live input with the reference's in-graph range mapping
    (deployment/modules/fastspeech2.py:107-123); --freeze_velocity /
    --freeze_gender bake the mapped value into the graph
    (reference acoustic_exporter.py:58-66)."""
    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            use_key_shift_embed=True,
            use_speed_embed=True,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "tiny_export_gender",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "artifacts_exposed"
    exporter = DiffSingerAcousticExporter(
        hp, out_dir, freeze_velocity=True,  # gender exposed by default
        buckets=[(16, 128)])
    exporter.export()

    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert manifest["use_key_shift_embed"] is True
    assert manifest["use_speed_embed"] is False  # frozen, not an input
    assert manifest["augmentation_args"]["random_pitch_shifting"]["range"]

    from jax import export as jexport

    exp = jexport.deserialize(
        (out_dir / next(iter(manifest["buckets"].values()))["fs2_aux"]).read_bytes())
    tokens = jnp.zeros((1, 16), jnp.int32).at[0, :4].set(jnp.arange(1, 5))
    mel2ph = jnp.zeros((1, 128), jnp.int32).at[0, :100].set(1)
    f0 = jnp.full((1, 128), 220.0, jnp.float32)
    c0, _ = exp.call(exporter.params, tokens, mel2ph, f0,
                     jnp.zeros((1, 128), jnp.float32))
    c1, _ = exp.call(exporter.params, tokens, mel2ph, f0,
                     jnp.full((1, 128), 0.9, jnp.float32))
    assert float(jnp.abs(jnp.asarray(c1) - jnp.asarray(c0)).mean()) > 1e-4

    # frozen variant: no gender input, condition equals gender=0
    out_frozen = tmp_path / "artifacts_frozen"
    DiffSingerAcousticExporter(hp, out_frozen, freeze_gender=0.0,
                               freeze_velocity=True, buckets=[(16, 128)]).export()
    with open(out_frozen / "dsconfig.yaml") as f:
        m2 = yaml.safe_load(f)
    assert m2["use_key_shift_embed"] is False and "augmentation_args" not in m2
    exp_f = jexport.deserialize(
        (out_frozen / next(iter(m2["buckets"].values()))["fs2_aux"]).read_bytes())
    cf, _ = exp_f.call(exporter.params, tokens, mel2ph, f0)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(cf), atol=1e-5)

    # non-neutral --freeze_gender bakes the same mapping the live input uses
    out_g = tmp_path / "artifacts_frozen_g9"
    DiffSingerAcousticExporter(hp, out_g, freeze_gender=0.9,
                               freeze_velocity=True, buckets=[(16, 128)]).export()
    with open(out_g / "dsconfig.yaml") as f:
        m3 = yaml.safe_load(f)
    exp_g = jexport.deserialize(
        (out_g / next(iter(m3["buckets"].values()))["fs2_aux"]).read_bytes())
    cg, _ = exp_g.call(exporter.params, tokens, mel2ph, f0)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(cg), atol=1e-5)


def test_acoustic_export_spk_input_and_freeze(tmp_path):
    """Multi-speaker exports: by default the graph takes a frame-level
    spk_embed input; --freeze_spk bakes a static mix (reference frozen spk
    buffer) so the input disappears and the output equals feeding that mix."""
    import json

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            use_spk_id=True, num_spk=2,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "tiny_export_spk",
    )
    hp["infer"] = True
    with open(pathlib.Path(hp["work_dir"]) / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from jax import export as jexport

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "artifacts_spk"
    exporter = DiffSingerAcousticExporter(hp, out_dir, buckets=[(16, 128)])
    exporter.export()
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert manifest["extra_inputs"] == ["spk_embed"]
    # default multi-speaker policy: export every speaker, stems prefixed by
    # the model name (reference acoustic_exporter.py:70-81, 135-136)
    assert sorted(manifest["speakers"]) == [
        "acoustic.alice", "acoustic.bob"]
    assert (out_dir / "acoustic.alice.emb").exists()
    assert (out_dir / "acoustic.bob.emb").exists()

    tokens = jnp.zeros((1, 16), jnp.int32).at[0, :4].set(jnp.arange(1, 5))
    mel2ph = jnp.zeros((1, 128), jnp.int32).at[0, :100].set(1)
    f0 = jnp.full((1, 128), 220.0, jnp.float32)
    mix = exporter._static_spk_mix_embed("alice:0.5|bob:0.5")
    exp = jexport.deserialize(
        (out_dir / manifest["buckets"]["16x128"]["fs2_aux"]).read_bytes())
    spk_in = jnp.tile(jnp.asarray(mix)[None, None, :], (1, 128, 1))
    c_input, _ = exp.call(exporter.params, tokens, mel2ph, f0, spk_in)

    out_frozen = tmp_path / "artifacts_frozen_spk"
    DiffSingerAcousticExporter(hp, out_frozen, buckets=[(16, 128)],
                               freeze_spk="duo=alice:0.5|bob:0.5").export()
    with open(out_frozen / "dsconfig.yaml") as f:
        m2 = yaml.safe_load(f)
    assert m2["extra_inputs"] == []  # spk baked in
    assert m2["speakers"] == []  # frozen, nothing to export
    frozen_file = m2["buckets"]["16x128"]["fs2_aux"]
    assert ".duo." in frozen_file  # freeze alias suffixes the artifact stem
    exp_f = jexport.deserialize((out_frozen / frozen_file).read_bytes())
    c_frozen, _ = exp_f.call(exporter.params, tokens, mel2ph, f0)
    np.testing.assert_allclose(np.asarray(c_input), np.asarray(c_frozen), atol=1e-5)
    # the .emb file bytes round-trip to the table rows the mix was built from
    alice = np.fromfile(out_dir / "acoustic.alice.emb", np.float32)
    bob = np.fromfile(out_dir / "acoustic.bob.emb", np.float32)
    np.testing.assert_allclose(0.5 * alice + 0.5 * bob, mix, rtol=1e-6)

    # --export_spk with an aliased mixture writes exactly that .emb
    out_mix = tmp_path / "artifacts_export_mix"
    DiffSingerAcousticExporter(hp, out_mix, buckets=[(16, 128)],
                               export_spk=["duo=alice:0.5|bob:0.5"]).export()
    with open(out_mix / "dsconfig.yaml") as f:
        m3 = yaml.safe_load(f)
    assert m3["speakers"] == ["acoustic.duo"]
    duo = np.fromfile(out_mix / "acoustic.duo.emb", np.float32)
    np.testing.assert_allclose(duo, mix, rtol=1e-6)


def test_export_forces_fp32_despite_bf16_infer_precision(tmp_path):
    """infer_precision: bf16 is a serving-time opt-in; exported artifacts
    stay fp32 (the ONNX emitter has no bfloat16, and reference-parity
    artifacts are fp32). Regression for the exporter KeyError(bfloat16)."""
    from diffsinger_tpu.vocoders.nsf_hifigan import NsfHifiGAN
    from diffsinger_tpu.deployment.exporters import NSFHiFiGANExporter

    import json

    (tmp_path / "config.json").write_text(json.dumps(dict(
        num_mels=8, sampling_rate=44100,
        upsample_rates=[4, 4, 2, 2], upsample_kernel_sizes=[8, 8, 4, 4],
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
        mini_nsf=True,
    )))
    hp = dict(
        vocoder_ckpt=str(tmp_path / "missing.ckpt"),
        audio_num_mel_bins=8, audio_sample_rate=44100,
        infer_precision="bf16",
    )
    with pytest.warns(UserWarning):
        serving = NsfHifiGAN(hp)
    assert serving.model.dtype is not None  # bf16 serving model
    out = tmp_path / "voc_export"
    with pytest.warns(UserWarning):
        exporter = NSFHiFiGANExporter(hp, out, buckets=(16,), fmt="onnx")
    assert exporter.vocoder.model.dtype is None  # exporters build fp32
    exporter.export()
    onnx_files = list(out.glob("*.onnx"))
    assert onnx_files, "no ONNX emitted"


def test_acoustic_export_bucket_set(tmp_path):
    """StableHLO is fixed-shape; the exporter emits one artifact per bucket
    and records the bucket table in dsconfig.yaml."""
    import yaml

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "tiny_export_buckets",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "artifacts"
    exporter = DiffSingerAcousticExporter(hp, out_dir, buckets=[(16, 128), (32, 256)])
    exporter.export()

    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert set(manifest["buckets"]) == {"16x128", "32x256"}

    from jax import export as jexport

    for key, (t_txt, t_mel) in [("16x128", (16, 128)), ("32x256", (32, 256))]:
        path = out_dir / manifest["buckets"][key]["acoustic"]
        assert path.exists()
        exp = jexport.deserialize(path.read_bytes())
        tokens = jnp.zeros((1, t_txt), jnp.int32).at[0, :4].set(jnp.arange(1, 5))
        mel2ph = jnp.zeros((1, t_mel), jnp.int32).at[0, :100].set(1)
        f0 = jnp.full((1, t_mel), 220.0, jnp.float32)
        mel = exp.call(exporter.params, jax.random.PRNGKey(3), tokens, mel2ph, f0,
                       jnp.float32(1.0), jnp.int32(2))
        assert mel.shape == (1, t_mel, 16)
        assert bool(jnp.isfinite(mel).all())


def test_artifact_runtime_bucket_dispatch(tmp_path):
    """AcousticArtifactRuntime picks the smallest fitting bucket, pads, runs
    the deserialized artifact, and trims — matching the direct padded call."""
    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "tiny_runtime",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter
    from diffsinger_tpu.deployment.runtime import AcousticArtifactRuntime

    out_dir = tmp_path / "artifacts"
    exporter = DiffSingerAcousticExporter(hp, out_dir, buckets=[(16, 128), (32, 256)])
    exporter.export()

    rt = AcousticArtifactRuntime(out_dir, exporter.params)
    tokens = np.zeros((1, 10), np.int32)
    tokens[0, :4] = np.arange(1, 5)
    mel2ph = np.zeros((1, 100), np.int32)
    mel2ph[0, :80] = 1
    f0 = np.full((1, 100), 220.0, np.float32)
    mel = rt.synthesize_mel(tokens, mel2ph, f0, seed=5)
    assert mel.shape == (1, 100, 16)

    # must equal calling the 16x128 artifact directly with padded inputs
    from jax import export as jexport

    import yaml
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    exp = jexport.deserialize(
        (out_dir / manifest["buckets"]["16x128"]["acoustic"]).read_bytes())
    tok_p = np.zeros((1, 16), np.int32); tok_p[:, :10] = tokens
    m2p_p = np.zeros((1, 128), np.int32); m2p_p[:, :100] = mel2ph
    f0_p = np.full((1, 128), 220.0, np.float32); f0_p[:, :100] = f0
    golden = exp.call(exporter.params, jax.random.PRNGKey(5), tok_p, m2p_p, f0_p,
                      jnp.float32(manifest["max_depth"]),
                      jnp.int32(manifest["sampling_steps"]))
    np.testing.assert_allclose(mel, np.asarray(golden)[:, :100], atol=1e-5)

    # too-long inputs are rejected with the available buckets listed
    with pytest.raises(ValueError, match="no exported bucket"):
        rt.synthesize_mel(np.zeros((1, 40), np.int32),
                          np.zeros((1, 300), np.int32),
                          np.full((1, 300), 220.0, np.float32))


def test_variance_artifact_runtime(tmp_path):
    """VarianceArtifactRuntime serves an exported variance bundle through the
    deployed contract: linguistic -> encoder_out + dur, then pitch/variance
    sampling with manifest-driven input assembly (neutral retake/expr
    defaults), bucket padding, and trimming."""
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
        "tiny_var_runtime",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="variance", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerVarianceExporter
    from diffsinger_tpu.deployment.runtime import VarianceArtifactRuntime

    out_dir = tmp_path / "var_artifacts"
    exporter = DiffSingerVarianceExporter(hp, out_dir, buckets=[(16, 64)])
    exporter.export()

    rt = VarianceArtifactRuntime(out_dir, exporter.params)
    assert rt.variance_names() == ["energy"]

    tokens = np.zeros((1, 10), np.int32); tokens[0, :4] = np.arange(1, 5)
    midi = np.full((1, 10), 60, np.int32)
    ph2word = np.zeros((1, 10), np.int32); ph2word[0, :4] = np.array([1, 1, 2, 2])
    word_dur = np.full((1, 10), 4.0, np.float32)
    enc, dur, bucket = rt.encode(tokens, midi, ph2word, word_dur, t_mel=50)
    assert enc.shape == (1, 16, hp["hidden_size"])  # bucket-padded
    assert dur.shape == (1, 10)                     # trimmed

    ph_dur = np.full((1, 10), 5, np.int32)          # 50 frames
    note_midi = np.full((1, 10), 62.0, np.float32)
    note_dur = np.full((1, 10), 5, np.int32)
    pitch_in = np.full((1, 50), 62.0, np.float32)
    pitch = rt.predict_pitch(enc, ph_dur, note_midi, note_dur, pitch_in,
                             bucket, seed=3, steps=2)
    assert pitch.shape == (1, 50) and np.isfinite(pitch).all()
    assert abs(float(pitch.mean()) - 62.0) < 12.0   # absolute midi curve

    # matches the live deployed method on identically padded inputs
    pad_ph = np.zeros((1, 16), np.int32); pad_ph[:, :10] = ph_dur
    pad_nm = np.zeros((1, 16), np.float32); pad_nm[:, :10] = note_midi
    pad_nd = np.zeros((1, 16), np.int32); pad_nd[:, :10] = note_dur
    pad_p = np.zeros((1, 64), np.float32); pad_p[:, :50] = pitch_in
    live = model.forward_pitch_deployed(
        exporter.params, jax.random.PRNGKey(3), jnp.asarray(enc),
        jnp.asarray(pad_ph), jnp.asarray(pad_nm), jnp.asarray(pad_nd),
        jnp.asarray(pad_p), jnp.ones((1, 64), bool),
        expr=jnp.ones((1, 64), jnp.float32), steps=jnp.int32(2))
    np.testing.assert_allclose(pitch, np.asarray(live)[:, :50], atol=1e-4, rtol=1e-4)

    vars_out = rt.predict_variances(enc, ph_dur, pitch, bucket, seed=3, steps=2)
    assert set(vars_out) == {"energy"}
    assert vars_out["energy"].shape == (1, 50)
    assert np.isfinite(vars_out["energy"]).all()


def test_full_chain_from_bundles(tmp_path):
    """The complete deployment story: exported variance, acoustic, and
    vocoder bundles chained through the artifact runtimes produce a waveform
    with NO model classes or hparams — only manifests, artifacts, and params
    (the OpenUTAU-equivalent consumer path)."""
    import json

    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    # --- variance bundle ---------------------------------------------------
    hp_v = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"),
        dict(
            TINY_COMMON,
            predict_energy=False,
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
        ),
        "bundle_var",
    )
    hp_v["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerVariance

    vocab = len(load_phoneme_dictionary(hp_v))
    vmodel = DiffSingerVariance(hp_v, vocab_size=vocab)
    save_checkpoint(checkpoint_path(hp_v["work_dir"], 10), vmodel.init(jax.random.PRNGKey(0)),
                    category="variance", global_step=10)

    from diffsinger_tpu.deployment.exporters import (
        DiffSingerAcousticExporter, DiffSingerVarianceExporter, NSFHiFiGANExporter)
    from diffsinger_tpu.deployment.runtime import (
        AcousticArtifactRuntime, VarianceArtifactRuntime, VocoderArtifactRuntime)

    var_dir = tmp_path / "bundle_variance"
    var_exp = DiffSingerVarianceExporter(hp_v, var_dir, buckets=[(16, 64)])
    var_exp.export()

    # --- acoustic bundle ---------------------------------------------------
    hp_a = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
        ),
        "bundle_ac",
    )
    hp_a["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    amodel = DiffSingerAcoustic(hp_a, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp_a["work_dir"], 10), amodel.init(jax.random.PRNGKey(1)),
                    category="acoustic", global_step=10)
    ac_dir = tmp_path / "bundle_acoustic"
    ac_exp = DiffSingerAcousticExporter(hp_a, ac_dir, buckets=[(16, 64)])
    ac_exp.export()

    # --- vocoder bundle ----------------------------------------------------
    (tmp_path / "config.json").write_text(json.dumps(dict(
        num_mels=16, sampling_rate=44100,
        upsample_rates=[4, 4, 2, 2], upsample_kernel_sizes=[8, 8, 4, 4],
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
        mini_nsf=True,
    )))
    hp_voc = dict(vocoder_ckpt=str(tmp_path / "missing.ckpt"),
                  audio_num_mel_bins=16, audio_sample_rate=44100)
    voc_dir = tmp_path / "bundle_vocoder"
    with pytest.warns(UserWarning):  # random vocoder weights
        voc_exp = NSFHiFiGANExporter(hp_voc, voc_dir, buckets=(64,))
    voc_exp.export()
    hop = 4 * 4 * 2 * 2

    # --- chain: score -> pitch -> mel -> wav, bundles only ------------------
    rt_var = VarianceArtifactRuntime(var_dir, var_exp.params)
    rt_ac = AcousticArtifactRuntime(ac_dir, ac_exp.params)
    rt_voc = VocoderArtifactRuntime(voc_dir, voc_exp.vocoder.params)

    tokens = np.zeros((1, 10), np.int32); tokens[0, :4] = np.arange(1, 5)
    midi = np.full((1, 10), 60, np.int32)
    ph2word = np.zeros((1, 10), np.int32); ph2word[0, :4] = np.array([1, 1, 2, 2])
    word_dur = np.full((1, 10), 5.0, np.float32)
    t_mel = 50
    enc, dur_pred, bucket = rt_var.encode(tokens, midi, ph2word, word_dur, t_mel=t_mel)
    assert dur_pred.shape == (1, 10)

    ph_dur = np.full((1, 10), 5, np.int32)
    note_midi = np.full((1, 10), 64.0, np.float32)
    note_dur = np.full((1, 10), 5, np.int32)
    pitch = rt_var.predict_pitch(enc, ph_dur, note_midi, note_dur,
                                 np.full((1, t_mel), 64.0, np.float32),
                                 bucket, seed=7, steps=2)
    assert pitch.shape == (1, t_mel) and np.isfinite(pitch).all()

    f0 = (440.0 * 2.0 ** ((pitch - 69.0) / 12.0)).astype(np.float32)
    mel2ph = np.zeros((1, t_mel), np.int32)
    mel2ph[0] = np.repeat(np.arange(1, 11), 5)
    mel = rt_ac.synthesize_mel(tokens, mel2ph, f0, seed=7, steps=2)
    assert mel.shape == (1, t_mel, 16) and np.isfinite(mel).all()

    wav = rt_voc.vocode(mel, f0)
    assert wav.shape == (1, t_mel * hop)
    assert np.isfinite(wav).all() and float(np.abs(wav).max()) > 0


def test_variance_export_spk_input_and_freeze(tmp_path):
    """Multi-speaker variance export: by default the linguistic view takes a
    token-level ph_spk_embed and the sampling views a frame-level spk_embed;
    --freeze_spk bakes the mix into every view (reference
    variance_exporter.py:82-83 frozen_spk_embed buffer)."""
    import json

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"),
        dict(
            TINY_COMMON,
            use_spk_id=True, num_spk=2,
            predict_energy=False,
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
        ),
        "tiny_var_spk",
    )
    hp["infer"] = True
    with open(pathlib.Path(hp["work_dir"]) / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="variance", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerVarianceExporter
    from jax import export as jexport

    out_dir = tmp_path / "var_spk_artifacts"
    exporter = DiffSingerVarianceExporter(hp, out_dir, buckets=[(16, 64)])
    exporter.export()
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    # default multi-speaker policy: every speaker exported
    assert sorted(manifest["speakers"]) == ["variance.alice", "variance.bob"]
    assert manifest["inputs"]["linguistic"][-1] == "ph_spk_embed"
    assert "spk_embed" in manifest["inputs"]["pitch"]

    mix = 0.5 * np.fromfile(out_dir / "variance.alice.emb", np.float32) + \
        0.5 * np.fromfile(out_dir / "variance.bob.emb", np.float32)
    tokens = jnp.zeros((1, 16), jnp.int32).at[0, :4].set(jnp.arange(1, 5))
    midi = jnp.full((1, 16), 60, jnp.int32)
    ph2word = jnp.zeros((1, 16), jnp.int32).at[0, :4].set(jnp.asarray([1, 1, 2, 2]))
    word_dur = jnp.full((1, 16), 4.0, jnp.float32)
    spk = jnp.asarray(mix)[None, None, :]
    files = manifest["buckets"]["16x64"]
    exp = jexport.deserialize((out_dir / files["linguistic"]).read_bytes())
    enc_in, _ = exp.call(exporter.params, tokens, midi, ph2word, word_dur, spk)

    out_frozen = tmp_path / "var_spk_frozen"
    DiffSingerVarianceExporter(hp, out_frozen, buckets=[(16, 64)],
                               freeze_spk="duo=alice:0.5|bob:0.5").export()
    with open(out_frozen / "dsconfig.yaml") as f:
        m2 = yaml.safe_load(f)
    assert m2["speakers"] == []
    assert "ph_spk_embed" not in m2["inputs"]["linguistic"]
    assert "spk_embed" not in m2["inputs"]["pitch"]
    f2 = m2["buckets"]["16x64"]
    assert ".duo." in f2["linguistic"]
    exp_f = jexport.deserialize((out_frozen / f2["linguistic"]).read_bytes())
    enc_frozen, _ = exp_f.call(exporter.params, tokens, midi, ph2word, word_dur)
    np.testing.assert_allclose(np.asarray(enc_in), np.asarray(enc_frozen), atol=1e-5)

    # the frozen pitch view runs end-to-end without spk inputs
    exp_p = jexport.deserialize((out_frozen / f2["pitch"]).read_bytes())
    out = exp_p.call(exporter.params, jax.random.PRNGKey(0), enc_frozen,
                     jnp.full((1, 16), 4, jnp.int32),
                     jnp.full((1, 16), 60.0, jnp.float32),
                     jnp.full((1, 16), 4, jnp.int32),
                     jnp.full((1, 64), 60.0, jnp.float32),
                     jnp.ones((1, 64), jnp.float32),
                     jnp.ones((1, 64), bool), jnp.int32(2))
    assert bool(jnp.isfinite(out).all())
