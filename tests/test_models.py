"""Model-stack tests: shapes, masking invariants, jit-ability, and
train/infer forward passes of the top-level acoustic and variance models
built from the reference configs (tiny overrides for CPU speed)."""

import pathlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.config import load_config

TINY_ACOUSTIC = dict(
    hidden_size=32,
    enc_layers=2,
    num_heads=2,
    audio_num_mel_bins=16,
    backbone_args=dict(num_channels=32, num_layers=2, kernel_size=7,
                       dropout_rate=0.0, strong_cond=True),
    shallow_diffusion_args_aux_channels=16,
    sampling_steps=3,
)


@pytest.fixture(scope="module")
def acoustic_hp():
    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp.update(
        hidden_size=32, enc_layers=2, audio_num_mel_bins=16, sampling_steps=3,
        backbone_args=dict(num_channels=32, num_layers=2, kernel_size=7,
                           dropout_rate=0.0, strong_cond=True),
    )
    hp["shallow_diffusion_args"] = dict(
        hp["shallow_diffusion_args"],
        aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7, dropout_rate=0.1),
    )
    return hp


@pytest.fixture(scope="module")
def variance_hp():
    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"), save_snapshot=False)
    hp.update(
        hidden_size=32, enc_layers=1,
        predict_energy=True, predict_breathiness=True,
        sampling_steps=3,
    )
    hp["dur_prediction_args"] = dict(hp["dur_prediction_args"], hidden_size=32, num_layers=2)
    hp["pitch_prediction_args"] = dict(
        hp["pitch_prediction_args"], repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )
    hp["variances_prediction_args"] = dict(
        hp["variances_prediction_args"], total_repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )
    return hp


B, T_TXT, T_MEL = 2, 10, 40


def _acoustic_inputs():
    rng = np.random.default_rng(0)
    txt = np.zeros((B, T_TXT), np.int32)
    txt[0, :8] = rng.integers(1, 20, 8)
    txt[1, :10] = rng.integers(1, 20, 10)
    mel2ph = np.zeros((B, T_MEL), np.int32)
    mel2ph[0, :32] = np.repeat(np.arange(1, 9), 4)
    mel2ph[1, :40] = np.repeat(np.arange(1, 11), 4)
    f0 = np.full((B, T_MEL), 220.0, np.float32)
    return jnp.asarray(txt), jnp.asarray(mel2ph), jnp.asarray(f0)


def test_fastspeech2_encoder_masking(acoustic_hp):
    """Padding positions must stay exactly zero through the encoder."""
    from diffsinger_tpu.models.commons import FastSpeech2Encoder

    enc = FastSpeech2Encoder(hidden_size=32, num_layers=2, ffn_kernel_size=3, dropout=0.0)
    main = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 32)).astype(np.float32))
    pad = jnp.asarray(np.array([[False] * 8 + [True] * 4, [False] * 12]))
    params = enc.init(jax.random.PRNGKey(0), main, None, pad)
    out = enc.apply(params, main, None, pad)
    assert out.shape == (2, 12, 32)
    assert np.abs(np.asarray(out[0, 8:])).max() == 0.0
    assert np.abs(np.asarray(out[0, :8])).max() > 0.0


def test_rope_rotation_invariants():
    """RoPE preserves norms and relative-position dot products."""
    from diffsinger_tpu.models.commons import apply_rope

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 16, 8)).astype(np.float32))
    r = apply_rope(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), np.linalg.norm(np.asarray(r), axis=-1), rtol=1e-5
    )
    # dot(q_i, k_j) after rotation depends only on (i - j): shift both by 2
    q = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 16, 8)).astype(np.float32))
    k = jnp.asarray(np.random.default_rng(2).standard_normal((1, 1, 16, 8)).astype(np.float32))
    rq, rk = np.asarray(apply_rope(q)), np.asarray(apply_rope(k))
    d1 = (rq[0, 0, 5] * rk[0, 0, 3]).sum()
    # same content placed at shifted positions
    q2 = jnp.asarray(np.roll(np.asarray(q), 2, axis=2))
    k2 = jnp.asarray(np.roll(np.asarray(k), 2, axis=2))
    rq2, rk2 = np.asarray(apply_rope(q2)), np.asarray(apply_rope(k2))
    d2 = (rq2[0, 0, 7] * rk2[0, 0, 5]).sum()
    np.testing.assert_allclose(d1, d2, rtol=1e-4)


@pytest.mark.slow
def test_acoustic_model_train_and_infer(acoustic_hp):
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    model = DiffSingerAcoustic(acoustic_hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    txt, mel2ph, f0 = _acoustic_inputs()
    gt_mel = jnp.asarray(
        np.random.default_rng(1).uniform(-10, -1, (B, T_MEL, 16)).astype(np.float32)
    )

    aux_out, (v_pred, v_gt, t) = model.forward_train(
        params, jax.random.PRNGKey(1), txt, mel2ph, f0, gt_mel
    )
    assert aux_out.shape == (B, T_MEL, 16)  # normalized aux output
    assert v_pred.shape == (B, T_MEL, 16) and v_gt.shape == (B, T_MEL, 16)
    assert t.shape == (B,)
    assert np.all(np.asarray(t) >= acoustic_hp["T_start"])

    out = jax.jit(model.forward_infer)(params, jax.random.PRNGKey(2), txt, mel2ph, f0)
    mel = np.asarray(out.diff_out)
    assert mel.shape == (B, T_MEL, 16)
    # masked frames are zero; real frames lie in the denorm range
    assert np.abs(mel[0, 32:]).max() == 0.0
    assert np.isfinite(mel).all()
    aux = np.asarray(out.aux_out)
    assert aux.shape == (B, T_MEL, 16)
    assert np.abs(aux[0, 32:]).max() == 0.0


@pytest.mark.slow
def test_acoustic_gradients_flow(acoustic_hp):
    from diffsinger_tpu.models.losses import aux_mel_loss, reflow_loss
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    model = DiffSingerAcoustic(acoustic_hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    txt, mel2ph, f0 = _acoustic_inputs()
    gt_mel = jnp.asarray(
        np.random.default_rng(1).uniform(-10, -1, (B, T_MEL, 16)).astype(np.float32)
    )
    nonpadding = (mel2ph > 0).astype(jnp.float32)

    def loss_fn(p):
        aux_out, (v_pred, v_gt, t) = model.forward_train(
            p, jax.random.PRNGKey(1), txt, mel2ph, f0, gt_mel
        )
        main = reflow_loss(v_pred, v_gt, t, nonpadding, loss_type="l2",
                           log_norm=acoustic_hp["main_loss_log_norm"])
        aux = aux_mel_loss(aux_out, model.spec_transform.norm(gt_mel), nonpadding)
        return main + acoustic_hp["lambda_aux_mel_loss"] * aux

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in flat]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)


def test_variance_model_train_and_infer(variance_hp):
    from diffsinger_tpu.models.toplevel import DiffSingerVariance

    model = DiffSingerVariance(variance_hp, vocab_size=30)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    txt = np.zeros((B, T_TXT), np.int32)
    txt[:, :8] = rng.integers(1, 20, (B, 8))
    midi = np.full((B, T_TXT), 60, np.int32)
    ph2word = np.zeros((B, T_TXT), np.int32)
    ph2word[:, :8] = np.repeat(np.arange(1, 5), 2)[None]
    ph_dur = np.zeros((B, T_TXT), np.float32)
    ph_dur[:, :8] = 5.0
    mel2ph = np.zeros((B, T_MEL), np.int32)
    mel2ph[:, :40] = np.repeat(np.arange(1, 9), 5)[None]
    base_pitch = np.full((B, T_MEL), 60.0, np.float32)
    pitch = base_pitch + rng.uniform(-1, 1, (B, T_MEL)).astype(np.float32)
    variances = {
        "energy": rng.uniform(-60, -20, (B, T_MEL)).astype(np.float32),
        "breathiness": rng.uniform(-70, -30, (B, T_MEL)).astype(np.float32),
    }
    retake = {k: np.ones((B, T_MEL), bool) for k in variances}

    dur_pred, pitch_out, var_out = model.forward_train(
        params, jax.random.PRNGKey(1),
        jnp.asarray(txt), jnp.asarray(midi), jnp.asarray(ph2word), jnp.asarray(ph_dur),
        jnp.asarray(mel2ph), jnp.asarray(base_pitch), jnp.asarray(pitch),
        {k: jnp.asarray(v) for k, v in variances.items()},
        pitch_retake=jnp.asarray(np.ones((B, T_MEL), bool)),
        variance_retake={k: jnp.asarray(v) for k, v in retake.items()},
    )
    assert dur_pred.shape == (B, T_TXT)
    v_pred, v_gt, t = pitch_out
    assert v_pred.shape == (B, T_MEL, 8)
    v_pred2, v_gt2, _ = var_out
    assert v_pred2.shape == (B, T_MEL, 8)  # 2 feats x 4 bins

    # inference: word_dur path (mel2ph=None)
    word_dur = np.zeros((B, 10), np.float32)
    word_dur[:, :4] = 10.0
    dur_pred, pitch_pred, variances_pred = model.forward_infer(
        params, jax.random.PRNGKey(2),
        jnp.asarray(txt), jnp.asarray(midi), jnp.asarray(ph2word),
        jnp.asarray(base_pitch), word_dur=jnp.asarray(word_dur),
    )
    assert dur_pred.shape == (B, T_TXT)
    assert np.all(np.asarray(dur_pred) >= 0)
    assert pitch_pred.shape == (B, T_MEL)
    p = np.asarray(pitch_pred)
    assert np.all(p >= variance_hp["pitch_prediction_args"]["pitd_clip_min"])
    assert np.all(p <= variance_hp["pitch_prediction_args"]["pitd_clip_max"])
    assert set(variances_pred) == {"energy", "breathiness"}
    e = np.asarray(variances_pred["energy"])
    assert np.all(e <= 0.0) and np.all(e >= variance_hp["energy_db_min"])


def test_dur_loss_sanity():
    from diffsinger_tpu.models.losses import dur_loss

    rng = np.random.default_rng(0)
    dur_gt = jnp.asarray(rng.integers(1, 10, (2, 6)).astype(np.float32))
    ph2word = jnp.asarray(np.array([[1, 1, 2, 2, 3, 3]] * 2))
    nonpadding = jnp.ones((2, 6))
    perfect = jnp.log(dur_gt + 1.0)
    loss0 = dur_loss(perfect, dur_gt, ph2word, nonpadding)
    assert float(loss0) < 1e-7
    loss1 = dur_loss(perfect + 0.5, dur_gt, ph2word, nonpadding)
    assert float(loss1) > float(loss0)


@pytest.mark.slow
def test_acoustic_staged_training_flags(acoustic_hp):
    """Reference staged shallow-diffusion training (docs/BestPractices.md
    'Train auxiliary decoder and diffusion decoder separately', reference
    shallow_diffusion_args.train_diffusion): with train_diffusion false the
    sampler branch leaves the training graph — no mel_loss, exactly-zero
    denoiser gradients, live aux-decoder gradients."""
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn

    hp = dict(acoustic_hp)
    hp["shallow_diffusion_args"] = dict(
        acoustic_hp["shallow_diffusion_args"], train_diffusion=False)
    model = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    txt, mel2ph, f0 = _acoustic_inputs()
    gt_mel = jnp.asarray(
        np.random.default_rng(1).uniform(-10, -1, (B, T_MEL, 16)).astype(np.float32)
    )
    aux_out, diff_out = model.forward_train(
        params, jax.random.PRNGKey(1), txt, mel2ph, f0, gt_mel
    )
    assert diff_out is None and aux_out is not None

    batch = {"tokens": txt, "mel2ph": mel2ph, "f0": f0, "mel": gt_mel}
    loss_fn = make_acoustic_loss_fn(model)
    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.PRNGKey(2))
    assert "mel_loss" not in losses and "aux_mel_loss" in losses
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    denoiser = [v for p, v in leaves if "denoiser" in jax.tree_util.keystr(p)]
    aux = [v for p, v in leaves if "aux" in jax.tree_util.keystr(p)]
    assert denoiser and aux
    assert all(float(np.abs(np.asarray(g)).max()) == 0.0 for g in denoiser)
    assert any(float(np.abs(np.asarray(g)).max()) > 0.0 for g in aux)

    # nothing-trains configurations are rejected loudly
    hp_bad = dict(acoustic_hp)
    hp_bad["shallow_diffusion_args"] = dict(
        acoustic_hp["shallow_diffusion_args"],
        train_aux_decoder=False, train_diffusion=False)
    model_bad = DiffSingerAcoustic(hp_bad, vocab_size=30, out_dims=16)
    with pytest.raises(ValueError, match="nothing would train"):
        make_acoustic_loss_fn(model_bad)


def test_freeze_mask_matches_reference_prefixes(acoustic_hp):
    """frozen_params uses reference-style prefixes ('model.fs2',
    basics/base_task.py:92-111). The flax tree roots at the 'params'
    collection — the mask must strip it, or freezing is a silent no-op."""
    import optax

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.base_task import make_freeze_mask

    model = DiffSingerAcoustic(acoustic_hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    mask = make_freeze_mask(params, ["model.fs2"])
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    fs2 = [v for p, v in leaves if "'fs2'" in jax.tree_util.keystr(p)]
    rest = [v for p, v in leaves if "'fs2'" not in jax.tree_util.keystr(p)]
    assert fs2 and rest
    assert all(fs2), "every fs2 param must be frozen"
    assert not any(rest), "nothing outside fs2 may be frozen"

    # integration: the production wrapping (multi_transform) leaves frozen
    # params bitwise unchanged even under AdamW weight decay (a pre-chained
    # gradient zero would NOT: decay moves zero-gradient params too)
    labels = jax.tree.map(lambda f: "frozen" if f else "train", mask)
    tx = optax.multi_transform(
        {"train": optax.adamw(1e-2, weight_decay=1e-2),
         "frozen": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_params)[0]
    for (p, old), (_, new) in zip(flat_old, flat_new):
        if "'fs2'" in jax.tree_util.keystr(p):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        else:
            assert not np.array_equal(np.asarray(old), np.asarray(new))


def test_finetune_filter_honors_reference_prefixes(acoustic_hp):
    """finetune_ignored_params ships reference-style prefixes
    (configs/acoustic.yaml: model.fs2.encoder.embed_tokens / model.fs2.
    txt_embed / model.fs2.spk_embed). The filter must strip the 'model.'
    and 'params.' wrappers and alias the reference's encoder-internal
    embedding name, or vocabulary-dependent tables silently load from the
    donor checkpoint."""
    from flax import serialization

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.base_task import filter_finetune_params

    hp = dict(acoustic_hp, use_spk_id=True, num_spk=3)
    model = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    template = model.init(jax.random.PRNGKey(0))
    donor = jax.tree.map(lambda x: x + 1.0, template)
    ignored = ["model.fs2.encoder.embed_tokens", "model.fs2.txt_embed",
               "model.fs2.spk_embed"]

    merged = filter_finetune_params(
        template, serialization.to_state_dict(donor), ignored)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(template)[0]}
    flat_m = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(merged)[0]}
    kept, taken = [], []
    for k in flat_t:
        (kept if np.array_equal(flat_m[k], flat_t[k]) else taken).append(k)
    embeds = [k for k in flat_t if "'txt_embed'" in k or "'spk_embed'" in k]
    assert embeds, "fixture has no embedding tables"
    for k in embeds:
        assert k in kept, f"ignored embed table was overwritten: {k}"
    assert taken, "donor params were not loaded at all"
    assert all(k in embeds for k in kept), f"non-ignored params kept: " \
        f"{[k for k in kept if k not in embeds][:3]}"

    # shape mismatch: strict raises, non-strict keeps the template shape
    donor_small = serialization.to_state_dict(
        DiffSingerAcoustic(dict(hp, num_spk=2), vocab_size=20, out_dims=16)
        .init(jax.random.PRNGKey(1)))
    with pytest.raises(ValueError, match="Shape mismatch"):
        filter_finetune_params(template, donor_small, [])
    merged2 = filter_finetune_params(template, donor_small, [],
                                     strict_shapes=False)
    flat_2 = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(merged2)[0]}
    for k in embeds:
        assert flat_2[k].shape == flat_t[k].shape


def test_max_beta_unread_warns_once(acoustic_hp):
    """max_beta is accepted-but-unread for reference parity (the reference
    never forwards it into its beta schedule); a non-0.01 value must warn
    exactly once so self-trained pre-fix DDPM checkpoints don't break
    silently."""
    import warnings

    from diffsinger_tpu.models import toplevel
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    hp = dict(acoustic_hp, diffusion_type="ddpm", use_shallow_diffusion=False,
              max_beta=0.02)
    toplevel._warned_max_beta = False
    with pytest.warns(UserWarning, match="UNREAD"):
        DiffSingerAcoustic(hp, vocab_size=20, out_dims=16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second construction: silent
        DiffSingerAcoustic(hp, vocab_size=20, out_dims=16)
    # the reference-default endpoint itself never warns
    toplevel._warned_max_beta = False
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DiffSingerAcoustic(dict(hp, max_beta=0.01), vocab_size=20, out_dims=16)
