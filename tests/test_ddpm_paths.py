"""Coverage for the DDPM-core acoustic model across all accelerators and the
melody-encoder variance path (glide embeds)."""

import pathlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.config import load_config


@pytest.fixture(scope="module")
def ddpm_hp():
    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"), save_snapshot=False)
    hp.update(
        hidden_size=32, enc_layers=1, audio_num_mel_bins=16,
        diffusion_type="ddpm", timesteps=40, K_step=20, K_step_infer=20,
        diff_speedup=5, schedule_type="linear", max_beta=0.02,
        backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                           dropout_rate=0.0, strong_cond=True),
    )
    hp["shallow_diffusion_args"] = dict(
        hp["shallow_diffusion_args"],
        aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7, dropout_rate=0.1),
    )
    return hp


@pytest.mark.parametrize("accelerator,speedup", [
    ("ddim", 5), ("pndm", 5), ("dpm-solver", 5), ("unipc", 5), ("ddpm", 1),
])
def test_ddpm_acoustic_inference_paths(ddpm_hp, accelerator, speedup):
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    hp = dict(ddpm_hp)
    if accelerator == "ddpm":
        hp["diff_speedup"] = 1  # ancestral sampling path
    else:
        hp["diff_accelerator"] = accelerator
        hp["diff_speedup"] = speedup

    model = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.ones((1, 8), jnp.int32)
    mel2ph = jnp.asarray(np.repeat(np.arange(1, 9), 4)[None].astype(np.int32))
    f0 = jnp.full((1, 32), 220.0, jnp.float32)
    out = model.forward_infer(params, jax.random.PRNGKey(1), tokens, mel2ph, f0)
    mel = np.asarray(out.diff_out)
    assert mel.shape == (1, 32, 16)
    assert np.isfinite(mel).all()
    # random weights: magnitudes stay sane through denorm (no blowup in the scan)
    assert np.abs(mel).max() < 100


@pytest.mark.slow
@pytest.mark.parametrize("accelerator", ["ddim", "pndm", "dpm-solver", "unipc"])
def test_ddpm_accelerators_under_bf16_denoiser(ddpm_hp, accelerator):
    """infer_precision bf16: the denoiser returns bfloat16 while the sampler
    carry is fp32 — PNDM's warmup/multistep cond branches must agree on dtype
    (regression: bf16 PLMS failed to trace before the explicit cast)."""
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    hp = dict(ddpm_hp, diff_accelerator=accelerator, diff_speedup=5)
    model = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.ones((1, 8), jnp.int32)
    mel2ph = jnp.asarray(np.repeat(np.arange(1, 9), 4)[None].astype(np.int32))
    f0 = jnp.full((1, 32), 220.0, jnp.float32)
    out = model.forward_infer(params, jax.random.PRNGKey(1), tokens, mel2ph, f0)
    mel = np.asarray(out.diff_out)
    assert mel.shape == (1, 32, 16)
    assert np.isfinite(mel).all()


def test_ddpm_training_t_range(ddpm_hp):
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    model = DiffSingerAcoustic(ddpm_hp, vocab_size=30, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.ones((2, 8), jnp.int32)
    mel2ph = jnp.asarray(np.repeat(np.arange(1, 9), 4)[None].repeat(2, 0).astype(np.int32))
    f0 = jnp.full((2, 32), 220.0, jnp.float32)
    gt_mel = jnp.asarray(np.random.default_rng(0).uniform(-10, -1, (2, 32, 16)).astype(np.float32))
    aux, (pred, noise, t) = model.forward_train(
        params, jax.random.PRNGKey(2), tokens, mel2ph, f0, gt_mel
    )
    # K_step-limited t range (ddpm.py:365)
    assert np.all(np.asarray(t) < ddpm_hp["K_step"])
    assert pred.shape == noise.shape == (2, 32, 16)


def test_melody_encoder_variance_path():
    from diffsinger_tpu.models.toplevel import DiffSingerVariance

    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"), save_snapshot=False)
    hp.update(
        hidden_size=32, enc_layers=1,
        use_melody_encoder=True, use_glide_embed=True,
        melody_encoder_args=dict(hidden_size=16, enc_layers=1),
        sampling_steps=2,
    )
    hp["dur_prediction_args"] = dict(hp["dur_prediction_args"], hidden_size=32, num_layers=2)
    hp["pitch_prediction_args"] = dict(
        hp["pitch_prediction_args"], repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )

    model = DiffSingerVariance(hp, vocab_size=30)
    params = model.init(jax.random.PRNGKey(0))

    b, t_ph, t_n, t_s = 1, 8, 4, 32
    tokens = jnp.ones((b, t_ph), jnp.int32)
    midi = jnp.full((b, t_ph), 60, jnp.int32)
    ph2word = jnp.asarray(np.repeat(np.arange(1, 5), 2)[None].astype(np.int32))
    word_dur = jnp.full((b, 4), 8.0, jnp.float32)
    base_pitch = jnp.full((b, t_s), 60.0, jnp.float32)
    note_midi = jnp.full((b, t_n), 60.0, jnp.float32)
    note_rest = jnp.zeros((b, t_n), bool)
    note_dur = jnp.full((b, t_n), 8, jnp.int32)
    note_glide = jnp.asarray([[0, 1, 2, 0]], jnp.int32)
    mel2note = jnp.asarray(np.repeat(np.arange(1, 5), 8)[None].astype(np.int32))

    dur_pred, pitch_pred, _ = model.forward_infer(
        params, jax.random.PRNGKey(1), tokens, midi, ph2word, base_pitch,
        word_dur=word_dur, note_midi=note_midi, note_rest=note_rest,
        note_dur=note_dur, note_glide=note_glide, mel2note=mel2note,
    )
    assert pitch_pred.shape == (b, t_s)
    assert np.isfinite(np.asarray(pitch_pred)).all()
    # glide embedding actually participates in the conditioning: the melody
    # encoder's output changes with glide. (The sampler output itself cannot
    # react with untrained weights — the denoiser's out-projection is
    # zero-initialized, reference wavenet.py:73.)
    m1 = model.module.apply(params, note_midi, note_rest, note_dur,
                            note_glide=note_glide, method="melody_encode")
    m0 = model.module.apply(params, note_midi, note_rest, note_dur,
                            note_glide=jnp.zeros((b, t_n), jnp.int32), method="melody_encode")
    assert float(jnp.abs(m1 - m0).max()) > 1e-6
