"""PRODUCTION-SHAPE parity vs the ACTUAL reference torch models.

test_torch_model_convert.py proves the conversion + e2e pipeline at toy scale
(hidden-64, 16 mel bins, T=40). This module re-proves the north-star claim at
the SHIPPED production configuration — the shapes a real user trains and
serves (reference configs/acoustic.yaml:61-89 + configs/base.yaml:26-32,
configs/variance.yaml:42-72):

- acoustic: hidden-256 RoPE encoder (4 layers), LynxNet 6x1024 k31 denoiser,
  ConvNeXt 512x6 aux decoder, 128 mel bins, shallow T_start 0.4,
  * rectified flow, euler, 20 steps          (shipped default), AND
  * DDPM, ddim accelerator, K_step_infer 400 / speedup 10 = 40 steps
    (the reference's alternate diffusion_type, configs/acoustic.yaml:61)
- variance: hidden-256 encoder, FS2 dur head 512x5, pitch head
  WaveNet 20x256 (dilation cycle 5) over 64 repeat bins, rectified flow.

Identical noise is injected on both sides; mel MAE must be <= 1e-3 (the
BASELINE.md bound). Run with DS_RECORD_PARITY=1 to (re)write
docs/perf/parity_production.json from the measured MAEs.

Marked slow: several minutes of single-core CPU fwd passes at real widths.
"""

import json
import os
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

from test_torch_model_convert import _stub_lightning  # noqa: E402

# Shipped production acoustic config (reference configs/base.yaml:26-32 +
# configs/acoustic.yaml:40-103; embeds all default-false in the shipped file).
HP_PROD_ACOUSTIC = dict(
    hidden_size=256,
    enc_layers=4,
    num_heads=2,
    enc_ffn_kernel_size=3,
    ffn_act="gelu",
    dropout=0.1,
    use_pos_embed=True,
    rel_pos=True,
    use_rope=True,
    use_lang_id=False,
    num_lang=1,
    use_spk_id=False,
    num_spk=1,
    use_energy_embed=False,
    use_breathiness_embed=False,
    use_voicing_embed=False,
    use_tension_embed=False,
    use_key_shift_embed=False,
    use_speed_embed=False,
    audio_num_mel_bins=128,
    diffusion_type="reflow",
    T_start=0.4,
    T_start_infer=0.4,
    K_step=400,
    K_step_infer=400,
    timesteps=1000,
    max_beta=0.02,
    schedule_type="linear",
    time_scale_factor=1000,
    spec_min=[-12],
    spec_max=[0],
    use_shallow_diffusion=True,
    shallow_diffusion_args=dict(
        train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
        aux_decoder_arch="convnext",
        aux_decoder_args=dict(num_channels=512, num_layers=6, kernel_size=7,
                              dropout_rate=0.1),
        aux_decoder_grad=0.1,
    ),
    backbone_type="lynxnet",
    backbone_args=dict(num_channels=1024, num_layers=6, kernel_size=31,
                       dropout_rate=0.0, strong_cond=True),
    sampling_algorithm="euler",
    sampling_steps=20,
    diff_accelerator="ddim",
    diff_speedup=10,
    infer=True,
)

VOCAB = 64
B, T_TXT, T_MEL = 1, 40, 320
MEL_BINS = 128

_RESULTS = {}


@pytest.fixture(scope="module")
def ref_toplevel():
    _stub_lightning()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import modules.toplevel as ref_toplevel

    return ref_toplevel


def _ref_hparams():
    from utils.hparams import hparams as ref_hparams

    return ref_hparams


def _acoustic_inputs(rng):
    tokens = rng.integers(1, VOCAB - 2, (B, T_TXT)).astype(np.int64)
    mel2ph = np.repeat(np.arange(1, T_TXT + 1), T_MEL // T_TXT)[None].astype(np.int64)
    # a plausible sung pitch contour: slow glide + vibrato
    t = np.linspace(0, 1, T_MEL, dtype=np.float32)
    f0 = (220.0 * 2 ** (t * 5 / 12) * (1 + 0.02 * np.sin(2 * np.pi * 6 * t)))[None]
    noise = rng.standard_normal((B, 1, MEL_BINS, T_MEL)).astype(np.float32)
    return tokens, mel2ph, f0.astype(np.float32), noise


def _run_acoustic_pair(ref_toplevel, hp, seed, spk_mix=False):
    """Build reference + converted JAX acoustic models at production shape,
    run both e2e inferences with identical injected noise, return MAE stats.

    ``spk_mix=True`` additionally feeds an identical per-frame 2-speaker mix
    embedding to both sides (reference acoustic_encoder.py:103-107)."""
    ref_hparams = _ref_hparams()
    ref_hparams.clear()
    ref_hparams.update(hp)
    torch.manual_seed(seed)
    tmodel = ref_toplevel.DiffSingerAcoustic(vocab_size=VOCAB, out_dims=MEL_BINS)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.torch_model_convert import convert_acoustic

    jmodel = DiffSingerAcoustic(hp, vocab_size=VOCAB, out_dims=MEL_BINS)
    params = jax.tree.map(jnp.asarray, convert_acoustic(tmodel.state_dict(), hp))

    rng = np.random.default_rng(seed)
    tokens, mel2ph, f0, noise = _acoustic_inputs(rng)

    extra_t, extra_j = {}, {}
    if spk_mix:
        # dynamic 2-speaker cross-fade over the segment, computed ONCE from
        # the torch embedding table and fed to both sides (the reference's
        # spk_mix_embed kwarg contract, basics/base_svs_infer.py usage)
        emb = tmodel.fs2.spk_embed.weight.detach().numpy()
        w = np.linspace(0.0, 1.0, T_MEL, dtype=np.float32)[None, :, None]
        mix = (1 - w) * emb[1][None, None, :] + w * emb[2][None, None, :]
        extra_t["spk_mix_embed"] = torch.from_numpy(mix)
        extra_j["spk_mix_embed"] = jnp.asarray(mix)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (B, 1, MEL_BINS, T_MEL):
            # .copy(): the reference's euler step mutates x IN-PLACE (x += v*dt);
            # with a pure-noise start x aliases this tensor, and from_numpy
            # shares the numpy buffer — our sampler would then read back
            # MUTATED noise instead of the injected draw
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            ref_out = tmodel(
                torch.from_numpy(tokens), mel2ph=torch.from_numpy(mel2ph),
                f0=torch.from_numpy(f0), infer=True, **extra_t,
            )
    finally:
        torch.randn = real_randn
    ref_mel = ref_out.diff_out.numpy()
    ref_aux = ref_out.aux_out.numpy()

    out = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(mel2ph, jnp.int32),
        jnp.asarray(f0),
        noise=jnp.asarray(noise[:, 0].transpose(0, 2, 1)), **extra_j,
    )
    aux_mae = float(np.abs(np.asarray(out.aux_out) - ref_aux).mean())
    mel_mae = float(np.abs(np.asarray(out.diff_out) - ref_mel).mean())
    return {"aux_mae": aux_mae, "mel_mae": mel_mae,
            "mel_range": [float(ref_mel.min()), float(ref_mel.max())]}


def test_production_acoustic_reflow_mel_mae(ref_toplevel):
    """Shipped default: rectified flow, euler, 20 steps, shallow start 0.4."""
    stats = _run_acoustic_pair(ref_toplevel, dict(HP_PROD_ACOUSTIC), seed=7)
    _RESULTS["acoustic_reflow_euler20"] = stats
    print(f"production reflow: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_acoustic_ddpm_ddim_mel_mae(ref_toplevel):
    """The alternate family: DDPM with the ddim accelerator at speedup 10
    (K_step_infer 400 -> 40 ddim iterations), same production widths."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(diffusion_type="ddpm")
    stats = _run_acoustic_pair(ref_toplevel, hp, seed=8)
    _RESULTS["acoustic_ddpm_ddim40"] = stats
    print(f"production ddpm/ddim: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_acoustic_dpm_solver_mel_mae(ref_toplevel):
    """DPM-Solver++(2M) accelerator at speedup 10 (K_step_infer 400 -> 40
    evals), production widths (reference modules/core/ddpm.py:246-286)."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(diffusion_type="ddpm", diff_accelerator="dpm-solver", diff_speedup=10)
    stats = _run_acoustic_pair(ref_toplevel, hp, seed=10)
    _RESULTS["acoustic_ddpm_dpmpp2m_40"] = stats
    print(f"production dpm-solver++: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_acoustic_unipc_mel_mae(ref_toplevel):
    """UniPC(bh2) accelerator on a 100-step grid (speedup 4), production
    widths (reference modules/core/ddpm.py:288-322)."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(diffusion_type="ddpm", diff_accelerator="unipc", diff_speedup=4)
    stats = _run_acoustic_pair(ref_toplevel, hp, seed=11)
    _RESULTS["acoustic_ddpm_unipc_100"] = stats
    print(f"production unipc: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_acoustic_pndm_mel_mae(ref_toplevel):
    """PNDM accelerator at speedup 10, production widths (reference
    modules/core/ddpm.py:199-244 pndm branch)."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(diffusion_type="ddpm", diff_accelerator="pndm", diff_speedup=10)
    stats = _run_acoustic_pair(ref_toplevel, hp, seed=12)
    _RESULTS["acoustic_ddpm_pndm_40"] = stats
    print(f"production pndm: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_acoustic_spk_mix_mel_mae(ref_toplevel):
    """2-speaker dynamic mix at production widths: an identical per-frame
    cross-fade embedding feeds both sides through the spk_mix_embed kwarg
    (reference modules/fastspeech/acoustic_encoder.py:103-107)."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(use_spk_id=True, num_spk=4)
    stats = _run_acoustic_pair(ref_toplevel, hp, seed=13, spk_mix=True)
    _RESULTS["acoustic_reflow_spkmix2"] = stats
    print(f"production spk-mix: aux MAE {stats['aux_mae']:.2e} "
          f"mel MAE {stats['mel_mae']:.2e}")
    assert stats["aux_mae"] <= 1e-3
    assert stats["mel_mae"] <= 1e-3


def test_production_variance_pitch_mae(ref_toplevel):
    """Variance at production shape (reference configs/variance.yaml:30-72):
    pitch head WaveNet 20x256 dilation-cycle 5 over 64 repeat bins; the full
    pitch inference (encoder -> frame condition -> reflow sampling -> denorm)
    with identical injected noise must agree."""
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(
        predict_dur=True,
        predict_pitch=True,
        predict_energy=False,
        predict_breathiness=False,
        predict_voicing=False,
        predict_tension=False,
        use_melody_encoder=False,
        dur_prediction_args=dict(
            arch="fs2", hidden_size=512, dropout=0.1, num_layers=5,
            kernel_size=3, log_offset=1.0, loss_type="mse",
            lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
        ),
        pitch_prediction_args=dict(
            pitd_norm_min=-8.0, pitd_norm_max=8.0,
            pitd_clip_min=-12.0, pitd_clip_max=12.0,
            repeat_bins=64, backbone_type="wavenet",
            backbone_args=dict(num_layers=20, num_channels=256,
                               dilation_cycle_length=5),
        ),
        variances_prediction_args=dict(
            total_repeat_bins=48, backbone_type="wavenet",
            backbone_args=dict(num_layers=10, num_channels=192,
                               dilation_cycle_length=4),
        ),
        energy_db_min=-96.0, energy_db_max=-12.0,
        use_glide_embed=False, glide_types=["up", "down"],
        K_step=1000, K_step_infer=1000, main_loss_log_norm=True,
        # variance models run the full trajectory — no shallow diffusion
        # (reference configs/variance.yaml has no use_shallow_diffusion key)
        use_shallow_diffusion=False, T_start=0.0, T_start_infer=0.0,
    )
    ref_hparams = _ref_hparams()
    ref_hparams.clear()
    ref_hparams.update(hp)
    torch.manual_seed(9)
    tmodel = ref_toplevel.DiffSingerVariance(vocab_size=VOCAB)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.torch_model_convert import convert_variance

    jmodel = DiffSingerVariance(hp, vocab_size=VOCAB)
    params = jax.tree.map(jnp.asarray, convert_variance(tmodel.state_dict(), hp))

    rng = np.random.default_rng(9)
    n_ph = 24
    tokens = np.zeros((B, n_ph), np.int64)
    tokens[:, : n_ph - 2] = rng.integers(1, VOCAB - 2, (B, n_ph - 2))
    midi = rng.integers(48, 72, (B, n_ph)).astype(np.int64)
    ph2word = np.zeros((B, n_ph), np.int64)
    ph2word[:, : n_ph - 2] = np.repeat(np.arange(1, (n_ph - 2) // 2 + 1), 2)
    ph_dur = np.zeros((B, n_ph), np.int64)
    ph_dur[:, : n_ph - 2] = T_MEL // (n_ph - 2)
    ph_dur[:, 0] += T_MEL - ph_dur.sum()
    mel2ph = np.zeros((B, T_MEL), np.int64)
    pos = 0
    for i in range(n_ph):
        mel2ph[:, pos: pos + int(ph_dur[0, i])] = i + 1
        pos += int(ph_dur[0, i])
    base_pitch = (60.0 + 3 * np.sin(np.linspace(0, 6, T_MEL, dtype=np.float32)))[None]
    noise = rng.standard_normal((B, 1, 64, T_MEL)).astype(np.float32)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (B, 1, 64, T_MEL):
            # .copy(): the reference's euler step mutates x IN-PLACE (x += v*dt);
            # with a pure-noise start x aliases this tensor, and from_numpy
            # shares the numpy buffer — our sampler would then read back
            # MUTATED noise instead of the injected draw
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            t_dur, t_pitch, _ = tmodel(
                torch.from_numpy(tokens), torch.from_numpy(midi),
                torch.from_numpy(ph2word), ph_dur=torch.from_numpy(ph_dur),
                mel2ph=torch.from_numpy(mel2ph),
                base_pitch=torch.from_numpy(base_pitch), infer=True,
            )
    finally:
        torch.randn = real_randn

    j_dur, j_pitch, _ = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(midi, jnp.int32),
        jnp.asarray(ph2word, jnp.int32), jnp.asarray(base_pitch),
        ph_dur=jnp.asarray(ph_dur, jnp.int32),
        mel2ph=jnp.asarray(mel2ph, jnp.int32),
        noise_pitch=jnp.asarray(noise[:, 0].transpose(0, 2, 1)),
    )
    dur_mae = float(np.abs(np.asarray(j_dur) - t_dur.numpy()).mean())
    pitch_mae = float(np.abs(np.asarray(j_pitch) - t_pitch.numpy()).mean())
    _RESULTS["variance_pitch_wavenet20x256"] = {
        "dur_mae": dur_mae, "pitch_mae": pitch_mae,
        "pitch_range": [float(t_pitch.min()), float(t_pitch.max())],
    }
    print(f"production variance: dur MAE {dur_mae:.2e} pitch MAE {pitch_mae:.2e}")
    assert dur_mae <= 1e-3
    # pitch delta is in semitones over a [-8, 8] norm range; the mel bound
    # applies (same 1e-3 absolute criterion as the reference mel check)
    assert pitch_mae <= 1e-3


def _variance_inputs(rng, n_ph=24):
    tokens = np.zeros((B, n_ph), np.int64)
    tokens[:, : n_ph - 2] = rng.integers(1, VOCAB - 2, (B, n_ph - 2))
    midi = rng.integers(48, 72, (B, n_ph)).astype(np.int64)
    ph2word = np.zeros((B, n_ph), np.int64)
    ph2word[:, : n_ph - 2] = np.repeat(np.arange(1, (n_ph - 2) // 2 + 1), 2)
    ph_dur = np.zeros((B, n_ph), np.int64)
    ph_dur[:, : n_ph - 2] = T_MEL // (n_ph - 2)
    ph_dur[:, 0] += T_MEL - ph_dur.sum()
    mel2ph = np.zeros((B, T_MEL), np.int64)
    pos = 0
    for i in range(n_ph):
        mel2ph[:, pos: pos + int(ph_dur[0, i])] = i + 1
        pos += int(ph_dur[0, i])
    base_pitch = (60.0 + 3 * np.sin(np.linspace(0, 6, T_MEL, dtype=np.float32)))[None]
    return tokens, midi, ph2word, ph_dur, mel2ph, base_pitch


def _prod_variance_hp():
    hp = dict(HP_PROD_ACOUSTIC)
    hp.update(
        predict_dur=True, predict_pitch=False,
        predict_energy=False, predict_breathiness=False,
        predict_voicing=False, predict_tension=False,
        use_melody_encoder=False,
        dur_prediction_args=dict(
            arch="fs2", hidden_size=512, dropout=0.1, num_layers=5,
            kernel_size=3, log_offset=1.0, loss_type="mse",
            lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
        ),
        pitch_prediction_args=dict(
            pitd_norm_min=-8.0, pitd_norm_max=8.0,
            pitd_clip_min=-12.0, pitd_clip_max=12.0,
            repeat_bins=64, backbone_type="wavenet",
            backbone_args=dict(num_layers=20, num_channels=256,
                               dilation_cycle_length=5),
        ),
        variances_prediction_args=dict(
            total_repeat_bins=48, backbone_type="wavenet",
            backbone_args=dict(num_layers=10, num_channels=192,
                               dilation_cycle_length=4),
        ),
        energy_db_min=-96.0, energy_db_max=-12.0,
        breathiness_db_min=-96.0, breathiness_db_max=-20.0,
        use_glide_embed=False, glide_types=["up", "down"],
        K_step=1000, K_step_infer=1000, main_loss_log_norm=True,
        use_shallow_diffusion=False, T_start=0.0, T_start_infer=0.0,
    )
    return hp


def test_production_variance_multi_mae(ref_toplevel):
    """The MultiVariance head at production shape with TWO enabled variances
    (energy + breathiness; WaveNet 10x192 dc4 over total_repeat_bins 48, so
    2 feats x 24 bins — reference modules/core/ddpm.py:448-505 +
    configs/variance.yaml:89-95): full from-scratch inference with identical
    injected noise; both predicted curves must agree <=1e-3 (dB scale)."""
    hp = _prod_variance_hp()
    hp.update(predict_energy=True, predict_breathiness=True)
    ref_hparams = _ref_hparams()
    ref_hparams.clear()
    ref_hparams.update(hp)
    torch.manual_seed(14)
    tmodel = ref_toplevel.DiffSingerVariance(vocab_size=VOCAB)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.torch_model_convert import convert_variance

    jmodel = DiffSingerVariance(hp, vocab_size=VOCAB)
    params = jax.tree.map(jnp.asarray, convert_variance(tmodel.state_dict(), hp))

    rng = np.random.default_rng(14)
    tokens, midi, ph2word, ph_dur, mel2ph, base_pitch = _variance_inputs(rng)
    # gt pitch provided (predict_pitch off): vibrato over the base curve
    pitch = base_pitch + 0.4 * np.sin(
        np.linspace(0, 40, T_MEL, dtype=np.float32))[None]
    noise = rng.standard_normal((B, 2, 24, T_MEL)).astype(np.float32)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (B, 2, 24, T_MEL):
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            t_dur, _, t_vars = tmodel(
                torch.from_numpy(tokens), torch.from_numpy(midi),
                torch.from_numpy(ph2word), ph_dur=torch.from_numpy(ph_dur),
                mel2ph=torch.from_numpy(mel2ph),
                base_pitch=torch.from_numpy(base_pitch),
                pitch=torch.from_numpy(pitch), infer=True,
            )
    finally:
        torch.randn = real_randn

    j_dur, _, j_vars = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(midi, jnp.int32),
        jnp.asarray(ph2word, jnp.int32), jnp.asarray(base_pitch),
        ph_dur=jnp.asarray(ph_dur, jnp.int32),
        mel2ph=jnp.asarray(mel2ph, jnp.int32),
        pitch=jnp.asarray(pitch),
        # torch [B, F, rb, T] -> flat [B, T, F*rb] (SpecTransform.flatten order)
        noise_variances=jnp.asarray(
            noise.transpose(0, 3, 1, 2).reshape(B, T_MEL, 48)),
    )
    dur_mae = float(np.abs(np.asarray(j_dur) - t_dur.numpy()).mean())
    maes = {}
    for name in ("energy", "breathiness"):
        maes[name] = float(np.abs(
            np.asarray(j_vars[name]) - t_vars[name].numpy()).mean())
    _RESULTS["variance_multi_energy_breathiness_48"] = {
        "dur_mae": dur_mae, **{f"{k}_mae": v for k, v in maes.items()},
    }
    print(f"production multi-variance: dur MAE {dur_mae:.2e} " +
          " ".join(f"{k} MAE {v:.2e}" for k, v in maes.items()))
    assert dur_mae <= 1e-3
    for name, mae in maes.items():
        assert mae <= 1e-3, (name, mae)


def test_production_variance_melody_glide_pitch_mae(ref_toplevel):
    """Melody encoder + glide embedding at production shape (reference
    modules/fastspeech/variance_encoder.py:102-148, configs/variance.yaml:51-56:
    melody hidden 128 x 4 layers, glide_embed_scale sqrt(128)); full pitch
    inference through the delta-pitch path with identical injected noise."""
    hp = _prod_variance_hp()
    hp.update(
        predict_pitch=True,
        use_melody_encoder=True,
        melody_encoder_args=dict(hidden_size=128, enc_layers=4),
        use_glide_embed=True,
        glide_embed_scale=11.313708498984760,
    )
    ref_hparams = _ref_hparams()
    ref_hparams.clear()
    ref_hparams.update(hp)
    torch.manual_seed(15)
    tmodel = ref_toplevel.DiffSingerVariance(vocab_size=VOCAB)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.torch_model_convert import convert_variance

    jmodel = DiffSingerVariance(hp, vocab_size=VOCAB)
    params = jax.tree.map(jnp.asarray, convert_variance(tmodel.state_dict(), hp))

    rng = np.random.default_rng(15)
    tokens, midi, ph2word, ph_dur, mel2ph, base_pitch = _variance_inputs(rng)
    n_note = 12
    note_midi = rng.integers(50, 70, (B, n_note)).astype(np.float32)
    note_rest = np.zeros((B, n_note), bool)
    note_rest[:, 0] = True
    note_midi[:, 0] = -1.0  # rest/padding slot (reference convention)
    note_dur = np.full((B, n_note), T_MEL // n_note, np.int64)
    note_dur[:, 0] += T_MEL - note_dur.sum()
    mel2note = np.zeros((B, T_MEL), np.int64)
    pos = 0
    for i in range(n_note):
        mel2note[:, pos: pos + int(note_dur[0, i])] = i + 1
        pos += int(note_dur[0, i])
    note_glide = rng.integers(0, 3, (B, n_note)).astype(np.int64)
    noise = rng.standard_normal((B, 1, 64, T_MEL)).astype(np.float32)

    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (B, 1, 64, T_MEL):
            return torch.from_numpy(noise.copy())
        return real_randn(*shape, **kw)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            t_dur, t_pitch, _ = tmodel(
                torch.from_numpy(tokens), torch.from_numpy(midi),
                torch.from_numpy(ph2word), ph_dur=torch.from_numpy(ph_dur),
                mel2ph=torch.from_numpy(mel2ph),
                note_midi=torch.from_numpy(note_midi),
                note_rest=torch.from_numpy(note_rest),
                note_dur=torch.from_numpy(note_dur),
                note_glide=torch.from_numpy(note_glide),
                mel2note=torch.from_numpy(mel2note),
                base_pitch=torch.from_numpy(base_pitch), infer=True,
            )
    finally:
        torch.randn = real_randn

    j_dur, j_pitch, _ = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(midi, jnp.int32),
        jnp.asarray(ph2word, jnp.int32), jnp.asarray(base_pitch),
        ph_dur=jnp.asarray(ph_dur, jnp.int32),
        mel2ph=jnp.asarray(mel2ph, jnp.int32),
        note_midi=jnp.asarray(note_midi),
        note_rest=jnp.asarray(note_rest),
        note_dur=jnp.asarray(note_dur, jnp.int32),
        note_glide=jnp.asarray(note_glide, jnp.int32),
        mel2note=jnp.asarray(mel2note, jnp.int32),
        noise_pitch=jnp.asarray(noise[:, 0].transpose(0, 2, 1)),
    )
    dur_mae = float(np.abs(np.asarray(j_dur) - t_dur.numpy()).mean())
    pitch_mae = float(np.abs(np.asarray(j_pitch) - t_pitch.numpy()).mean())
    _RESULTS["variance_melody_glide_pitch"] = {
        "dur_mae": dur_mae, "pitch_mae": pitch_mae,
    }
    print(f"production melody+glide: dur MAE {dur_mae:.2e} "
          f"pitch MAE {pitch_mae:.2e}")
    assert dur_mae <= 1e-3
    assert pitch_mae <= 1e-3


@pytest.fixture(scope="module", autouse=True)
def _record_results():
    yield
    if not os.environ.get("DS_RECORD_PARITY"):
        return
    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "perf" / "parity_production.json"
    payload = {
        "what": "e2e parity vs /root/reference torch models at the SHIPPED "
                "production config, identical injected noise, fp32 CPU",
        "shapes": {"B": B, "T_mel": T_MEL, "mel_bins": MEL_BINS,
                   "hidden": 256, "denoiser": "lynxnet 6x1024 k31",
                   "aux": "convnext 512x6", "pitch_head": "wavenet 20x256 d5 rb64"},
        "bound": 1e-3,
        "results": _RESULTS,
    }
    out.write_text(json.dumps(payload, indent=2) + "\n")
