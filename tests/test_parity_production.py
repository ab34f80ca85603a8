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


def _run_acoustic_pair(ref_toplevel, hp, seed):
    """Build reference + converted JAX acoustic models at production shape,
    run both e2e inferences with identical injected noise, return MAE stats."""
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
                f0=torch.from_numpy(f0), infer=True,
            )
    finally:
        torch.randn = real_randn
    ref_mel = ref_out.diff_out.numpy()
    ref_aux = ref_out.aux_out.numpy()

    out = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(mel2ph, jnp.int32),
        jnp.asarray(f0),
        noise=jnp.asarray(noise[:, 0].transpose(0, 2, 1)),
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
