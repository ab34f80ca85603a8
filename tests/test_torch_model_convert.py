"""Cross-implementation parity: the ACTUAL reference torch models (imported
from /root/reference with its global hparams set) vs our JAX models with
converted weights — encoder condition, denoiser output, and aux decoder all
must agree. This is the checkpoint-migration guarantee (SURVEY.md §7.2#6)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

HP_ACOUSTIC = dict(
    hidden_size=64,
    enc_layers=2,
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
    use_energy_embed=True,
    use_breathiness_embed=False,
    use_voicing_embed=False,
    use_tension_embed=False,
    use_key_shift_embed=True,
    use_speed_embed=False,
    audio_num_mel_bins=16,
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
        aux_decoder_args=dict(num_channels=24, num_layers=2, kernel_size=7, dropout_rate=0.1),
        aux_decoder_grad=0.1,
    ),
    backbone_type="lynxnet",
    backbone_args=dict(num_channels=32, num_layers=2, kernel_size=31,
                       dropout_rate=0.0, strong_cond=True),
    sampling_algorithm="euler",
    sampling_steps=4,
    diff_accelerator="ddim",
    diff_speedup=10,
    infer=True,
)


def _stub_lightning():
    """The reference's utils package imports lightning at module scope; stub the
    handful of names it touches so the model code imports without it."""
    import types

    def mod(name):
        m = sys.modules.get(name) or types.ModuleType(name)
        sys.modules[name] = m
        return m

    lightning = mod("lightning")
    pl = mod("lightning.pytorch")
    lightning.pytorch = pl
    callbacks = mod("lightning.pytorch.callbacks")
    loggers = mod("lightning.pytorch.loggers")
    utilities = mod("lightning.pytorch.utilities")
    rank_zero = mod("lightning.pytorch.utilities.rank_zero")
    fabric = mod("lightning.fabric")
    fabric_loggers = mod("lightning.fabric.loggers")
    fabric_tb = mod("lightning.fabric.loggers.tensorboard")
    pl.callbacks = callbacks
    pl.loggers = loggers
    pl.utilities = utilities
    utilities.rank_zero = rank_zero
    lightning.fabric = fabric
    fabric.loggers = fabric_loggers
    fabric_loggers.tensorboard = fabric_tb

    class _Stub:
        def __init__(self, *a, **k):
            pass

    callbacks.ModelCheckpoint = type("ModelCheckpoint", (_Stub,), {})
    callbacks.TQDMProgressBar = type("TQDMProgressBar", (_Stub,), {})
    loggers.TensorBoardLogger = type("TensorBoardLogger", (_Stub,), {})
    rank_zero.rank_zero_info = print
    rank_zero.rank_zero_only = lambda f: f
    fabric_tb._TENSORBOARD_AVAILABLE = False


@pytest.fixture(scope="module")
def ref_modules():
    _stub_lightning()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils.hparams import hparams as ref_hparams

    ref_hparams.clear()
    ref_hparams.update(HP_ACOUSTIC)
    import modules.toplevel as ref_toplevel

    return ref_toplevel, ref_hparams


def test_acoustic_checkpoint_conversion_parity(ref_modules):
    ref_toplevel, ref_hparams = ref_modules
    torch.manual_seed(0)
    tmodel = ref_toplevel.DiffSingerAcoustic(vocab_size=30, out_dims=16)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.torch_model_convert import convert_acoustic

    hp = dict(HP_ACOUSTIC)
    jmodel = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    params = jax.tree.map(jnp.asarray, convert_acoustic(tmodel.state_dict(), hp))

    # check converted tree matches the init tree structurally
    init_params = jmodel.init(jax.random.PRNGKey(0))
    init_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(init_params)}
    conv_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert conv_paths == init_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:5]} extra: {sorted(conv_paths - init_paths)[:5]}"
    )

    rng = np.random.default_rng(0)
    B, T_TXT, T_MEL = 2, 12, 48
    tokens = np.zeros((B, T_TXT), np.int64)
    tokens[:, :10] = rng.integers(1, 29, (B, 10))
    mel2ph = np.zeros((B, T_MEL), np.int64)
    mel2ph[:, :40] = np.repeat(np.arange(1, 11), 4)[None]
    f0 = np.full((B, T_MEL), 220.0, np.float32)
    energy = rng.uniform(-60, -20, (B, T_MEL)).astype(np.float32)
    key_shift = np.zeros((B, 1), np.float32)

    with torch.no_grad():
        t_cond = tmodel.fs2(
            torch.from_numpy(tokens), torch.from_numpy(mel2ph), torch.from_numpy(f0),
            energy=torch.from_numpy(energy), key_shift=torch.from_numpy(key_shift),
        ).numpy()

    j_cond = np.asarray(jmodel.module.apply(
        params, jnp.asarray(tokens, jnp.int32), jnp.asarray(mel2ph, jnp.int32),
        jnp.asarray(f0), key_shift=jnp.asarray(key_shift),
        variances={"energy": jnp.asarray(energy)}, method="encode",
    ))
    np.testing.assert_allclose(j_cond, t_cond, atol=2e-4)

    # denoiser parity: x [B,1,M,T] torch vs [B,T,M] ours; cond [B,H,T] vs [B,T,H]
    x = rng.standard_normal((B, T_MEL, 16)).astype(np.float32)
    tstep = np.array([400.0, 100.0], np.float32)
    with torch.no_grad():
        t_out = tmodel.diffusion.velocity_fn(
            torch.from_numpy(x.transpose(0, 2, 1))[:, None],
            torch.from_numpy(tstep),
            torch.from_numpy(t_cond.transpose(0, 2, 1)),
        ).numpy()[:, 0].transpose(0, 2, 1)
    j_out = np.asarray(jmodel.module.apply(
        params, jnp.asarray(x), jnp.asarray(tstep), jnp.asarray(j_cond), method="denoise"
    ))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4)

    # aux decoder parity
    with torch.no_grad():
        t_aux = tmodel.aux_decoder(torch.from_numpy(t_cond), infer=True).numpy()
    j_aux = np.asarray(jmodel.module.apply(params, jnp.asarray(j_cond), infer=True, method="aux"))
    np.testing.assert_allclose(j_aux, t_aux, atol=2e-4)


def test_variance_checkpoint_conversion_parity(ref_modules):
    ref_toplevel, ref_hparams = ref_modules
    hp = dict(HP_ACOUSTIC)
    hp.update(
        predict_dur=True,
        predict_pitch=True,
        predict_energy=True,
        predict_breathiness=False,
        predict_voicing=False,
        predict_tension=False,
        use_melody_encoder=False,
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
        energy_db_min=-96.0, energy_db_max=-12.0,
        use_glide_embed=False, glide_types=["up", "down"],
    )
    ref_hparams.clear()
    ref_hparams.update(hp)
    torch.manual_seed(1)
    tmodel = ref_toplevel.DiffSingerVariance(vocab_size=30)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.torch_model_convert import convert_variance

    jmodel = DiffSingerVariance(hp, vocab_size=30)
    params = jax.tree.map(jnp.asarray, convert_variance(tmodel.state_dict(), hp))
    init_params = jmodel.init(jax.random.PRNGKey(0))
    init_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(init_params)}
    conv_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert conv_paths == init_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:5]} extra: {sorted(conv_paths - init_paths)[:5]}"
    )

    rng = np.random.default_rng(0)
    B, T_PH = 2, 8
    tokens = np.zeros((B, T_PH), np.int64)
    tokens[:, :6] = rng.integers(1, 29, (B, 6))
    midi = np.full((B, T_PH), 60, np.int64)
    ph2word = np.zeros((B, T_PH), np.int64)
    ph2word[:, :6] = np.array([1, 1, 2, 2, 3, 3])
    ph_dur = np.zeros((B, T_PH), np.int64)
    ph_dur[:, :6] = 5

    with torch.no_grad():
        t_enc, t_dur = tmodel.fs2(
            torch.from_numpy(tokens), torch.from_numpy(midi), torch.from_numpy(ph2word),
            ph_dur=torch.from_numpy(ph_dur), infer=True,
        )
    j_enc, j_dur = jmodel.module.apply(
        params, jnp.asarray(tokens, jnp.int32), jnp.asarray(midi, jnp.int32),
        jnp.asarray(ph2word, jnp.int32), ph_dur=jnp.asarray(ph_dur, jnp.int32),
        infer=True, method="encode",
    )
    np.testing.assert_allclose(np.asarray(j_enc), t_enc.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_dur), t_dur.numpy(), atol=2e-3)


def test_inference_loader_autoconverts_torch_ckpt(ref_modules, tmp_path):
    """A reference-format Lightning checkpoint in the work dir is auto-converted
    by the inference loader when no native .dsckpt exists."""
    ref_toplevel, ref_hparams = ref_modules
    ref_hparams.clear()
    ref_hparams.update(HP_ACOUSTIC)
    torch.manual_seed(3)
    tmodel = ref_toplevel.DiffSingerAcoustic(vocab_size=30, out_dims=16)
    state = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    work_dir = tmp_path / "exp"
    work_dir.mkdir()
    torch.save({"state_dict": state, "global_step": 777}, work_dir / "model_ckpt_steps_777.ckpt")

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import load_params_for_inference

    hp = dict(HP_ACOUSTIC)
    jmodel = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    template = jmodel.init(jax.random.PRNGKey(0))
    params, meta = load_params_for_inference(
        work_dir, template, category="acoustic", hparams=hp
    )
    assert meta["global_step"] == 777
    # spot-check one tensor matches the torch source
    golden = tmodel.state_dict()["fs2.txt_embed.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["params"]["fs2"]["txt_embed"]["embedding"]), golden
    )


def test_e2e_mel_mae_vs_reference(ref_modules):
    """THE north-star check (BASELINE.md): full acoustic inference
    (encoder -> aux draft -> shallow reflow sampling) with converted weights and
    IDENTICAL injected noise must match the reference within mel MAE <= 1e-3."""
    ref_toplevel, ref_hparams = ref_modules
    ref_hparams.clear()
    ref_hparams.update(HP_ACOUSTIC)
    torch.manual_seed(5)
    tmodel = ref_toplevel.DiffSingerAcoustic(vocab_size=30, out_dims=16)
    tmodel.eval()

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.torch_model_convert import convert_acoustic

    hp = dict(HP_ACOUSTIC)
    jmodel = DiffSingerAcoustic(hp, vocab_size=30, out_dims=16)
    params = jax.tree.map(jnp.asarray, convert_acoustic(tmodel.state_dict(), hp))

    rng = np.random.default_rng(11)
    B, T_TXT, T_MEL = 1, 10, 40
    tokens = rng.integers(1, 29, (B, T_TXT)).astype(np.int64)
    mel2ph = np.repeat(np.arange(1, 11), 4)[None].astype(np.int64)
    f0 = np.full((B, T_MEL), 220.0, np.float32)
    energy = rng.uniform(-60, -20, (B, T_MEL)).astype(np.float32)
    key_shift = np.zeros((B, 1), np.float32)
    noise = rng.standard_normal((B, 1, 16, T_MEL)).astype(np.float32)  # torch layout

    # reference inference with the SAME noise injected (patch torch.randn)
    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (B, 1, 16, T_MEL):
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
                f0=torch.from_numpy(f0), energy=torch.from_numpy(energy),
                key_shift=torch.from_numpy(key_shift), infer=True,
            )
    finally:
        torch.randn = real_randn
    ref_mel = ref_out.diff_out.numpy()

    # ours with the same noise in our [B, T, M] layout
    out = jmodel.forward_infer(
        params, jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), jnp.asarray(mel2ph, jnp.int32), jnp.asarray(f0),
        key_shift=jnp.asarray(key_shift),
        variances={"energy": jnp.asarray(energy)},
        noise=jnp.asarray(noise[:, 0].transpose(0, 2, 1)),
        steps=HP_ACOUSTIC["sampling_steps"],
    )
    our_mel = np.asarray(out.diff_out)
    mae = np.abs(our_mel - ref_mel).mean()
    assert mae <= 1e-3, f"e2e mel MAE vs reference: {mae}"
    print(f"e2e mel MAE vs reference: {mae:.2e}")
