"""Generate the committed external-ONNX-verification fixtures.

Emits three small-but-real graphs through the SAME lowering pipeline the
exporters use (deployment/onnx/lowering.py) plus expected input/output pairs,
into tests/fixtures/onnx_external/:

- acoustic_sampler.onnx  — fs2 encoder + aux draft + shallow reflow sampler
  with runtime `depth`/`steps` (the deployed acoustic contract, reference
  deployment/modules/toplevel.py:83-102) — two (depth, steps) cases
- variance_pitch.onnx    — variance encoder + duration head + pitch reflow
  sampler (reference deployment/modules/toplevel.py:224-271 semantics)
- vocoder.onnx           — mini-NSF HiFi-GAN generator (canonical/unfolded)

Noise tensors are EXPLICIT graph inputs rather than RandomNormalLike so that
any runtime reproduces the expected outputs bit-for-bit up to float rounding;
the shipped bundles internalize noise for reference-signature parity, but a
cross-runtime numeric check needs determinism (see docs/onnx_ops.md).

Run `python tools/verify_onnx_external.py` (onnxruntime machine) or
`python tools/verify_onnx_external.py --engine interpreter` (this repo) to
check the fixtures; tests/test_onnx_external_fixtures.py keeps the committed
bytes + expectations green against the in-repo interpreter.
"""

import pathlib
import sys
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402

OUT_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "onnx_external"

HP_TINY_ACOUSTIC = dict(
    hidden_size=32,
    enc_layers=2,
    num_heads=2,
    enc_ffn_kernel_size=3,
    ffn_act="gelu",
    dropout=0.0,
    use_pos_embed=True,
    rel_pos=True,
    use_rope=True,
    use_lang_id=False, num_lang=1, use_spk_id=False, num_spk=1,
    use_energy_embed=False, use_breathiness_embed=False,
    use_voicing_embed=False, use_tension_embed=False,
    use_key_shift_embed=False, use_speed_embed=False,
    audio_num_mel_bins=16,
    diffusion_type="reflow",
    T_start=0.4, T_start_infer=0.4, K_step=400, K_step_infer=400,
    timesteps=1000, max_beta=0.02, schedule_type="linear",
    time_scale_factor=1000,
    spec_min=[-12], spec_max=[0],
    use_shallow_diffusion=True,
    shallow_diffusion_args=dict(
        train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
        aux_decoder_arch="convnext",
        aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                              dropout_rate=0.0),
        aux_decoder_grad=0.1,
    ),
    backbone_type="lynxnet",
    backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                       dropout_rate=0.0, strong_cond=True),
    sampling_algorithm="euler",
    sampling_steps=4,
    diff_accelerator="ddim", diff_speedup=10,
    infer=True,
)


def _perturb(params, scale=0.05, seed=7):
    """Fresh inits zero the denoiser output conv (sample == draft for any step
    count); perturb every float leaf so depth/steps matter."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _save_fixture(name, model_bytes, cases, atol, rtol):
    """cases: list of (inputs: dict[str, np.ndarray], outputs: list[np.ndarray])."""
    (OUT_DIR / f"{name}.onnx").write_bytes(model_bytes)
    arrays = {"meta/atol": np.float64(atol), "meta/rtol": np.float64(rtol),
              "meta/n_cases": np.int64(len(cases))}
    for k, (inputs, outputs) in enumerate(cases):
        for nm, v in inputs.items():
            arrays[f"case{k}/in/{nm}"] = np.asarray(v)
        for i, v in enumerate(outputs):
            arrays[f"case{k}/out/{i}"] = np.asarray(v)
    np.savez_compressed(OUT_DIR / f"{name}_io.npz", **arrays)
    print(f"{name}: {len(model_bytes)} bytes, {len(cases)} case(s)")


def make_acoustic():
    from diffsinger_tpu.deployment.onnx import export_onnx
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic

    hp = dict(HP_TINY_ACOUSTIC)
    model = DiffSingerAcoustic(hp, vocab_size=32, out_dims=16)
    params = _perturb(model.init(jax.random.PRNGKey(0)))

    def sampler(tokens, mel2ph, f0, depth, steps, noise):
        return model.forward_infer_dynamic(
            params, None, tokens, mel2ph, f0,
            depth=depth, steps=steps, noise=noise).diff_out

    rng = np.random.default_rng(0)
    B, T_TXT, T_MEL = 1, 12, 64
    tokens = np.zeros((B, T_TXT), np.int32)
    tokens[0, :10] = rng.integers(1, 30, 10)
    mel2ph = np.zeros((B, T_MEL), np.int32)
    mel2ph[0, :60] = np.repeat(np.arange(1, 11), 6)
    f0 = np.full((B, T_MEL), 220.0, np.float32)
    noise = rng.standard_normal((B, T_MEL, 16)).astype(np.float32)

    ex = (jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
          jnp.float32(0.4), jnp.int32(4), jnp.asarray(noise))
    data = export_onnx(
        sampler, ex, None, name="acoustic_sampler",
        input_names=["tokens", "mel2ph", "f0", "depth", "steps", "noise"])

    cases = []
    for depth, steps in ((0.4, 4), (0.2, 8)):
        out = sampler(jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
                      jnp.float32(depth), jnp.int32(steps), jnp.asarray(noise))
        cases.append((
            {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
             "depth": np.float32(depth), "steps": np.int32(steps), "noise": noise},
            [np.asarray(out)],
        ))
    _save_fixture("acoustic_sampler", data, cases, atol=5e-4, rtol=1e-3)


def make_variance():
    from diffsinger_tpu.deployment.onnx import export_onnx
    from diffsinger_tpu.models.toplevel import DiffSingerVariance

    hp = dict(HP_TINY_ACOUSTIC)
    hp.update(
        predict_dur=True, predict_pitch=True,
        predict_energy=False, predict_breathiness=False,
        predict_voicing=False, predict_tension=False,
        use_melody_encoder=False,
        dur_prediction_args=dict(
            arch="fs2", hidden_size=16, dropout=0.0, num_layers=1,
            kernel_size=3, log_offset=1.0, loss_type="mse",
            lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
        ),
        pitch_prediction_args=dict(
            pitd_norm_min=-8.0, pitd_norm_max=8.0,
            pitd_clip_min=-12.0, pitd_clip_max=12.0,
            repeat_bins=8, backbone_type="wavenet",
            backbone_args=dict(num_layers=2, num_channels=16,
                               dilation_cycle_length=2),
        ),
        variances_prediction_args=dict(
            total_repeat_bins=8, backbone_type="wavenet",
            backbone_args=dict(num_layers=2, num_channels=16,
                               dilation_cycle_length=2),
        ),
        energy_db_min=-96.0, energy_db_max=-12.0,
        use_glide_embed=False, glide_types=["up", "down"],
    )
    model = DiffSingerVariance(hp, vocab_size=32)
    params = _perturb(model.init(jax.random.PRNGKey(1)))

    def pitch_fn(tokens, midi, ph2word, ph_dur, mel2ph, base_pitch, noise):
        dur, pitch, _ = model.forward_infer(
            params, jax.random.PRNGKey(0), tokens, midi, ph2word, base_pitch,
            ph_dur=ph_dur, mel2ph=mel2ph, noise_pitch=noise,
            predict_variances=False, steps=4)
        return dur, pitch

    rng = np.random.default_rng(1)
    B, T_PH, T_MEL = 1, 8, 48
    tokens = np.zeros((B, T_PH), np.int32)
    tokens[0, :6] = rng.integers(1, 30, 6)
    midi = np.full((B, T_PH), 60, np.int32)
    ph2word = np.zeros((B, T_PH), np.int32)
    ph2word[0, :6] = np.array([1, 1, 2, 2, 3, 3])
    ph_dur = np.zeros((B, T_PH), np.int32)
    ph_dur[0, :6] = 8
    mel2ph = np.zeros((B, T_MEL), np.int32)
    mel2ph[0, :48] = np.repeat(np.arange(1, 7), 8)
    base_pitch = np.full((B, T_MEL), 60.0, np.float32)
    noise = rng.standard_normal((B, T_MEL, 8)).astype(np.float32)

    args = (jnp.asarray(tokens), jnp.asarray(midi), jnp.asarray(ph2word),
            jnp.asarray(ph_dur), jnp.asarray(mel2ph), jnp.asarray(base_pitch),
            jnp.asarray(noise))
    data = export_onnx(
        pitch_fn, args, None, name="variance_pitch",
        input_names=["tokens", "midi", "ph2word", "ph_dur", "mel2ph",
                     "base_pitch", "noise"])
    dur, pitch = pitch_fn(*args)
    cases = [(
        {"tokens": tokens, "midi": midi, "ph2word": ph2word, "ph_dur": ph_dur,
         "mel2ph": mel2ph, "base_pitch": base_pitch, "noise": noise},
        [np.asarray(dur), np.asarray(pitch)],
    )]
    _save_fixture("variance_pitch", data, cases, atol=5e-4, rtol=1e-3)


def make_vocoder():
    from diffsinger_tpu.deployment.onnx import export_onnx
    from diffsinger_tpu.vocoders.nsf_hifigan_model import Generator

    cfg = types.SimpleNamespace(
        num_mels=8, sampling_rate=44100,
        upsample_rates=[4, 4, 2, 2], upsample_kernel_sizes=[8, 8, 4, 4],
        upsample_initial_channel=32, resblock="1",
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        mini_nsf=True, noise_sigma=0.0, hop_size=64,
    )
    gen = Generator(cfg, fold_lanes=0)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 32, 8)).astype(np.float32)
    f0 = np.full((1, 32), 220.0, np.float32)
    params = gen.init(jax.random.PRNGKey(2), jnp.asarray(mel), jnp.asarray(f0))
    fn = lambda mel, f0: gen.apply(params, mel, f0)
    data = export_onnx(fn, (jnp.asarray(mel), jnp.asarray(f0)), None,
                       name="vocoder", input_names=["mel", "f0"])
    out = fn(jnp.asarray(mel), jnp.asarray(f0))
    cases = [({"mel": mel, "f0": f0}, [np.asarray(out)])]
    _save_fixture("vocoder", data, cases, atol=2e-4, rtol=1e-3)


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    make_acoustic()
    make_variance()
    make_vocoder()


if __name__ == "__main__":
    main()
