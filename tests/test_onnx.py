"""ONNX emission tests (self-contained emitter, deployment/onnx/).

onnx/onnxruntime are not installed here, so emitted models are validated by
round-tripping the serialized protobuf through the generic decoder and
executing with the numpy interpreter against live JAX outputs — covering the
wire format, the jaxpr lowering (incl. scan->Loop, convs, gather/scatter),
and the exporter integration (reference contract:
deployment/exporters/acoustic_exporter.py:104-113, OpenUTAU-style graphs).
"""

import pathlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.deployment.onnx import export_onnx, run_model
from diffsinger_tpu.deployment.onnx.builder import parse_model


def _check(fn, args, names, tol=1e-5, label="m"):
    from diffsinger_tpu.deployment.onnx.checker import check_model
    from diffsinger_tpu.deployment.onnx.lowering import EMITTED_OPS

    data = export_onnx(fn, args, None, name=label, input_names=list(names))
    # independent structural validation of every emission, restricted to
    # the documented op set (docs/onnx_ops.md)
    check_model(data, known_ops=EMITTED_OPS)
    got = run_model(data, dict(zip(names, [np.asarray(a) for a in args])))
    want = fn(*args)
    want = want if isinstance(want, (tuple, list)) else [want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol, rtol=tol)
    return data


def test_wire_roundtrip_and_structure():
    w = np.random.randn(8, 5).astype(np.float32)
    fn = lambda x: jnp.tanh(x @ w)
    data = export_onnx(fn, (np.random.randn(2, 8).astype(np.float32),), None,
                       name="probe", input_names=["x"], output_names=["y"])
    g = parse_model(data)
    assert g.name == "probe"
    assert g.inputs == ["x"] and g.outputs == ["y"]
    assert any(n.op_type == "MatMul" for n in g.nodes)
    assert any(n.op_type == "Tanh" for n in g.nodes)
    (init,) = [v for v in g.initializers.values() if v.shape == (8, 5)]
    np.testing.assert_array_equal(init, w)
    assert g.input_types["x"] == (np.dtype(np.float32), (2, 8))


def test_elementwise_and_broadcast():
    f = lambda x, y: jnp.tanh(x) * y + jnp.sqrt(jnp.abs(x)) - jax.nn.sigmoid(y)
    _check(f, (np.random.randn(3, 4).astype(np.float32),
               np.random.randn(4).astype(np.float32)), ["x", "y"])


def test_attention_softmax():
    q = np.random.randn(2, 4, 8, 8).astype(np.float32)
    k = np.random.randn(2, 4, 8, 8).astype(np.float32)
    f = lambda q, k: jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", q, k) / 8 ** 0.5, axis=-1)
    _check(f, (q, k), ["q", "k"])


def test_shape_ops_and_reductions():
    def f(x):
        a = x[:, 1:5][:, ::-1]
        b = jnp.pad(x, ((0, 0), (2, 1)))
        c = jnp.cumsum(x, axis=1)
        cat = jnp.concatenate([a, b[:, :4], c[:, :4]], axis=1).T.reshape(-1)
        return cat, jnp.where(x > 0, x, 0.1 * x).sum(axis=1), jnp.argmax(x, -1)
    _check(f, (np.random.randn(2, 8).astype(np.float32),), ["x"])


def test_gather_scatter_iota():
    emb = np.random.randn(10, 6).astype(np.float32)

    def f(idx):
        e = jnp.take(emb, idx, axis=0)
        hist = jnp.zeros(10, jnp.float32).at[idx.reshape(-1)].add(1.0)
        ramp = jnp.arange(6, dtype=jnp.float32)
        return e * ramp, hist
    _check(f, (np.array([[1, 2], [3, 4]], np.int32),), ["idx"])


def test_scan_lowers_to_loop():
    def f(x):
        def body(c, xi):
            c = 0.9 * c + xi
            return c, c * 2
        return jax.lax.scan(body, jnp.zeros(x.shape[1]), x)
    data = _check(f, (np.random.randn(5, 3).astype(np.float32),), ["x"])
    g = parse_model(data)
    assert any(n.op_type == "Loop" for n in g.nodes)


def test_cond_lowers_to_if():
    def f(x):
        return jax.lax.cond(x.sum() > 0, lambda v: v * 2.0, lambda v: v - 1.0, x)
    data = _check(f, (np.random.randn(4).astype(np.float32),), ["x"])
    assert any(n.op_type == "If" for n in parse_model(data).nodes)


def test_convs():
    import flax.linen as nn

    conv = nn.Conv(6, (3,), padding="SAME")
    x = np.random.randn(2, 16, 4).astype(np.float32)
    p = conv.init(jax.random.PRNGKey(0), x)
    _check(lambda x: conv.apply(p, x), (x,), ["x"], tol=1e-4)

    dw = nn.Conv(8, (5,), padding="SAME", feature_group_count=8, kernel_dilation=2)
    x2 = np.random.randn(1, 32, 8).astype(np.float32)
    p2 = dw.init(jax.random.PRNGKey(1), x2)
    _check(lambda x: dw.apply(p2, x), (x2,), ["x"], tol=1e-4)

    ct = nn.ConvTranspose(4, (8,), strides=(4,), padding=((2, 2),))
    x3 = np.random.randn(1, 10, 6).astype(np.float32)
    p3 = ct.init(jax.random.PRNGKey(2), x3)
    _check(lambda x: ct.apply(p3, x), (x3,), ["x"], tol=1e-4)


# ---------------------------------------------------------------- real models

@pytest.mark.slow
def test_vocoder_onnx_parity():
    import types
    from diffsinger_tpu.vocoders.nsf_hifigan_model import Generator
    from tests.test_vocoder import TINY

    cfg = types.SimpleNamespace(**TINY, hop_size=int(np.prod(TINY["upsample_rates"])))
    # the exporter emits the canonical (unfolded) graph for ecosystem parity
    gen = Generator(cfg, fold_lanes=0)
    mel = np.random.randn(1, 16, 8).astype(np.float32)
    f0 = np.full((1, 16), 220.0, np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray(f0))
    fn = lambda mel, f0: gen.apply(params, mel, f0)
    data = _check(fn, (jnp.asarray(mel), jnp.asarray(f0)), ["mel", "f0"], tol=1e-5,
                  label="vocoder")
    g = parse_model(data)
    assert any(n.op_type == "ConvTranspose" for n in g.nodes)
    # the folded (TPU-serving) variant also lowers and matches numerically
    folded = Generator(cfg, fold_lanes=128)
    _check(lambda mel, f0: folded.apply(params, mel, f0),
           (jnp.asarray(mel), jnp.asarray(f0)), ["mel", "f0"], tol=1e-5,
           label="vocoder_folded")


def _perturb(params, scale=0.05, seed=7):
    """Add deterministic noise to every float leaf (fresh inits zero the
    denoiser output conv, making samples step-count-invariant)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_acoustic_exporter_onnx(tmp_path):
    """Exporter fmt='onnx' emits acoustic + fs2_aux graphs whose internalized
    noise (RandomNormalLike prelude) leaves signature parity with the
    reference's ONNX: (tokens, mel2ph, f0, steps) for a non-shallow model —
    `steps` is a runtime input (reference acoustic_exporter.py:256-311) and
    `depth` is baked as a constant since the model is not shallow."""
    from tests.test_e2e_infer import TINY_COMMON, _make_exp

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(TINY_COMMON, audio_num_mel_bins=16,
             backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                                dropout_rate=0.0, strong_cond=True),
             use_shallow_diffusion=False),
        "tiny_onnx_export",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    # fresh init zero-inits the denoiser's output conv (velocity == 0, sample
    # == noise for any step count) — perturb so step count actually matters
    params = _perturb(model.init(jax.random.PRNGKey(0)))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "onnx_artifacts"
    exporter = DiffSingerAcousticExporter(hp, out_dir, buckets=[(16, 64)], fmt="onnx")
    exporter.export()

    import yaml
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert manifest["flavor"] == "onnx"
    ac_path = out_dir / manifest["buckets"]["16x64"]["acoustic_onnx"]
    assert not list(out_dir.glob("*.stablehlo"))

    g = parse_model(ac_path.read_bytes())
    # reference-parity signature: noise is drawn inside the graph; `depth`
    # is baked (non-shallow) and `steps` stays a runtime input
    assert g.inputs == ["tokens", "mel2ph", "f0", "steps"]
    assert any(n.op_type == "RandomNormalLike" for n in g.nodes)

    tokens = np.zeros((1, 16), np.int32); tokens[0, :4] = np.arange(1, 5)
    mel2ph = np.zeros((1, 64), np.int32); mel2ph[0, :40] = np.repeat(np.arange(1, 5), 10)
    f0 = np.full((1, 64), 220.0, np.float32)
    (mel,) = run_model(ac_path.read_bytes(),
                       {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
                        "steps": np.int32(2)}, rng_seed=3)
    assert mel.shape == (1, 64, 16)
    assert np.isfinite(mel).all()

    # runtime `steps` actually changes the sample path in the emitted graph
    (mel5,) = run_model(ac_path.read_bytes(),
                        {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
                         "steps": np.int32(5)}, rng_seed=3)
    assert not np.allclose(mel, mel5)

    # deterministic steps-sweep parity via the lowering directly
    # (noise as explicit input): one exported graph, many step counts
    def sampler(tokens, mel2ph, f0, steps, noise):
        return model.forward_infer_dynamic(
            params, None, tokens, mel2ph, f0,
            depth=jnp.float32(1.0), steps=steps, noise=noise).diff_out

    nz = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 16)), jnp.float32)
    data = export_onnx(sampler, (jnp.asarray(tokens), jnp.asarray(mel2ph),
                                 jnp.asarray(f0), jnp.int32(2), nz), None,
                       name="ac",
                       input_names=["tokens", "mel2ph", "f0", "steps", "noise"])
    for steps in (2, 5, 10):
        (got,) = run_model(data, {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
                                  "steps": np.int32(steps), "noise": np.asarray(nz)})
        want = sampler(jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
                       jnp.int32(steps), nz)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=1e-4)


def test_acoustic_exporter_onnx_shallow_depth_sweep(tmp_path):
    """Shallow-diffusion export keeps `depth` as a public runtime input
    (reference acoustic_exporter.py:305-308); the same exported bytes are
    swept over 3+ depths and checked against JAX forward_infer_dynamic."""
    from tests.test_e2e_infer import TINY_COMMON, _make_exp

    hp = _make_exp(
        tmp_path, str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"),
        dict(TINY_COMMON, audio_num_mel_bins=16,
             backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                                dropout_rate=0.0, strong_cond=True),
             use_shallow_diffusion=True,
             K_step=400, K_step_infer=400,
             shallow_diffusion_args=dict(
                 train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
                 aux_decoder_arch="convnext",
                 aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                                       dropout_rate=0.1),
                 aux_decoder_grad=0.1)),
        "tiny_onnx_shallow",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = _perturb(model.init(jax.random.PRNGKey(0)))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    out_dir = tmp_path / "onnx_artifacts"
    exporter = DiffSingerAcousticExporter(hp, out_dir, buckets=[(16, 64)], fmt="onnx")
    exporter.export()

    import yaml
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert manifest["use_shallow_diffusion"] is True
    assert manifest["use_variable_depth"] is True
    assert manifest["use_continuous_acceleration"] is True
    # reflow: max_depth = 1 - T_start (reference acoustic_exporter.py:149-152)
    assert manifest["max_depth"] == pytest.approx(1.0 - hp.get("T_start", 0.4))
    ac_path = out_dir / manifest["buckets"]["16x64"]["acoustic_onnx"]

    g = parse_model(ac_path.read_bytes())
    assert g.inputs == ["tokens", "mel2ph", "f0", "depth", "steps"]

    tokens = np.zeros((1, 16), np.int32); tokens[0, :4] = np.arange(1, 5)
    mel2ph = np.zeros((1, 64), np.int32); mel2ph[0, :40] = np.repeat(np.arange(1, 5), 10)
    f0 = np.full((1, 64), 220.0, np.float32)

    def sampler(depth, steps, noise):
        return model.forward_infer_dynamic(
            params, None, jnp.asarray(tokens), jnp.asarray(mel2ph),
            jnp.asarray(f0), depth=depth, steps=steps, noise=noise).diff_out

    nz = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 16)), jnp.float32)
    data = export_onnx(
        lambda t, m, f, d, s, n: model.forward_infer_dynamic(
            params, None, t, m, f, depth=d, steps=s, noise=n).diff_out,
        (jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
         jnp.float32(0.4), jnp.int32(4), nz), None,
        name="ac_shallow",
        input_names=["tokens", "mel2ph", "f0", "depth", "steps", "noise"])
    outs = []
    for depth in (0.1, 0.25, 0.4):
        (got,) = run_model(data, {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
                                  "depth": np.float32(depth), "steps": np.int32(4),
                                  "noise": np.asarray(nz)})
        want = sampler(jnp.float32(depth), jnp.int32(4), nz)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=1e-4)
        outs.append(got)
    assert not np.allclose(outs[0], outs[2])  # depth genuinely routes


@pytest.mark.slow
def test_variance_exporter_onnx_steps_sweep(tmp_path):
    """Variance exporter fmt='onnx': pitch/variance graphs keep `steps` as a
    runtime input (reference variance_exporter.py:424-429, 571-576) with
    noise internalized; one exported graph is swept over step counts and the
    direct lowering is checked against JAX for each."""
    from tests.test_e2e_infer import TINY_COMMON, _make_exp

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
        "tiny_var_onnx",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    params = _perturb(model.init(jax.random.PRNGKey(0)))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="variance", global_step=100)

    from diffsinger_tpu.deployment.exporters import DiffSingerVarianceExporter

    out_dir = tmp_path / "onnx_artifacts"
    exporter = DiffSingerVarianceExporter(hp, out_dir, buckets=[(16, 64)], fmt="both")
    exporter.export()

    import yaml
    with open(out_dir / "dsconfig.yaml") as f:
        manifest = yaml.safe_load(f)
    assert manifest["use_continuous_acceleration"] is True
    assert manifest["sampling_steps"] == hp["sampling_steps"]
    # deployed functionality flags (reference variance_exporter.py:166-178)
    assert manifest["use_expr"] is True and manifest["use_note_rest"] is False
    assert manifest["predict_energy"] is True
    assert manifest["predict_breathiness"] is False
    files = manifest["buckets"]["16x64"]

    tokens = np.zeros((1, 16), np.int32); tokens[0, :4] = np.arange(1, 5)
    midi = np.full((1, 16), 60, np.int32)
    ph2word = np.zeros((1, 16), np.int32); ph2word[0, :4] = np.array([1, 1, 2, 2])
    word_dur = np.full((1, 16), 4.0, np.float32)

    # the deployed sampling graphs start from the linguistic view's
    # encoder_out (reference deployment contract: pitch/variance preprocess
    # take encoder_out + integer frame durations + pitch/retake/expr)
    ling_bytes = (out_dir / files["linguistic_onnx"]).read_bytes()
    g = parse_model(ling_bytes)
    assert g.inputs == ["tokens", "midi", "ph2word", "word_dur"]
    enc_out, _dur = run_model(ling_bytes, {"tokens": tokens, "midi": midi,
                                           "ph2word": ph2word, "word_dur": word_dur})

    ph_dur = np.full((1, 16), 4, np.int32)      # 64 frames
    note_midi = np.full((1, 16), 60.0, np.float32)
    note_dur = np.full((1, 16), 4, np.int32)
    pitch_in = np.full((1, 64), 60.0, np.float32)
    expr = np.ones((1, 64), np.float32)
    retake = np.ones((1, 64), bool)
    feed = {"encoder_out": enc_out, "ph_dur": ph_dur, "note_midi": note_midi,
            "note_dur": note_dur, "pitch": pitch_in, "expr": expr, "retake": retake}

    pitch_bytes = (out_dir / files["pitch_onnx"]).read_bytes()
    g = parse_model(pitch_bytes)
    assert g.inputs == ["encoder_out", "ph_dur", "note_midi", "note_dur",
                        "pitch", "expr", "retake", "steps"]
    (p2,) = run_model(pitch_bytes, dict(feed, steps=np.int32(2)), rng_seed=5)
    (p5,) = run_model(pitch_bytes, dict(feed, steps=np.int32(5)), rng_seed=5)
    assert np.isfinite(p2).all() and not np.allclose(p2, p5)
    # output is the ABSOLUTE pitch (delta + smoothed base), reference
    # forward_pitch_postprocess
    assert abs(float(np.mean(p2)) - 60.0) < 12.0

    var_bytes = (out_dir / files["variance_onnx"]).read_bytes()
    g = parse_model(var_bytes)
    assert g.inputs == ["encoder_out", "ph_dur", "pitch", "energy",
                        "retake", "steps"]

    # StableHLO side of the same bundle: pitch AND variance sampler views
    # exist and execute with the same deployed signatures
    from jax import export as jexport

    enc_j = jnp.asarray(enc_out)
    exp = jexport.deserialize((out_dir / files["pitch"]).read_bytes())
    pitch_hlo = exp.call(params, jax.random.PRNGKey(0), enc_j,
                         jnp.asarray(ph_dur), jnp.asarray(note_midi),
                         jnp.asarray(note_dur), jnp.asarray(pitch_in),
                         jnp.asarray(expr), jnp.asarray(retake), jnp.int32(2))
    assert bool(jnp.isfinite(pitch_hlo).all())
    # ... and match the live deployed method exactly (same rng)
    pitch_live = model.forward_pitch_deployed(
        params, jax.random.PRNGKey(0), enc_j, jnp.asarray(ph_dur),
        jnp.asarray(note_midi), jnp.asarray(note_dur), jnp.asarray(pitch_in),
        jnp.asarray(retake), expr=jnp.asarray(expr), steps=jnp.int32(2))
    np.testing.assert_allclose(np.asarray(pitch_hlo), np.asarray(pitch_live),
                               atol=1e-4, rtol=1e-4)

    exp = jexport.deserialize((out_dir / files["variance"]).read_bytes())
    var_hlo = exp.call(params, jax.random.PRNGKey(0), enc_j,
                       jnp.asarray(ph_dur), jnp.asarray(pitch_in),
                       jnp.zeros((1, 64), jnp.float32),
                       jnp.ones((1, 64, 1), bool), jnp.int32(2))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(var_hlo))

    # deployed path == forward_infer path given the same injected noise:
    # all-retake + expr=1 must reproduce the from-scratch prediction on the
    # in-graph base pitch (delta + base)
    from diffsinger_tpu.dsp.common import sinusoidal_smooth
    from diffsinger_tpu.utils.seq import gather_frames, length_regulator

    nz_p = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 8)), jnp.float32)
    mel2note = length_regulator(jnp.asarray(note_dur), 64)
    frame_midi = gather_frames(jnp.asarray(note_midi)[:, :, None], mel2note)[:, :, 0]
    timestep = hp["hop_size"] / hp["audio_sample_rate"]
    base_host = sinusoidal_smooth(frame_midi, max(1, round(hp["midi_smooth_width"] / timestep)))
    mel2ph_host = length_regulator(jnp.asarray(ph_dur), 64)
    deployed = model.forward_pitch_deployed(
        params, jax.random.PRNGKey(0), enc_j, jnp.asarray(ph_dur),
        jnp.asarray(note_midi), jnp.asarray(note_dur), jnp.asarray(pitch_in),
        jnp.asarray(retake), expr=jnp.asarray(expr), steps=jnp.int32(3), noise=nz_p)
    _, delta, _ = model.forward_infer(
        params, jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(midi),
        jnp.asarray(ph2word), base_host, word_dur=jnp.asarray(word_dur),
        mel2ph=mel2ph_host, predict_variances=False,
        steps=jnp.int32(3), noise_pitch=nz_p)
    np.testing.assert_allclose(np.asarray(deployed), np.asarray(base_host + delta),
                               atol=2e-4, rtol=1e-4)

    # deterministic steps-sweep parity via the lowering (noise as input):
    # the deployed pitch view's ONNX Loop trip count follows the runtime
    # `steps` and matches the live deployed method at every count
    def pitch_fn(encoder_out, ph_dur, note_midi, note_dur, pitch, expr,
                 retake, steps, noise):
        return model.forward_pitch_deployed(
            params, jax.random.PRNGKey(0), encoder_out, ph_dur, note_midi,
            note_dur, pitch, retake, expr=expr, steps=steps, noise=noise)

    args = (enc_j, jnp.asarray(ph_dur), jnp.asarray(note_midi),
            jnp.asarray(note_dur), jnp.asarray(pitch_in), jnp.asarray(expr),
            jnp.asarray(retake), jnp.int32(2), nz_p)
    data = export_onnx(pitch_fn, args, None, name="var_pitch",
                       input_names=["encoder_out", "ph_dur", "note_midi",
                                    "note_dur", "pitch", "expr", "retake",
                                    "steps", "noise"])
    for steps in (2, 5, 9):
        (got,) = run_model(data, dict(feed, steps=np.int32(steps),
                                      noise=np.asarray(nz_p)))
        want = pitch_fn(*args[:7], jnp.int32(steps), nz_p)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=1e-4)
