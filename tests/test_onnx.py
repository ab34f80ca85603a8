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
    data = export_onnx(fn, args, None, name=label, input_names=list(names))
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


def test_acoustic_exporter_onnx(tmp_path):
    """Exporter fmt='onnx' emits acoustic + fs2_aux graphs whose internalized
    noise (RandomNormalLike prelude) leaves signature parity with the
    reference's ONNX: inputs (tokens, mel2ph, f0) only."""
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
    params = model.init(jax.random.PRNGKey(0))
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
    # reference-parity signature: noise is drawn inside the graph
    assert g.inputs == ["tokens", "mel2ph", "f0"]
    assert any(n.op_type == "RandomNormalLike" for n in g.nodes)

    tokens = np.zeros((1, 16), np.int32); tokens[0, :4] = np.arange(1, 5)
    mel2ph = np.zeros((1, 64), np.int32); mel2ph[0, :40] = np.repeat(np.arange(1, 5), 10)
    f0 = np.full((1, 64), 220.0, np.float32)
    (mel,) = run_model(ac_path.read_bytes(),
                       {"tokens": tokens, "mel2ph": mel2ph, "f0": f0}, rng_seed=3)
    assert mel.shape == (1, 64, 16)
    assert np.isfinite(mel).all()

    # deterministic parity via the lowering directly (noise as input)
    key = jax.random.PRNGKey(0)
    steps = hp["sampling_steps"]

    def sampler(tokens, mel2ph, f0, noise):
        return model.forward_infer(params, key, tokens, mel2ph, f0,
                                   steps=steps, noise=noise).diff_out

    nz = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 16)), jnp.float32)
    data = export_onnx(sampler, (jnp.asarray(tokens), jnp.asarray(mel2ph),
                                 jnp.asarray(f0), nz), None,
                       name="ac", input_names=["tokens", "mel2ph", "f0", "noise"])
    (got,) = run_model(data, {"tokens": tokens, "mel2ph": mel2ph, "f0": f0,
                              "noise": np.asarray(nz)})
    want = sampler(jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0), nz)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=1e-4)
