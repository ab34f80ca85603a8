"""Batched serving test: grouped segments produce the same per-segment output
lengths and finite audio."""

import pathlib
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from tests.test_e2e_infer import SAMPLE, TINY_COMMON, _make_exp

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_acoustic_server_batches_segments(tmp_path):
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
            vocoder_ckpt=str(tmp_path / "none.ckpt"),
        ),
        "tiny_serving",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp["work_dir"], 10), model.init(jax.random.PRNGKey(0)),
                    category="acoustic", global_step=10)

    with open(SAMPLE, encoding="utf-8") as f:
        segments = json.load(f)[:3]
    while len(segments) < 3:  # shipped sample has 2 segments; batch 3
        extra = dict(segments[0])
        extra["offset"] = float(extra.get("offset", 0.0)) + 10.0 * len(segments)
        segments.append(extra)

    from diffsinger_tpu.inference.serving import AcousticServer

    with pytest.warns(UserWarning):  # random vocoder
        server = AcousticServer(hp, max_batch_size=4)
    wavs = server.synthesize_batch(segments, seed=1, steps=2)
    assert len(wavs) == 3
    # per-chunk wall attribution is kept for bench tooling (chain_bench's
    # wire_attribution): one chunk of 3 segments, wire bytes accounted
    assert len(server.last_stats) == 1
    st = server.last_stats[0]
    assert st["batch"] == 3 and st["wire_mb"] > 0
    assert st["fetch_s"] >= 0 and st["dispatch_s"] >= 0 and st["compute_s"] is None
    hop, sr = hp["hop_size"], hp["audio_sample_rate"]
    for seg, wav in zip(segments, wavs):
        dur = sum(float(d) for d in seg["ph_dur"].split())
        expected = round(np.round(np.cumsum([float(d) for d in seg["ph_dur"].split()])[-1]
                                  / (hop / sr) + 0.5)) * hop
        assert abs(len(wav) - expected) <= hop
        assert np.isfinite(wav).all()

    # ---- multi-chip serving: 4-device data-parallel mesh, same outputs ----
    from diffsinger_tpu.inference.serving import AcousticServer
    from diffsinger_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(jax.devices()[:4], data=4, model=1)
    with pytest.warns(UserWarning):  # random vocoder
        sharded_server = AcousticServer(hp, max_batch_size=4, mesh=mesh)
    wavs_sharded = sharded_server.synthesize_batch(segments, seed=1, steps=2)
    assert len(wavs_sharded) == len(wavs)
    for w0, w1 in zip(wavs, wavs_sharded):
        # identical params + identical seeds: the data-parallel partition of
        # the same program must reproduce the single-chip outputs
        assert w0.shape == w1.shape
        np.testing.assert_allclose(w0, w1, atol=5e-5)

def test_serving_and_crossfade_on_long_multisegment_sample(tmp_path):
    """Reference-scale score (samples/08_qiu_yu.ds: 7 segments, ~49 s, dense
    f0 curves): AcousticServer batches heterogeneous segment lengths across
    buckets with per-segment seeds, and run_inference joins overlapping
    segments into one wav via cross-fades (VERDICT r2 #6 — e2e at realistic
    segment counts, not toy 1-2 segment scores)."""
    hp = _make_exp(
        tmp_path, str(REPO / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            use_shallow_diffusion=False,
            vocoder_ckpt=str(tmp_path / "none.ckpt"),
        ),
        "tiny_serving_long",
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp["work_dir"], 10), model.init(jax.random.PRNGKey(0)),
                    category="acoustic", global_step=10)

    with open(REPO / "samples" / "08_qiu_yu.ds", encoding="utf-8") as f:
        segments = json.load(f)
    assert len(segments) == 7
    lengths = [sum(map(float, s["ph_dur"].split())) for s in segments]
    assert max(lengths) - min(lengths) > 1.0  # heterogeneous -> multiple buckets

    from diffsinger_tpu.inference.serving import AcousticServer

    with pytest.warns(UserWarning):  # random vocoder
        server = AcousticServer(hp, max_batch_size=4)
    wavs = server.synthesize_batch(segments, seed=1, steps=2)
    assert len(wavs) == 7
    hop, sr = hp["hop_size"], hp["audio_sample_rate"]
    for seg, wav in zip(segments, wavs):
        dur = np.cumsum([float(d) for d in seg["ph_dur"].split()])[-1]
        expected = round(np.round(dur / (hop / sr) + 0.5)) * hop
        assert abs(len(wav) - expected) <= hop
        assert np.isfinite(wav).all() and np.abs(wav).max() > 0

    # per-segment seeds: same segment under a different master seed differs
    wavs2 = server.synthesize_batch(segments[:1], seed=2, steps=2)
    assert not np.allclose(wavs[0], wavs2[0])

    # cross-fade join path: one wav spanning all segments, length = last
    # offset + last segment duration (plus trailing pad margin)
    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

    with pytest.warns(UserWarning):
        infer_ins = DiffSingerAcousticInfer(hp)
    out_dir = tmp_path / "out"
    infer_ins.run_inference(segments[:4], out_dir=out_dir, title="long08",
                            seed=1, steps=2)
    import wave

    with wave.open(str(out_dir / "long08.wav")) as f:
        n, rate = f.getnframes(), f.getframerate()
    end = segments[3]["offset"] + sum(map(float, segments[3]["ph_dur"].split()))
    assert rate == sr
    assert n >= end * sr - hop
    assert n <= (end + 2.0) * sr

    # batched CLI path (infer.py acoustic --batch_size): the server's
    # run_inference writes a wav of the same length via the same
    # offset/cross-fade concat; per-segment seeds are warned-ignored
    seeded = [dict(segments[0], seed=7)] + [dict(s) for s in segments[1:4]]
    with pytest.warns(UserWarning, match="per-segment 'seed'"):
        server.run_inference(seeded, out_dir=out_dir, title="long08b",
                             seed=1, steps=2)
    with wave.open(str(out_dir / "long08b.wav")) as f:
        nb, rateb = f.getnframes(), f.getframerate()
    assert rateb == sr
    assert abs(nb - n) <= 2 * hop


def _tiny_variance_exp(tmp_path, extra=None, name="tiny_var_serving"):
    from tests.test_e2e_infer import TINY_COMMON, _make_exp

    hp = _make_exp(
        tmp_path, str(REPO / "configs" / "variance.yaml"),
        dict(
            TINY_COMMON,
            **(extra or {}),
            predict_energy=True,
            dur_prediction_args=dict(
                arch="fs2", hidden_size=32, dropout=0.1, num_layers=2, kernel_size=3,
                log_offset=1.0, loss_type="mse",
                lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
            ),
            pitch_prediction_args=dict(
                pitd_norm_min=-8.0, pitd_norm_max=8.0, pitd_clip_min=-12.0,
                pitd_clip_max=12.0, repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16,
                                   dilation_cycle_length=2),
            ),
            variances_prediction_args=dict(
                total_repeat_bins=8, backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16,
                                   dilation_cycle_length=2),
            ),
        ),
        name,
    )
    hp["infer"] = True

    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    vmodel = DiffSingerVariance(hp, vocab_size=vocab)
    save_checkpoint(checkpoint_path(hp["work_dir"], 10),
                    vmodel.init(jax.random.PRNGKey(0)), category="variance",
                    global_step=10)
    return hp


def test_variance_server_single_segment_matches_sequential(tmp_path):
    """A one-segment 'batch' goes through the identical padded shapes and rng
    as the sequential driver, so outputs must match EXACTLY."""
    hp = _tiny_variance_exp(tmp_path)
    with open(SAMPLE, encoding="utf-8") as f:
        seg = dict(json.load(f)[0])
    seg.pop("f0_seq", None)
    seg.pop("f0_timestep", None)
    seg.pop("ph_dur", None)  # exercise batched duration prediction too

    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
    from diffsinger_tpu.inference.serving import VarianceServer

    seq = DiffSingerVarianceInfer(hp, predictions=set())
    srv = VarianceServer(hp, max_batch_size=4, predictions=set())
    srv.params = seq.params  # same random weights

    out_seq = tmp_path / "seq"
    out_srv = tmp_path / "srv"
    seq.run_inference([dict(seg)], out_dir=out_seq, title="x", seed=5, steps=2)
    srv.run_inference([dict(seg)], out_dir=out_srv, title="x", seed=5, steps=2)
    with open(out_seq / "x.ds", encoding="utf8") as f:
        a = json.load(f)[0]
    with open(out_srv / "x.ds", encoding="utf8") as f:
        b = json.load(f)[0]
    assert a["ph_dur"] == b["ph_dur"]
    assert a["f0_seq"] == b["f0_seq"]
    assert a.get("energy") == b.get("energy")


def test_variance_server_batches_segments(tmp_path):
    """Multiple segments grouped into one batch: the deterministic duration
    head must match the sequential driver exactly; sampled curves must be
    finite and in plausible ranges."""
    hp = _tiny_variance_exp(tmp_path)
    with open(SAMPLE, encoding="utf-8") as f:
        segs = json.load(f)[:2]
    segments = []
    for i in range(3):
        s = dict(segs[i % len(segs)])
        s.pop("f0_seq", None)
        s.pop("f0_timestep", None)
        if i != 1:  # mixed flag-sets: segment 1 keeps manual ph_dur
            s.pop("ph_dur", None)
        s["offset"] = float(s.get("offset", 0.0)) + 10.0 * i
        segments.append(s)

    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
    from diffsinger_tpu.inference.serving import VarianceServer

    seq = DiffSingerVarianceInfer(hp, predictions=set())
    srv = VarianceServer(hp, max_batch_size=4, predictions=set())
    srv.params = seq.params

    preds = srv.predict_batch([dict(s) for s in segments], seed=5, steps=2)
    assert len(preds) == 3
    for i, (dur, pitch, vars_) in enumerate(preds):
        # sequential reference for the deterministic duration head
        flags = seq.segment_flags(segments[i])
        batch = seq.preprocess_input(
            dict(segments[i]), idx=i,
            load_dur=not flags[0] and (flags[1] or flags[2]),
            load_pitch=not flags[1] and flags[2])
        dur_ref, _, _ = seq.forward_model(batch, flags, jax.random.PRNGKey(5), steps=2)
        if dur_ref is None:  # segment shipped with manual ph_dur
            assert dur is None
        else:
            np.testing.assert_allclose(dur, dur_ref, atol=1e-4, rtol=1e-4)
        t_s = batch["base_pitch"].shape[1]
        assert pitch.shape == (t_s,)
        assert np.isfinite(pitch).all()
        assert (pitch > 0).all() and (pitch < 128).all()  # midi range
        assert set(vars_) == {"energy"}
        assert np.isfinite(vars_["energy"]).all()
        assert vars_["energy"].shape == (t_s,)

    # ---- multi-chip serving: 4-device data-parallel mesh, same outputs ----
    from diffsinger_tpu.parallel.mesh import create_mesh, replicated_sharding

    mesh = create_mesh(jax.devices()[:4], data=4, model=1)
    srv_mesh = VarianceServer(hp, max_batch_size=4, mesh=mesh,
                              predictions=set())
    srv_mesh.params = jax.device_put(seq.params, replicated_sharding(mesh))
    preds_mesh = srv_mesh.predict_batch([dict(s) for s in segments], seed=5,
                                        steps=2)
    for (d0, p0, v0), (d1, p1, v1) in zip(preds, preds_mesh):
        # identical params + identical seeds: the data-parallel partition of
        # the same program must reproduce the single-host outputs
        if d0 is None:
            assert d1 is None
        else:
            np.testing.assert_allclose(d0, d1, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(p0, p1, atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(v0["energy"], v1["energy"], atol=1e-3,
                                   rtol=1e-4)


def test_acoustic_server_separates_static_and_dynamic_spk_mixes(tmp_path):
    """Regression: sort-and-pack grouping keyed chunks only on speaker COUNT,
    so a static [1,1,N] mix row could co-group with a dynamic [1,T,N] row —
    zero-padding the static segment's speaker weights to t_mel (silent
    garbage) or tripping pad_to's length assertion."""
    from tests.test_e2e_infer import TINY_COMMON, _make_exp

    hp = _make_exp(
        tmp_path, str(REPO / "configs" / "acoustic.yaml"),
        dict(
            TINY_COMMON,
            audio_num_mel_bins=16,
            use_spk_id=True, num_spk=2,
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
        "tiny_serving_spk",
    )
    hp["infer"] = True
    with open(pathlib.Path(hp["work_dir"]) / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    save_checkpoint(checkpoint_path(hp["work_dir"], 10),
                    model.init(jax.random.PRNGKey(0)),
                    category="acoustic", global_step=10)

    with open(SAMPLE, encoding="utf-8") as f:
        base = json.load(f)[0]
    segments = []
    for i, mix in enumerate((
        {"alice": 0.6, "bob": 0.4},                       # static 2-spk [1,1,2]
        {"alice": "0.2 0.8 0.5", "bob": 0.5},             # dynamic 2-spk [1,T,2]
        {"alice": 1.0},                                   # static 1-spk [1,1,1]
    )):
        s = dict(base)
        s["offset"] = float(s.get("offset", 0.0)) + 10.0 * i
        s["spk_mix"] = mix
        if any(isinstance(v, str) for v in mix.values()):
            s["spk_mix_timestep"] = "0.5"
        segments.append(s)

    from diffsinger_tpu.inference.serving import AcousticServer

    with pytest.warns(UserWarning):  # random vocoder
        server = AcousticServer(hp, max_batch_size=4)
    wavs = server.synthesize_batch(segments, seed=1, steps=2)
    assert len(wavs) == 3
    hop, sr = hp["hop_size"], hp["audio_sample_rate"]
    for seg, wav in zip(segments, wavs):
        frames = round(np.round(np.cumsum([float(d) for d in seg["ph_dur"].split()])[-1]
                                / (hop / sr) + 0.5))
        assert abs(len(wav) - frames * hop) <= hop
        assert np.isfinite(wav).all()
    # the static segment must NOT be silent/degenerate (zero-padded weights
    # would zero its speaker embedding for every frame after the first)
    assert np.abs(wavs[0]).max() > 0


def test_variance_server_separates_frame_mix_widths(tmp_path):
    """Regression: VarianceServer's group key omitted the FRAME-level mix
    speaker count, so segments with different frame-mix widths co-grouped and
    np.concatenate crashed on mismatched [1,1,N] rows."""
    hp = _tiny_variance_exp(
        tmp_path, extra=dict(use_spk_id=True, num_spk=2),
        name="tiny_var_serving_spk")
    with open(pathlib.Path(hp["work_dir"]) / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    with open(SAMPLE, encoding="utf-8") as f:
        base = json.load(f)[0]
    segments = []
    for i, mix in enumerate(({"alice": 1.0}, {"alice": 0.5, "bob": 0.5})):
        s = dict(base)
        s.pop("f0_seq", None)
        s.pop("f0_timestep", None)
        s["offset"] = float(s.get("offset", 0.0)) + 10.0 * i
        s["ph_spk_mix"] = {"alice": 1.0}
        s["spk_mix"] = mix
        segments.append(s)

    from diffsinger_tpu.inference.serving import VarianceServer

    srv = VarianceServer(hp, max_batch_size=4, predictions=set())
    preds = srv.predict_batch(segments, seed=5, steps=2)
    assert len(preds) == 2
    for _dur, pitch, vars_ in preds:
        assert pitch is not None and np.isfinite(pitch).all()
        assert np.isfinite(vars_["energy"]).all()
