"""The framework's own shipped assets (configs/, dictionaries/, samples/)
must work standalone — config cascade resolves, the demo dictionary encodes
the sample scores, and tiny models run .ds -> wav / .ds -> .ds without
touching the reference checkout (reference ships configs/base|acoustic|
variance.yaml, dictionaries/opencpop-extension.txt, samples/*.ds)."""

import json
import pathlib
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

import jax

REPO = pathlib.Path(__file__).resolve().parent.parent
DICT = REPO / "dictionaries" / "demo-pinyin.txt"


def _make_exp(tmp_path, base_cfg, overrides, name):
    from diffsinger_tpu.config import load_config

    work_dir = tmp_path / "checkpoints" / name
    work_dir.mkdir(parents=True)
    hp = load_config(str(base_cfg), save_snapshot=False)
    hp.update(overrides)
    hp["work_dir"] = str(work_dir)
    hp["dictionary"] = str(DICT)
    hp.pop("dictionaries", None)
    with open(work_dir / "config.yaml", "w") as f:
        yaml.safe_dump(dict(hp), f, allow_unicode=True)
    shutil.copy(DICT, work_dir / "dictionary.txt")
    return hp


def test_config_cascade_and_class_paths():
    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.utils import remap_reference_class_name

    for cfg, task in [
        (REPO / "configs" / "templates" / "config_acoustic.yaml",
         "diffsinger_tpu.training.acoustic_task.AcousticTask"),
        (REPO / "configs" / "templates" / "config_variance.yaml",
         "diffsinger_tpu.training.variance_task.VarianceTask"),
    ]:
        hp = load_config(str(cfg), save_snapshot=False)
        assert hp["task_cls"] == task
        assert hp["audio_sample_rate"] == 44100 and hp["hop_size"] == 512
        # the task/binarizer classes must import
        mod, cls = remap_reference_class_name(hp["task_cls"]).rsplit(".", 1)
        assert getattr(__import__(mod, fromlist=[cls]), cls) is not None
        mod, cls = remap_reference_class_name(hp["binarizer_cls"]).rsplit(".", 1)
        assert getattr(__import__(mod, fromlist=[cls]), cls) is not None
        # optimizer/schedule construction from shipped defaults
        from diffsinger_tpu.training.train_state import build_optimizer

        tx, schedule = build_optimizer(hp)
        assert float(schedule(0)) > 0


def test_shipped_dictionary_covers_samples():
    """Every shipped sample encodes with the shipped production dictionary
    (samples intentionally exercise extension syllables beyond the demo
    subset, e.g. the ü series in 06 and `En` finals in 09)."""
    from diffsinger_tpu.utils.text import PhonemeDictionary

    pd = PhonemeDictionary(
        {"zh": REPO / "dictionaries" / "opencpop-extension.txt"})
    for ds in sorted((REPO / "samples").glob("*.ds")):
        with open(ds, encoding="utf8") as f:
            for seg in json.load(f):
                ids = pd.encode(seg["ph_seq"])
                assert (np.asarray(ids) > 0).all(), ds.name


def test_acoustic_sample_to_wav(tmp_path):
    import wave

    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    hp = _make_exp(
        tmp_path, REPO / "configs" / "acoustic.yaml",
        dict(
            hidden_size=32, enc_layers=1, sampling_steps=2, audio_num_mel_bins=16,
            backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                               dropout_rate=0.0, strong_cond=True),
            shallow_diffusion_args=dict(
                train_aux_decoder=True, train_diffusion=True, val_gt_start=False,
                aux_decoder_arch="convnext",
                aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                                      dropout_rate=0.1),
                aux_decoder_grad=0.1,
            ),
            vocoder_ckpt=str(tmp_path / "missing_vocoder.ckpt"),
        ),
        "shipped_acoustic",
    )
    hp["infer"] = True
    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerAcoustic(hp, vocab_size=vocab, out_dims=16)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="acoustic", global_step=100)

    with open(REPO / "samples" / "00_xiao_xing_xing.ds", encoding="utf8") as f:
        segments = json.load(f)[:1]

    with pytest.warns(UserWarning):  # random vocoder weights
        infer_ins = DiffSingerAcousticInfer(hp)
    out_dir = tmp_path / "out"
    infer_ins.run_inference(segments, out_dir=out_dir, title="shipped", seed=1, steps=2)
    with wave.open(str(out_dir / "shipped.wav")) as f:
        assert f.getframerate() == 44100
        assert f.getnframes() > 4.5 * 44100  # offset 0.5 + 4.5 s of content

    # --mel workflow: save the mel bundle instead of vocoding (consumed by
    # scripts/vocode.py; format checked by test_cli_functional)
    infer_ins.run_inference(segments, out_dir=out_dir, title="shipped_mel",
                            seed=1, steps=2, save_mel=True)
    data = np.load(out_dir / "shipped_mel.mel.npz")
    assert int(data["num_segments"]) == 1
    mel0, f00 = data["mel_0"], data["f0_0"]
    assert mel0.ndim == 2 and mel0.shape[1] == 16
    assert f00.shape[0] == mel0.shape[0]
    assert float(data["offset_0"]) == segments[0]["offset"]


def test_variance_score_only_auto_completion(tmp_path):
    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
    from diffsinger_tpu.models.toplevel import DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    hp = _make_exp(
        tmp_path, REPO / "configs" / "variance.yaml",
        dict(
            hidden_size=32, enc_layers=1, sampling_steps=2,
            dur_prediction_args=dict(
                arch="fs2", hidden_size=32, dropout=0.1, num_layers=1, kernel_size=3,
                log_offset=1.0, loss_type="mse",
                lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
            ),
            pitch_prediction_args=dict(
                pitd_norm_min=-8.0, pitd_norm_max=8.0,
                pitd_clip_min=-12.0, pitd_clip_max=12.0, repeat_bins=8,
                backbone_type="wavenet",
                backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
            ),
        ),
        "shipped_variance",
    )
    hp["infer"] = True
    vocab = len(load_phoneme_dictionary(hp))
    model = DiffSingerVariance(hp, vocab_size=vocab)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(checkpoint_path(hp["work_dir"], 100), params,
                    category="variance", global_step=100)

    with open(REPO / "samples" / "01_score_only.ds", encoding="utf8") as f:
        segments = json.load(f)

    infer_ins = DiffSingerVarianceInfer(hp, predictions=set())
    out_dir = tmp_path / "out"
    infer_ins.run_inference(segments, out_dir=out_dir, title="shipped_var", seed=1)
    with open(out_dir / "shipped_var.ds", encoding="utf8") as f:
        out = json.load(f)
    # dur + pitch were auto-completed from the bare score
    assert "ph_dur" in out[0] and "f0_seq" in out[0]
    assert len(out[0]["ph_dur"].split()) == len(segments[0]["ph_seq"].split())
    f0 = np.asarray(out[0]["f0_seq"].split(), np.float32)
    assert (f0 > 0).all()


def test_multi_language_dictionaries():
    """Both shipped dictionaries combine into one multi-language vocabulary
    with lang/phoneme tags and shared cross-lingual phonemes."""
    from diffsinger_tpu.utils.text import PhonemeDictionary

    pd = PhonemeDictionary(
        {"zh": DICT, "ja": REPO / "dictionaries" / "demo-romaji.txt"},
        merged_groups=[["zh/a", "ja/a"]],
    )
    ids = pd.encode("AP zh/x zh/ing SP ja/k ja/a", lang="zh")
    assert (np.asarray(ids) > 0).all()
    # merged group: zh/a and ja/a share one id
    merged = pd.encode("zh/a ja/a")
    assert merged[0] == merged[1]
    # unmerged phonemes stay language-distinct
    distinct = pd.encode("zh/i ja/i")
    assert distinct[0] != distinct[1]


def test_full_pinyin_dictionary_generated_and_complete():
    """The shipped opencpop-extension-scale dictionary regenerates exactly
    from the phonological rules (tools/gen_pinyin_dict.py) and has the
    expected surface: 601 syllables, 62 phonemes, the singing-extension
    conventions (reference dictionaries/opencpop-extension.txt)."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from gen_pinyin_dict import build_table

    table = build_table()
    shipped = dict(
        line.rstrip("\n").split("\t")
        for line in open(REPO / "dictionaries" / "opencpop-extension.txt")
    )
    assert shipped == table
    assert len(shipped) == 601
    phones = set(p for v in shipped.values() for p in v.split())
    assert len(phones) == 62
    # the extension conventions
    assert shipped["yan"] == "y En" and shipped["ye"] == "y E"
    assert shipped["zhi"] == "zh ir" and shipped["zi"] == "z i0"
    assert shipped["ju"] == "j v" and shipped["nv"] == "n v"
    assert shipped["zhyi"] == "zh i" and shipped["ywu"] == "y u"
    assert shipped["bve"] == "b ve" and shipped["biang"] == "b iang"


def test_all_shipped_samples_encode_with_full_dictionary():
    """Every shipped sample's ph_seq is covered by the full dictionary's
    phoneme inventory (BASELINE config #2 needs samples 02-07 runnable)."""
    from diffsinger_tpu.utils.text import PhonemeDictionary

    pd = PhonemeDictionary({"zh": REPO / "dictionaries" / "opencpop-extension.txt"})
    sample_files = sorted((REPO / "samples").glob("*.ds"))
    assert len(sample_files) >= 8
    for path in sample_files:
        with open(path, encoding="utf8") as f:
            segments = json.load(f)
        for seg in segments:
            ids = pd.encode(seg["ph_seq"], lang="zh")
            assert (np.asarray(ids) > 0).all(), path.name


def test_long_samples_reference_scale():
    """The procedurally composed samples (08-10) match the reference's sample
    shape: multi-segment (>= 6), 30+ seconds total, dense 5 ms f0 curves
    covering each segment, ph_dur consistent with note_dur
    (reference samples/00_我多想说再见啊.ds: 30 segments, 1170-point f0_seq)."""
    specs = {  # name -> (min_segments, acoustic_ready)
        "08_qiu_yu.ds": (7, True),
        "09_xing_he.ds": (10, True),
        "10_shan_lu.ds": (6, False),
    }
    for name, (n_seg, ready) in specs.items():
        with open(REPO / "samples" / name, encoding="utf8") as f:
            segments = json.load(f)
        assert len(segments) >= n_seg, name
        total = max(s["offset"] + sum(map(float, s["note_dur"].split())) for s in segments)
        assert total >= 30.0, (name, total)
        offsets = [s["offset"] for s in segments]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        for seg in segments:
            note_total = sum(map(float, seg["note_dur"].split()))
            assert note_total >= 3.0  # real phrases, not stubs
            if not ready:
                assert "ph_dur" not in seg and "f0_seq" not in seg
                continue
            ph_total = sum(map(float, seg["ph_dur"].split()))
            assert abs(ph_total - note_total) < 0.01, name
            ts = float(seg["f0_timestep"])
            f0 = np.asarray(seg["f0_seq"].split(), np.float64)
            assert ts == 0.005
            assert len(f0) >= note_total / ts  # dense over the whole segment
            assert (f0 > 50).all() and (f0 < 2000).all()
            # a real contour moves: vibrato/portamento/drift, not a step plot —
            # and transitions glide (< ~1 semitone per 5 ms; an octave glitch
            # would be a 12-semitone step)
            assert np.abs(np.diff(np.log2(f0))).max() < 0.09
            assert np.std(f0) > 5.0


def test_variance_to_acoustic_chain_on_shipped_sample(tmp_path):
    """Score-only shipped sample (06: ü-series + apical-vowel extension
    syllables) through variance auto-completion then acoustic synthesis,
    entirely from shipped assets (BASELINE config #2's shape)."""
    from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer
    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic, DiffSingerVariance
    from diffsinger_tpu.utils.ckpt import checkpoint_path, save_checkpoint
    from diffsinger_tpu.utils.text import load_phoneme_dictionary

    full_dict = REPO / "dictionaries" / "opencpop-extension.txt"

    def mk(base, overrides, name):
        hp = _make_exp(tmp_path, base, overrides, name)
        hp["dictionary"] = str(full_dict)
        hp.pop("dictionaries", None)
        shutil.copy(full_dict, pathlib.Path(hp["work_dir"]) / "dictionary.txt")
        hp["infer"] = True
        return hp

    hp_var = mk(REPO / "configs" / "variance.yaml", dict(
        hidden_size=32, enc_layers=1, sampling_steps=2,
        dur_prediction_args=dict(
            arch="fs2", hidden_size=32, dropout=0.1, num_layers=1, kernel_size=3,
            log_offset=1.0, loss_type="mse",
            lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=3.0,
        ),
        pitch_prediction_args=dict(
            pitd_norm_min=-8.0, pitd_norm_max=8.0,
            pitd_clip_min=-12.0, pitd_clip_max=12.0, repeat_bins=8,
            backbone_type="wavenet",
            backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
        ),
    ), "chain_var_shipped")
    vocab = len(load_phoneme_dictionary(hp_var))
    vmodel = DiffSingerVariance(hp_var, vocab_size=vocab)
    save_checkpoint(checkpoint_path(hp_var["work_dir"], 10),
                    vmodel.init(jax.random.PRNGKey(0)), category="variance",
                    global_step=10)

    with open(REPO / "samples" / "06_lv_ye.ds", encoding="utf8") as f:
        segments = json.load(f)
    var_infer = DiffSingerVarianceInfer(hp_var, predictions=set())
    var_out = tmp_path / "var_out"
    var_infer.run_inference(segments, out_dir=var_out, title="c06", seed=1)
    with open(var_out / "c06.ds", encoding="utf8") as f:
        completed = json.load(f)
    assert "ph_dur" in completed[0] and "f0_seq" in completed[0]

    hp_ac = mk(REPO / "configs" / "acoustic.yaml", dict(
        hidden_size=32, enc_layers=1, sampling_steps=2, audio_num_mel_bins=16,
        spec_min=[-5], spec_max=[0], use_shallow_diffusion=False,
        backbone_args=dict(num_channels=16, num_layers=1, kernel_size=7,
                           dropout_rate=0.0, strong_cond=True),
    ), "chain_ac_shipped")
    vocab_ac = len(load_phoneme_dictionary(hp_ac))
    amodel = DiffSingerAcoustic(hp_ac, vocab_size=vocab_ac, out_dims=16)
    save_checkpoint(checkpoint_path(hp_ac["work_dir"], 10),
                    amodel.init(jax.random.PRNGKey(0)), category="acoustic",
                    global_step=10)
    ac_infer = DiffSingerAcousticInfer(hp_ac, load_vocoder=False)
    ac_out = tmp_path / "ac_out"
    ac_infer.run_inference(completed, out_dir=ac_out, title="c06a",
                           seed=1, steps=2, save_mel=True)
    data = np.load(ac_out / "c06a.mel.npz")
    mel0 = data["mel_0"]
    assert mel0.ndim == 2 and mel0.shape[1] == 16 and np.isfinite(mel0).all()
