"""PhonemeDictionary and foundation-utils tests."""

import pathlib
import numpy as np
import pytest

from diffsinger_tpu.utils import batch_by_size, collate_nd, filter_kwargs, pad_to
from diffsinger_tpu.utils.infer_utils import (
    cross_fade,
    midi_to_note,
    note_to_midi,
    parse_commandline_spk_mix,
    resample_align_curve,
)
from diffsinger_tpu.utils.text import PhonemeDictionary


@pytest.fixture()
def simple_dict(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("a\ta\nai\tai\nba\tb a\nzhi\tzh ir\n")
    return p


def test_single_lang_vocab(simple_dict):
    pd = PhonemeDictionary({"zh": simple_dict})
    # AP, SP + {a, ai, b, zh, ir} = 7 phonemes, +1 PAD
    assert pd.vocab_size == 8
    ids = pd.encode("AP a b zh SP")
    assert all(i >= 1 for i in ids)
    assert pd.decode(ids) == "AP a b zh SP"
    assert pd.encode_one("a") == pd.encode_one("a", lang="zh")  # single-lang: tag ignored


def test_multi_lang_and_merged(tmp_path):
    d1 = tmp_path / "zh.txt"
    d1.write_text("a\ta\nba\tb a\n")
    d2 = tmp_path / "ja.txt"
    d2.write_text("a\ta\nka\tk a\n")
    pd = PhonemeDictionary(
        {"zh": d1, "ja": d2},
        merged_groups=[["zh/a", "ja/a"]],
    )
    assert pd.encode_one("zh/a") == pd.encode_one("ja/a")
    assert pd.is_cross_lingual("zh/a") and pd.is_cross_lingual("ja/a")
    assert pd.encode_one("b", lang="zh") != pd.encode_one("k", lang="ja")
    assert pd.decode_one(pd.encode_one("zh/a"), lang="ja") == "ja/a"


def test_reference_dictionary_loads():
    pd = PhonemeDictionary({"zh": str(pathlib.Path(__file__).resolve().parents[1] / "dictionaries" / "opencpop-extension.txt")})
    assert pd.vocab_size > 50
    ids = pd.encode("AP sh ir zh e SP")
    assert len(ids) == 6 and all(i > 0 for i in ids)


def test_collate_nd_and_pad_to():
    a = np.ones((3, 2))
    b = np.ones((5, 2)) * 2
    out = collate_nd([a, b])
    assert out.shape == (2, 5, 2)
    assert out[0, 3:].sum() == 0
    out2 = collate_nd([a, b], max_len=8)
    assert out2.shape == (2, 8, 2)
    assert pad_to(a, 6).shape == (6, 2)


def test_batch_by_size():
    sizes = {i: 10 * (i + 1) for i in range(10)}
    batches = batch_by_size(np.arange(10), lambda i: sizes[i], max_batch_frames=100, max_batch_size=3)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(10))
    for b in batches:
        assert sum(sizes[i] for i in b) <= 100
        assert len(b) <= 3


def test_filter_kwargs():
    def fn(a, b, *, c=1):
        return a, b, c

    assert filter_kwargs({"a": 1, "b": 2, "c": 3, "d": 4}, fn) == {"a": 1, "b": 2, "c": 3}


def test_resample_align_curve():
    pts = np.array([0.0, 1.0, 2.0, 3.0])
    out = resample_align_curve(pts, original_timestep=0.01, target_timestep=0.005, align_length=8)
    assert out.shape == (8,)
    np.testing.assert_allclose(out[:6], [0.0, 0.5, 1.0, 1.5, 2.0, 2.5])
    assert out[-1] == out[-2]  # extended with last value


def test_cross_fade():
    a = np.ones(100)
    b = np.zeros(100)
    out = cross_fade(a, b, 50)
    assert out.shape == (150,)
    assert out[0] == 1.0 and out[-1] == 0.0
    assert abs(out[75] - 0.5) < 0.05


def test_spk_mix_parsing():
    assert parse_commandline_spk_mix("alice") == {"alice": 1.0}
    mix = parse_commandline_spk_mix("alice:0.5|bob:0.5")
    assert mix == {"alice": 0.5, "bob": 0.5}
    mix = parse_commandline_spk_mix("alice:0.5|bob")
    assert abs(mix["bob"] - 0.5) < 1e-9
    mix = parse_commandline_spk_mix("alice:2|bob:2")
    assert mix == {"alice": 0.5, "bob": 0.5}


def test_note_midi_roundtrip():
    assert note_to_midi("C4") == 60
    assert note_to_midi("A4") == 69
    assert note_to_midi("C#4") == 61
    assert note_to_midi("Db4") == 61
    assert midi_to_note(61) == "C#4"
    for m in range(21, 109):
        assert note_to_midi(midi_to_note(m)) == m


def test_trans_key_transposes_notes_and_f0():
    """--key transposition of parsed .ds segments (reference
    utils/infer_utils.py:13-38): note names shift by semitones, f0 values
    scale by 2^(key/12) rounded to 0.1 Hz, rests are preserved."""
    from diffsinger_tpu.utils.infer_utils import trans_key

    segs = [
        {"note_seq": "A4 rest C#4", "f0_seq": "440.0 0.0 277.2"},
        {"note_seq": "C4 C4"},  # no f0_seq -> warning path, notes still move
    ]
    out = trans_key([dict(s) for s in segs], 2)
    assert out[0]["note_seq"] == "B4 rest D#4"
    f0s = [float(x) for x in out[0]["f0_seq"].split(" ")]
    assert f0s[0] == round(440.0 * 2 ** (2 / 12), 1)
    assert f0s[1] == 0.0
    assert out[1]["note_seq"] == "D4 D4"
    # down transposition round-trips the note names
    back = trans_key([dict(s) for s in out], -2)
    assert back[0]["note_seq"] == "A4 rest C#4"




def test_parse_spk_settings():
    """Exporter speaker-setting parsing (reference scripts/export.py:43-70):
    plain names, 'alias=mix' aliases, and the multi-speaker-freeze alias
    requirement."""
    from diffsinger_tpu.utils.infer_utils import parse_spk_settings

    export, freeze = parse_spk_settings(["alice", "duo=alice:0.5|bob:0.5"], None)
    assert export[0] == ("alice", {"alice": 1.0})
    assert export[1][0] == "duo" and export[1][1] == {"alice": 0.5, "bob": 0.5}
    assert freeze is None

    _, freeze = parse_spk_settings(None, "bob")
    assert freeze == ("bob", {"bob": 1.0})
    _, freeze = parse_spk_settings(None, "mix=alice|bob")
    assert freeze[0] == "mix" and freeze[1] == {"alice": 0.5, "bob": 0.5}

    import pytest

    with pytest.raises(AssertionError, match="alias"):
        parse_spk_settings(None, "alice:0.5|bob:0.5")  # mixture needs an alias
