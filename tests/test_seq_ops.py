"""Sequence/alignment op tests vs the reference's documented examples
(modules/fastspeech/tts_modules.py docstrings) and torch formulations."""

import numpy as np
import jax.numpy as jnp

from diffsinger_tpu.utils.seq import (
    dur_to_mel2ph,
    gather_frames,
    length_regulator,
    mel2ph_to_dur,
    rhythm_regulator,
    stretch_regulator,
)


def test_length_regulator_reference_example():
    # docstring example at tts_modules.py:278-297
    dur = jnp.array([[2, 2, 3]])
    mel2ph = length_regulator(dur, out_length=7)
    assert mel2ph.tolist() == [[1, 1, 2, 2, 3, 3, 3]]
    # padded output -> zeros
    mel2ph = length_regulator(dur, out_length=10)
    assert mel2ph.tolist() == [[1, 1, 2, 2, 3, 3, 3, 0, 0, 0]]


def test_length_regulator_zero_durations():
    dur = jnp.array([[2, 0, 3, 0]])
    mel2ph = length_regulator(dur, out_length=6)
    assert mel2ph.tolist() == [[1, 1, 3, 3, 3, 0]]


def test_length_regulator_batch_and_roundtrip():
    rng = np.random.default_rng(0)
    dur = rng.integers(0, 5, size=(4, 16)).astype(np.int32)
    total = dur.sum(axis=1).max()
    mel2ph = length_regulator(jnp.asarray(dur), out_length=int(total))
    back = np.asarray(mel2ph_to_dur(mel2ph, 16))
    # roundtrip holds for every item once truncated frames are accounted
    for b in range(4):
        t = dur[b].sum()
        np.testing.assert_array_equal(back[b][: 16], dur[b] * (np.cumsum(dur[b]) <= total) +
                                      np.where(np.cumsum(dur[b]) > total, 0, 0) if t > total else dur[b])


def test_rhythm_regulator_reference_example():
    # docstring example at tts_modules.py:255-261
    ph_dur = jnp.array([[4.0, 2.0, 3.0, 2.0]])
    ph2word = jnp.array([[1, 2, 2, 3]])
    word_dur = jnp.array([[3.0, 4.0, 2.0]])
    out = rhythm_regulator(ph_dur, ph2word, word_dur)
    assert out.tolist() == [[3, 2, 2, 2]]  # round([3, 1.6, 2.4, 2])


def test_stretch_regulator_reference_example():
    # docstring example at tts_modules.py:317-324
    dur = jnp.array([[2, 4, 3]])
    mel2ph = jnp.array([[1, 1, 2, 2, 2, 2, 3, 3, 3]])
    stretch = np.asarray(stretch_regulator(mel2ph, dur))
    golden = np.array([0, 1, 0, 1, 2, 3, 0, 1, 2]) / np.array([2, 2, 4, 4, 4, 4, 3, 3, 3])
    np.testing.assert_allclose(stretch[0], golden, atol=1e-6)


def test_gather_frames():
    feats = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    mel2ph = jnp.array([[1, 1, 2, 0], [3, 2, 0, 0]])
    out = np.asarray(gather_frames(feats, mel2ph))
    np.testing.assert_array_equal(out[0, 0], feats[0, 0])
    np.testing.assert_array_equal(out[0, 2], feats[0, 1])
    np.testing.assert_array_equal(out[0, 3], np.zeros(4))
    np.testing.assert_array_equal(out[1, 0], feats[1, 2])


def test_dur_to_mel2ph_rounding():
    # cumulative rounding: total frames = round(sum/timestep + 0.5)
    durs = jnp.array([[0.25, 0.25, 0.3]])
    timestep = 512 / 44100
    mel2ph = np.asarray(dur_to_mel2ph(durs, timestep, out_length=80))
    total = int(np.round(0.8 / timestep + 0.5))
    assert (mel2ph[0] > 0).sum() == total
    # frame boundaries at round(csum/timestep + 0.5)
    b1 = int(np.round(0.25 / timestep + 0.5))
    assert mel2ph[0, b1 - 1] == 1 and mel2ph[0, b1] == 2
