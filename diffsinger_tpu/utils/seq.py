"""JAX sequence/alignment ops: length regulation, rhythm regulation, mel2ph.

These are the XLA-native re-expressions of reference
modules/fastspeech/tts_modules.py:250-350. All shapes are static: the mel-frame
axis length is a padded bucket size chosen by the caller; positions beyond the
real content map to 0 (the PAD token slot).

Conventions (identical to the reference):
* ``mel2ph`` is 1-based: frame -> phoneme index + 1; 0 means padding.
* ``ph2word`` is 1-based: phoneme -> word index; 0 means padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulator(dur: jnp.ndarray, out_length: int) -> jnp.ndarray:
    """Expand durations into a frame->token map.

    [B, T_txt] int durations -> [B, out_length] int32 mel2ph (1-based, 0 = pad).

    O(T log T) via searchsorted over the duration cumsum — equivalent to the
    reference's O(T_txt x T_mel) mask formulation (tts_modules.py:278-311) but
    with static output length for XLA.
    """
    dur = dur.astype(jnp.int32)
    csum = jnp.cumsum(dur, axis=1)  # [B, T_txt]
    total = csum[:, -1:]
    pos = jnp.arange(out_length, dtype=jnp.int32)[None, :]  # [1, T_mel]

    def per_item(c, p):
        return jnp.searchsorted(c, p, side="right").astype(jnp.int32)

    idx = jax.vmap(per_item)(csum, jnp.broadcast_to(pos, (dur.shape[0], out_length)))
    mel2ph = jnp.where(pos < total, idx + 1, 0)
    return mel2ph


def mel2ph_to_dur(mel2ph: jnp.ndarray, t_txt: int, max_dur: int | None = None) -> jnp.ndarray:
    """Frame->token map back to durations: [B, T_mel] -> [B, t_txt]
    (reference tts_modules.py:344-350)."""
    b = mel2ph.shape[0]
    dur = jnp.zeros((b, t_txt + 1), dtype=jnp.int32)
    dur = dur.at[jnp.arange(b)[:, None], mel2ph].add(1)
    dur = dur[:, 1:]
    if max_dur is not None:
        dur = jnp.clip(dur, max=max_dur)
    return dur


def rhythm_regulator(
    ph_dur: jnp.ndarray, ph2word: jnp.ndarray, word_dur: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Rescale phoneme durations so each word's phonemes sum to the word duration
    (reference tts_modules.py:250-275).

    :param ph_dur: [B, T_ph] float
    :param ph2word: [B, T_ph] int, 1-based, 0 = pad
    :param word_dur: [B, T_w] float
    :return: [B, T_ph] int32
    """
    ph_dur = ph_dur.astype(jnp.float32) * (ph2word > 0)
    word_dur = word_dur.astype(jnp.float32)
    b, t_ph = ph_dur.shape
    t_w = word_dur.shape[1]
    word_dur_in = jnp.zeros((b, t_w + 1), dtype=jnp.float32)
    word_dur_in = word_dur_in.at[jnp.arange(b)[:, None], ph2word].add(ph_dur)[:, 1:]
    alpha_w = word_dur / jnp.clip(word_dur_in, min=eps)  # [B, T_w]
    alpha_w_pad = jnp.pad(alpha_w, ((0, 0), (1, 0)))
    alpha_ph = jnp.take_along_axis(alpha_w_pad, ph2word, axis=1)
    return jnp.round(ph_dur * alpha_ph).astype(jnp.int32)


def stretch_regulator(mel2ph: jnp.ndarray, dur: jnp.ndarray) -> jnp.ndarray:
    """Within-phoneme progress ratio in [0, 1) per frame
    (reference tts_modules.py:314-341).

    :param mel2ph: [B, T_mel] 1-based
    :param dur: [B, T_txt]
    """
    dur = jnp.pad(dur, ((0, 0), (1, 0)), constant_values=1)  # avoid div by zero
    mel2dur = jnp.take_along_axis(dur, mel2ph, axis=1).astype(jnp.float32)
    bound = mel2ph[:, 1:] > mel2ph[:, :-1]
    bound = jnp.pad(bound, ((0, 0), (0, 1)), constant_values=True)
    delta = 1 - bound * mel2dur
    delta = jnp.pad(delta[:, :-1], ((0, 0), (1, 0)))
    denorm = jnp.cumsum(delta, axis=1)
    return denorm / mel2dur * (mel2ph > 0)


def gather_frames(token_feats: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Broadcast token-level features to frames: [B, T_txt, H], [B, T_mel] ->
    [B, T_mel, H]; mel2ph==0 selects a zero row (pad), as in the reference's
    F.pad + gather idiom (modules/toplevel.py:232-234)."""
    padded = jnp.pad(token_feats, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(padded, mel2ph[:, :, None], axis=1)


def dur_to_mel2ph(
    durs_sec: jnp.ndarray, timestep: float, out_length: int
) -> jnp.ndarray:
    """Second-domain durations -> mel2ph, with the reference's rounding
    (utils/binarizer_utils.py:29-39): cumulative rounding keeps total length.

    :param durs_sec: [B, T_ph] float seconds
    """
    acc = jnp.round(jnp.cumsum(durs_sec, axis=1) / timestep + 0.5).astype(jnp.int32)
    dur_frames = jnp.diff(acc, axis=1, prepend=jnp.zeros((durs_sec.shape[0], 1), jnp.int32))
    return length_regulator(dur_frames, out_length)
