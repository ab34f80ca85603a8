"""FastSpeech2 variance encoder, duration predictor, melody encoder
(reference modules/fastspeech/variance_encoder.py, tts_modules.py:53-134).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsinger_tpu.models.commons import Embedding, FastSpeech2Encoder, Linear


class DurationPredictor(nn.Module):
    """Conv stack predicting log-domain durations (tts_modules.py:53-134).

    Training returns the raw log-domain output [B, T]; inference returns
    linear-domain durations clamped at 0.
    """

    n_layers: int = 5
    n_chans: int = 512
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, x_masks: jnp.ndarray, infer: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        """xs: [B, T, H]; x_masks: [B, T] bool (True = padding)."""
        nonpadding = (1.0 - x_masks.astype(xs.dtype))[:, :, None]
        for i in range(self.n_layers):
            xs = nn.Conv(
                self.n_chans, kernel_size=(self.kernel_size,), padding=self.kernel_size // 2,
                dtype=self.dtype, name=f"conv_{i}",
            )(xs)
            xs = jax.nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-12, name=f"norm_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
            xs = xs * nonpadding
        xs = Linear(1, name="linear")(xs) * nonpadding  # [B, T, 1]
        dur_log = xs[:, :, 0]
        dur = jnp.exp(dur_log) - self.offset
        if infer:
            return jnp.clip(dur, min=0.0)
        return dur_log  # loss computed in log domain against log(target + offset)


class VariancePredictor(nn.Module):
    """Conv-stack scalar-curve predictor (reference tts_modules.py:137-184;
    kept for inventory parity — the production variance path uses the
    diffusion/reflow heads instead)."""

    vmin: float
    vmax: float
    n_layers: int = 5
    n_chans: int = 512
    kernel_size: int = 5
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, infer: bool = True, deterministic: bool = True):
        """xs: [B, T, H] -> [B, T]."""
        from diffsinger_tpu.models.commons import sinusoidal_positional_table

        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        table = jnp.asarray(sinusoidal_positional_table(4096, xs.shape[-1]))
        positions = jnp.arange(1, xs.shape[1] + 1)
        xs = xs + alpha * jnp.take(table, positions, axis=0)[None]
        for i in range(self.n_layers):
            xs = nn.Conv(self.n_chans, kernel_size=(self.kernel_size,),
                         padding=self.kernel_size // 2, dtype=self.dtype, name=f"conv_{i}")(xs)
            xs = jax.nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-12, name=f"norm_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        xs = Linear(1, name="linear")(xs)[:, :, 0]
        if infer:
            xs = (xs + 1) / 2 * (self.vmax - self.vmin) + self.vmin
        return xs


class PitchPredictor(nn.Module):
    """Binned sigmoid pitch predictor (reference tts_modules.py:187-247;
    inventory parity — production pitch uses the diffusion/reflow head)."""

    vmin: float
    vmax: float
    num_bins: int = 300
    deviation: float = 1.0
    n_layers: int = 5
    n_chans: int = 384
    kernel_size: int = 5
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, base: jnp.ndarray, deterministic: bool = True):
        """xs: [B, T, H]; base: [B, T] -> (pitch [B, T], logits [B, T, N])."""
        from diffsinger_tpu.models.commons import sinusoidal_positional_table

        interval = (self.vmax - self.vmin) / (self.num_bins - 1)
        xs = xs + Linear(xs.shape[-1], name="base_pitch_embed")(base[:, :, None])
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        table = jnp.asarray(sinusoidal_positional_table(4096, xs.shape[-1]))
        positions = jnp.arange(1, xs.shape[1] + 1)
        xs = xs + alpha * jnp.take(table, positions, axis=0)[None]
        for i in range(self.n_layers):
            xs = nn.Conv(self.n_chans, kernel_size=(self.kernel_size,),
                         padding=self.kernel_size // 2, dtype=self.dtype, name=f"conv_{i}")(xs)
            xs = jax.nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-12, name=f"norm_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        logits = Linear(self.num_bins, name="linear")(xs)  # [B, T, N]
        probs = jax.nn.sigmoid(logits)
        bins = jnp.sum(jnp.arange(self.num_bins) * probs, axis=2) / jnp.maximum(
            jnp.sum(probs, axis=2), 1e-8
        )
        pitch = bins * interval + self.vmin
        return pitch + base, logits


class FastSpeech2Variance(nn.Module):
    vocab_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    enc_ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    rel_pos: bool = True
    use_rope: bool = True
    use_lang_id: bool = False
    num_lang: int = 1
    predict_dur: bool = True
    dur_args: dict = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        midi: jnp.ndarray,
        ph2word: jnp.ndarray,
        ph_dur: Optional[jnp.ndarray] = None,
        word_dur: Optional[jnp.ndarray] = None,
        spk_embed: Optional[jnp.ndarray] = None,
        languages: Optional[jnp.ndarray] = None,
        infer: bool = True,
        deterministic: bool = True,
    ):
        """Returns (encoder_out [B, T_ph, H], dur_pred [B, T_ph] | None).

        In word mode (predict_dur), word durations come from ``word_dur`` at
        inference or are aggregated from ``ph_dur`` in training
        (variance_encoder.py:69-88).
        """
        h = self.hidden_size
        txt_embed = Embedding(self.vocab_size, h, padding_idx=0, name="txt_embed")(txt_tokens)

        if self.predict_dur:
            b, t_ph = txt_tokens.shape
            prev = jnp.pad(ph2word[:, :-1], ((0, 0), (1, 0)))
            onset = (ph2word - prev) > 0
            onset_embed = Embedding(2, h, name="onset_embed")(onset.astype(jnp.int32))
            if word_dur is None or not infer:
                t_w = ph2word.shape[1]  # an upper bound on word count
                wd = jnp.zeros((b, t_w + 1), dtype=jnp.float32)
                wd = wd.at[jnp.arange(b)[:, None], ph2word].add(ph_dur.astype(jnp.float32))
                word_dur = wd[:, 1:]
            wd_pad = jnp.pad(word_dur.astype(jnp.float32), ((0, 0), (1, 0)))
            word_dur_ph = jnp.take_along_axis(wd_pad, ph2word, axis=1)
            extra_embed = onset_embed + Linear(h, name="word_dur_embed")(word_dur_ph[:, :, None])
        else:
            extra_embed = Linear(h, name="ph_dur_embed")(ph_dur.astype(jnp.float32)[:, :, None])

        if self.use_lang_id:
            extra_embed = extra_embed + Embedding(
                self.num_lang + 1, h, padding_idx=0, name="lang_embed"
            )(languages)

        encoder_out = FastSpeech2Encoder(
            hidden_size=h,
            num_layers=self.enc_layers,
            ffn_kernel_size=self.enc_ffn_kernel_size,
            ffn_act=self.ffn_act,
            dropout=self.dropout,
            num_heads=self.num_heads,
            use_pos_embed=self.use_pos_embed,
            rel_pos=self.rel_pos,
            use_rope=self.use_rope,
            dtype=self.dtype,
            name="encoder",
        )(txt_embed, extra_embed, txt_tokens == 0, deterministic=deterministic)

        if not self.predict_dur:
            return encoder_out, None

        dur_args = self.dur_args or {}
        dur_cond = encoder_out + Embedding(128, h, name="midi_embed")(midi)
        if spk_embed is not None:
            dur_cond = dur_cond + spk_embed
        dur_pred = DurationPredictor(
            n_chans=dur_args.get("hidden_size", 512),
            n_layers=dur_args.get("num_layers", 5),
            kernel_size=dur_args.get("kernel_size", 3),
            dropout_rate=dur_args.get("dropout", 0.1),
            offset=dur_args.get("log_offset", 1.0),
            dtype=self.dtype,
            name="dur_predictor",
        )(dur_cond, txt_tokens == 0, infer=infer, deterministic=deterministic)
        return encoder_out, dur_pred

    @classmethod
    def from_hparams(cls, hp: dict, vocab_size: int, dtype=None) -> "FastSpeech2Variance":
        return cls(
            vocab_size=vocab_size,
            hidden_size=hp["hidden_size"],
            enc_layers=hp["enc_layers"],
            enc_ffn_kernel_size=hp["enc_ffn_kernel_size"],
            ffn_act=hp["ffn_act"],
            dropout=hp["dropout"],
            num_heads=hp["num_heads"],
            use_pos_embed=hp["use_pos_embed"],
            rel_pos=hp.get("rel_pos", False),
            use_rope=hp.get("use_rope", False),
            use_lang_id=hp.get("use_lang_id", False),
            num_lang=hp.get("num_lang", 1),
            predict_dur=hp["predict_dur"],
            dur_args=dict(hp.get("dur_prediction_args", {})),
            dtype=dtype,
        )


class MelodyEncoder(nn.Module):
    """Note-level encoder (variance_encoder.py:102-148)."""

    hidden_size: int = 128
    out_size: int = 256
    enc_layers: int = 4
    enc_ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    rel_pos: bool = True
    use_rope: bool = True
    use_glide_embed: bool = False
    glide_types: tuple = ("up", "down")
    glide_embed_scale: float = 11.313708498984760
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        note_midi: jnp.ndarray,
        note_rest: jnp.ndarray,
        note_dur: jnp.ndarray,
        glide: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = self.hidden_size
        midi_embed = Linear(h, name="note_midi_embed")(note_midi[:, :, None]) * (
            ~note_rest[:, :, None]
        )
        dur_embed = Linear(h, name="note_dur_embed")(note_dur.astype(jnp.float32)[:, :, None])
        extra = dur_embed
        if self.use_glide_embed:
            extra = extra + Embedding(
                len(self.glide_types) + 1, h, padding_idx=0, name="note_glide_embed"
            )(glide) * self.glide_embed_scale
        out = FastSpeech2Encoder(
            hidden_size=h,
            num_layers=self.enc_layers,
            ffn_kernel_size=self.enc_ffn_kernel_size,
            ffn_act=self.ffn_act,
            dropout=self.dropout,
            num_heads=self.num_heads,
            use_pos_embed=self.use_pos_embed,
            rel_pos=self.rel_pos,
            use_rope=self.use_rope,
            dtype=self.dtype,
            name="encoder",
        )(midi_embed, extra, note_midi < 0, deterministic=deterministic)
        return Linear(self.out_size, name="out_proj")(out)

    @classmethod
    def from_hparams(cls, hp: dict, dtype=None) -> "MelodyEncoder":
        enc = dict(hp.get("melody_encoder_args", {}))

        def get(key, default=None):
            return enc.get(key, hp.get(key, default))

        return cls(
            hidden_size=get("hidden_size"),
            out_size=hp["hidden_size"],
            enc_layers=get("enc_layers"),
            enc_ffn_kernel_size=get("enc_ffn_kernel_size"),
            ffn_act=get("ffn_act"),
            dropout=get("dropout"),
            num_heads=get("num_heads"),
            use_pos_embed=get("use_pos_embed", True),
            rel_pos=get("rel_pos", False),
            use_rope=get("use_rope", False),
            use_glide_embed=hp.get("use_glide_embed", False),
            glide_types=tuple(hp.get("glide_types", ("up", "down"))),
            glide_embed_scale=hp.get("glide_embed_scale", 11.313708498984760),
            dtype=dtype,
        )
