"""FastSpeech2 acoustic encoder (reference modules/fastspeech/acoustic_encoder.py).

Token-level embeddings -> transformer -> frame-level gather + additive
conditioning embeds (spk / f0 / variances / key_shift / speed), all [B, T, H]
channel-last.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from diffsinger_tpu.models.commons import Embedding, FastSpeech2Encoder, Linear
from diffsinger_tpu.utils.seq import gather_frames, mel2ph_to_dur


class FastSpeech2Acoustic(nn.Module):
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
    use_spk_id: bool = False
    num_spk: int = 1
    variance_embed_list: tuple = ()
    use_key_shift_embed: bool = False
    use_speed_embed: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        mel2ph: jnp.ndarray,
        f0: jnp.ndarray,
        key_shift: Optional[jnp.ndarray] = None,
        speed: Optional[jnp.ndarray] = None,
        spk_embed_id: Optional[jnp.ndarray] = None,
        spk_mix_embed: Optional[jnp.ndarray] = None,
        languages: Optional[jnp.ndarray] = None,
        variances: Optional[dict] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns frame-level condition [B, T_mel, H]."""
        h = self.hidden_size
        txt_embed = Embedding(self.vocab_size, h, padding_idx=0, name="txt_embed")(txt_tokens)
        dur = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]).astype(jnp.float32)
        extra_embed = Linear(h, name="dur_embed")(dur[:, :, None])
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

        condition = gather_frames(encoder_out, mel2ph)

        if self.use_spk_id:
            if spk_mix_embed is not None:
                spk_embed = spk_mix_embed
            else:
                spk_embed = Embedding(self.num_spk, h, name="spk_embed")(spk_embed_id)[:, None, :]
            condition = condition + spk_embed
        elif self.num_spk > 1:
            # keep params allocated for checkpoint compatibility even if unused
            pass

        f0_mel = jnp.log(1 + f0 / 700)
        condition = condition + Linear(h, name="pitch_embed")(f0_mel[:, :, None])

        variances = variances or {}
        for v_name in self.variance_embed_list:
            condition = condition + Linear(h, name=f"variance_embeds_{v_name}")(
                variances[v_name][:, :, None]
            )
        if self.use_key_shift_embed:
            condition = condition + Linear(h, name="key_shift_embed")(key_shift[:, :, None])
        if self.use_speed_embed:
            condition = condition + Linear(h, name="speed_embed")(speed[:, :, None])
        return condition

    @classmethod
    def from_hparams(cls, hp: dict, vocab_size: int, dtype=None) -> "FastSpeech2Acoustic":
        variance_list = tuple(
            v for v in ("energy", "breathiness", "voicing", "tension")
            if hp.get(f"use_{v}_embed", False)
        )
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
            use_spk_id=hp.get("use_spk_id", False),
            num_spk=hp.get("num_spk", 1),
            variance_embed_list=variance_list,
            use_key_shift_embed=hp.get("use_key_shift_embed", False),
            use_speed_embed=hp.get("use_speed_embed", False),
            dtype=dtype,
        )
