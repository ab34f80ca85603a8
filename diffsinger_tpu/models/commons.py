"""Shared NN primitives (Flax): init-parity embeddings/linears, sinusoidal and
rotary position embeddings, conv-FFN, and the FastSpeech2 transformer encoder.

Math parity with reference modules/commons/common_layers.py and
modules/fastspeech/tts_modules.py:353-428, re-expressed channel-last for TPU:
activations are [B, T, C] everywhere (C on the 128-wide lane dimension), the
attention softmax accumulates in fp32, and all masking is multiplicative so the
whole encoder is one fused XLA computation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initializers matching the reference
# ---------------------------------------------------------------------------


def normal_embed_init(padding_idx: Optional[int] = None):
    """N(0, dim^-0.5) with zeroed pad row (NormalInitEmbedding, common_layers.py:14-26)."""

    def init(key, shape, dtype=jnp.float32):
        num_embeddings, dim = shape
        w = jax.random.normal(key, shape, dtype) * (dim ** -0.5)
        if padding_idx is not None:
            w = w.at[padding_idx].set(0.0)
        return w

    return init


xavier_uniform = nn.initializers.xavier_uniform()
kaiming_normal_torch = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class Embedding(nn.Module):
    """Embedding with reference init (σ = H^-0.5, zero pad row)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", normal_embed_init(self.padding_idx), (self.num_embeddings, self.features)
        )
        return jnp.take(table, ids, axis=0)


class Linear(nn.Module):
    """Dense with xavier-uniform weights and zero bias (XavierUniformInitLinear)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="dense",
        )(x)


# ---------------------------------------------------------------------------
# Position embeddings
# ---------------------------------------------------------------------------


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffusion-step embedding (SinusoidalPosEmb, common_layers.py:268-280).

    :param t: [B] float timesteps
    :return: [B, dim]
    """
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def sinusoidal_positional_table(num_positions: int, dim: int, padding_idx: int = 0) -> np.ndarray:
    """Absolute positional table (tensor2tensor layout: sin block then cos block),
    matching SinusoidalPositionalEmbedding.get_embedding (common_layers.py:61-78)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    inv = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(num_positions, dtype=np.float64)[:, None] * inv[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    table[padding_idx] = 0
    return table.astype(np.float32)


def rel_positional_encoding(length: int, dim: int) -> np.ndarray:
    """ESPnet-style relative positional signal for positions [length-1 .. -(length-1)],
    (espnet_positional_embedding.py:89-113). Returns [2*length-1, dim]."""
    pos = np.arange(length, dtype=np.float32)
    inv = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe_pos = np.zeros((length, dim), np.float32)
    pe_pos[:, 0::2] = np.sin(pos[:, None] * inv)
    pe_pos[:, 1::2] = np.cos(pos[:, None] * inv)
    pe_neg = np.zeros((length, dim), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos[:, None] * inv)
    pe_neg[:, 1::2] = np.cos(-pos[:, None] * inv)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def apply_rope(x: jnp.ndarray, seq_axis: int = -2) -> jnp.ndarray:
    """Rotary embedding with interleaved-pair convention, full head rotation.

    Matches the vendored lucidrains RotaryEmbedding with default 'lang' freqs:
    freqs_i = theta^(-2i/d), each repeated twice; rotate_half pairs (x0,x1)->(-x1,x0)
    (modules/commons/rotary_embedding_torch.py:35-74, 314-317).

    :param x: [..., L, D] (L on seq_axis=-2)
    """
    d = x.shape[-1]
    L = x.shape[seq_axis]
    freqs = 1.0 / (10000.0 ** (np.arange(0, d, 2)[: d // 2].astype(np.float32) / d))
    t = jnp.arange(L, dtype=jnp.float32)
    angles = t[:, None] * freqs[None, :]  # [L, D/2]
    angles = jnp.repeat(angles, 2, axis=-1)  # [L, D] interleaved
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x2 = x.reshape(*x.shape[:-1], d // 2, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return (x * cos + rot * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Transformer building blocks
# ---------------------------------------------------------------------------


def _flash_attention_available(L: int, D: int) -> bool:
    """Use the Pallas TPU flash-attention kernel only where it pays off:
    long sequences, lane-aligned head dim, TPU backend."""
    import jax

    try:
        return (
            jax.default_backend() == "tpu"
            and L >= 512
            and L % 128 == 0
            and D % 128 == 0
        )
    except Exception:
        return False


class SelfAttentionRoPE(nn.Module):
    """Packed-QKV multi-head self-attention with RoPE
    (MultiheadSelfAttentionWithRoPE, common_layers.py:152-213).

    On TPU with long, lane-aligned sequences the softmax-attention core runs
    through the Pallas flash-attention kernel (O(L) memory, fused online
    softmax); padding is expressed via segment ids. Otherwise the plain XLA
    einsum path is used (these encoders usually see a few hundred tokens, where
    flash tiling has nothing to win).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    use_flash: Optional[bool] = None  # None = auto
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask: jnp.ndarray, deterministic: bool = True):
        B, L, C = x.shape
        H, D = self.num_heads, self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(B, L, H, D).transpose(0, 2, 1, 3)  # [B, H, L, D]

        q, k, v = heads(q), heads(k), heads(v)
        q = apply_rope(q)
        k = apply_rope(k)

        use_flash = self.use_flash
        if use_flash is None:
            use_flash = _flash_attention_available(L, D)
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention,
            )

            # padding as segment ids: valid tokens in segment 1, pads in 0 —
            # cross-segment pairs are masked inside the kernel
            seg = (~key_padding_mask).astype(jnp.int32)
            out = flash_attention(
                q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=1.0 / math.sqrt(D),
            ).astype(x.dtype)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(D)
            neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
            weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, use_bias=False, dtype=self.dtype, name="out_proj")(out)


class SelfAttentionAbs(nn.Module):
    """Standard MHA (torch nn.MultiheadAttention equivalent, bias=False)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask: jnp.ndarray, deterministic: bool = True):
        B, L, C = x.shape
        H, D = self.num_heads, self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(B, L, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(D)
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v).transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, use_bias=False, dtype=self.dtype, name="out_proj")(out)


def swiglu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    out, gate = jnp.split(x, 2, axis=axis)
    return out * jax.nn.silu(gate)


class TransformerFFN(nn.Module):
    """Conv1d(k) -> ×k^-0.5 -> act -> dropout -> Linear
    (TransformerFFNLayer, common_layers.py:120-149)."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    dropout: float = 0.0
    act: str = "gelu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        filter_size = self.filter_size * 2 if self.act == "swiglu" else self.filter_size
        x = nn.Conv(
            filter_size,
            kernel_size=(self.kernel_size,),
            padding=self.kernel_size // 2,
            dtype=self.dtype,
            name="ffn_1",
        )(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "swish":
            x = jax.nn.silu(x)
        elif self.act == "swiglu":
            x = swiglu(x)
        else:
            raise ValueError(f"{self.act} is not a valid activation")
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return Linear(self.hidden_size, dtype=self.dtype, name="ffn_2")(x)


class EncSALayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block (common_layers.py:216-265)."""

    hidden_size: int
    num_heads: int
    dropout: float
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    kernel_size: int = 9
    act: str = "gelu"
    use_rope: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: jnp.ndarray, deterministic: bool = True):
        nonpadding = (1.0 - padding_mask.astype(x.dtype))[:, :, None]
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        attn_cls = SelfAttentionRoPE if self.use_rope else SelfAttentionAbs
        y = attn_cls(
            self.hidden_size,
            self.num_heads,
            dropout=self.attention_dropout if self.use_rope else 0.0,
            dtype=self.dtype,
            name="self_attn",
        )(y, padding_mask, deterministic=deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = (residual + y) * nonpadding

        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        y = TransformerFFN(
            self.hidden_size,
            4 * self.hidden_size,
            kernel_size=self.kernel_size,
            dropout=self.relu_dropout,
            act=self.act,
            dtype=self.dtype,
            name="ffn",
        )(y, deterministic=deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return (residual + y) * nonpadding


class FastSpeech2Encoder(nn.Module):
    """N-layer transformer with ×sqrt(H) input scaling and final LN
    (tts_modules.py:353-428). With ``use_rope`` no absolute positions are added;
    otherwise a fixed sinusoidal table is used (the rel_pos branch of the
    reference reduces to plain attention since pos_bias was never wired in)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    rel_pos: bool = True
    use_rope: bool = True
    max_positions: int = 4096
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        main_embed: jnp.ndarray,
        extra_embed: Optional[jnp.ndarray],
        padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = math.sqrt(self.hidden_size) * main_embed
        if extra_embed is not None:
            x = x + extra_embed
        if self.use_pos_embed and not self.use_rope:
            if self.rel_pos:
                # ESPnet RelPositionalEncoding scales x by sqrt(H) again and adds
                # nothing absolute; the pos term feeds a rel-attn variant the
                # reference never enables, so only the scale matters here.
                x = x * math.sqrt(self.hidden_size)
            else:
                table = jnp.asarray(
                    sinusoidal_positional_table(self.max_positions, self.hidden_size)
                )
                positions = jnp.cumsum(~padding_mask, axis=1) * (~padding_mask)
                x = x + jnp.take(table, positions, axis=0)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        nonpadding = (1.0 - padding_mask.astype(x.dtype))[:, :, None]
        x = x * nonpadding
        for i in range(self.num_layers):
            x = EncSALayer(
                self.hidden_size,
                self.num_heads,
                dropout=self.dropout,
                attention_dropout=0.0,
                relu_dropout=self.dropout,
                kernel_size=self.ffn_kernel_size,
                act=self.ffn_act,
                use_rope=self.use_rope,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, padding_mask, deterministic=deterministic) * nonpadding
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x) * nonpadding
        return x


def resolve_remat_policy(remat):
    """Map the ``recompute_grads`` config value to a jax.checkpoint policy.

    - False/None: no remat
    - True / "full": remat everything (activation memory O(1) layers,
      ~1/3 extra compute)
    - "dots" / "dots_no_batch": SELECTIVE remat — save matmul outputs,
      recompute only the cheap elementwise/norm chains between them on the
      backward pass. On an HBM-bound training step this trades a little
      recompute for less saved-activation traffic without full remat's
      extra-bytes pathology (docs/perf/train_step_parts.json ab_runs).

    Returns (enabled, policy_or_None).
    """
    import jax

    if not remat:
        return False, None
    if remat == "full" or not isinstance(remat, str):
        # any truthy non-string (True, legacy 1) means full remat, as the old
        # bool() coercion did
        return True, None
    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if remat not in policies:
        raise ValueError(
            f"recompute_grads={remat!r}: expected bool, 'full', 'dots', or "
            "'dots_no_batch'")
    return True, policies[remat]
