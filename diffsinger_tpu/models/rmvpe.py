"""RMVPE neural pitch extractor in JAX (reference modules/pe/rmvpe/*).

Architecture parity: E2E0 = DeepUnet0 (5-layer residual encoder/decoder with
TimbreFilter skip connections) -> Conv2d(16->3) -> BiGRU -> 360-bin sigmoid over
cents; 16 kHz HTK-mel frontend (128 bins, hop 160); local-average or Viterbi
cents decoding (constants: N_CLASS=360, CONST=1997.379...).

Inference-only (the pretrained checkpoint is converted from torch; BatchNorms
run with stored statistics). NHWC layout; the BiGRU is a `lax.scan` over frames
— small hidden (256) but sequential; a Pallas scan kernel is a future perf item.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsinger_tpu.dsp.pe import BasePE

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191


class BatchNormInference(nn.Module):
    """BatchNorm2d with stored statistics (eval mode)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class ConvBlockRes(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        y = BatchNormInference(self.out_channels, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = BatchNormInference(self.out_channels, name="bn2")(y)
        y = jax.nn.relu(y)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    pool: Optional[tuple]
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"conv_{i}")(x)
        if self.pool is not None:
            pooled = nn.avg_pool(x, self.pool, strides=self.pool)
            return x, pooled
        return x


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d parity (stride/padding/output_padding), NHWC."""

    features: int
    kernel_size: tuple
    stride: tuple
    padding: tuple
    output_padding: tuple

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.normal(0.02),
                            (kh, kw, x.shape[-1], self.features))
        ph = kh - 1 - self.padding[0]
        pw = kw - 1 - self.padding[1]
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(ph, ph + self.output_padding[0]), (pw, pw + self.output_padding[1])],
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y


class ResDecoderBlock(nn.Module):
    out_channels: int
    stride: tuple
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x, concat_tensor):
        out_padding = (0, 1) if self.stride == (1, 2) else (1, 1)
        x = ConvTranspose2dTorch(
            self.out_channels, (3, 3), self.stride, (1, 1), out_padding, name="convt"
        )(x)
        x = BatchNormInference(self.out_channels, name="bn1")(x)
        x = jax.nn.relu(x)
        x = jnp.concatenate([x, concat_tensor], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"conv2_{i}")(x)
        return x


class DeepUnet0(nn.Module):
    kernel_size: tuple = (2, 2)
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        # encoder
        x = BatchNormInference(x.shape[-1], name="encoder_bn")(x)
        concat = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(
                ch, self.kernel_size, self.n_blocks, name=f"encoder_{i}"
            )(x)
            concat.append(skip)
            ch *= 2
        # intermediate: in = ch//2 (last encoder out), out = ch
        for i in range(self.inter_layers):
            out_ch = ch
            x = ResEncoderBlock(out_ch, None, self.n_blocks, name=f"inter_{i}")(x)
        # decoder
        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, self.kernel_size, self.n_blocks, name=f"decoder_{i}")(
                x, concat[-1 - i]
            )
        return x


def gru_cell_step(x_t, h_prev, w_ih, w_hh, b_ih, b_hh):
    """torch GRU cell math. x_t: [B, I], h_prev: [B, H]; weights [3H, *]."""
    gi = x_t @ w_ih.T + b_ih
    gh = h_prev @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h_prev


class BiGRU(nn.Module):
    """Bidirectional multi-layer GRU (torch nn.GRU parity), scan over time."""

    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        for layer in range(self.num_layers):
            outs = []
            for direction, name in ((1, "fw"), (-1, "bw")):
                in_dim = x.shape[-1]
                w_ih = self.param(f"l{layer}_{name}_w_ih", nn.initializers.normal(0.02),
                                  (3 * self.hidden, in_dim))
                w_hh = self.param(f"l{layer}_{name}_w_hh", nn.initializers.normal(0.02),
                                  (3 * self.hidden, self.hidden))
                b_ih = self.param(f"l{layer}_{name}_b_ih", nn.initializers.zeros, (3 * self.hidden,))
                b_hh = self.param(f"l{layer}_{name}_b_hh", nn.initializers.zeros, (3 * self.hidden,))

                xs = x if direction == 1 else jnp.flip(x, axis=1)

                def step(h, x_t, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                    h = gru_cell_step(x_t, h, w_ih, w_hh, b_ih, b_hh)
                    return h, h

                h0 = jnp.zeros((b, self.hidden), x.dtype)
                _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xs, 0, 1))
                ys = jnp.swapaxes(ys, 0, 1)
                if direction == -1:
                    ys = jnp.flip(ys, axis=1)
                outs.append(ys)
            x = jnp.concatenate(outs, axis=-1)
        return x


class E2E0(nn.Module):
    """mel [B, T, M] -> sigmoid cents logits [B, T, N_CLASS] (model.py:8-32)."""

    n_blocks: int = 4
    n_gru: int = 1
    kernel_size: tuple = (2, 2)
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, mel):
        x = mel[:, :, :, None]  # NHWC: [B, T, M, 1]
        x = DeepUnet0(
            self.kernel_size, self.n_blocks, self.en_de_layers, self.inter_layers,
            self.en_out_channels, name="unet",
        )(x)
        x = nn.Conv(3, (3, 3), padding=1, name="cnn")(x)  # [B, T, M, 3]
        b, t = x.shape[:2]
        # torch flattens channel-major: [B, 3, T, M] -> [B, T, 3*M]
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, -1)
        if self.n_gru:
            x = BiGRU(256, self.n_gru, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# decoding (utils.py:8-43)
# ---------------------------------------------------------------------------


def to_local_average_f0(hidden: np.ndarray, center: Optional[np.ndarray] = None,
                        thred: float = 0.03) -> np.ndarray:
    """hidden: [T, N]; returns f0 [T] (0 where unvoiced)."""
    idx = np.arange(N_CLASS)[None, :]
    idx_cents = idx * 20 + CONST
    if center is None:
        center = np.argmax(hidden, axis=1, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=1)
    weight_sum = np.sum(weights, axis=1)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=1) < thred
    return (f0 * ~uv).astype(np.float32)


def _viterbi(prob: np.ndarray, transition: np.ndarray) -> np.ndarray:
    """Log-domain Viterbi (librosa.sequence.viterbi equivalent).
    prob: [N, T] normalized observation probs; transition: [N, N] rows=from."""
    n, t = prob.shape
    log_p = np.log(np.maximum(prob, 1e-30))
    log_a = np.log(np.maximum(transition, 1e-30))
    value = np.zeros((t, n))
    ptr = np.zeros((t, n), dtype=np.int64)
    value[0] = log_p[:, 0] + np.log(1.0 / n)
    for i in range(1, t):
        trans = value[i - 1][:, None] + log_a  # [from, to]
        ptr[i] = np.argmax(trans, axis=0)
        value[i] = log_p[:, i] + trans[ptr[i], np.arange(n)]
    path = np.zeros(t, dtype=np.int64)
    path[-1] = np.argmax(value[-1])
    for i in range(t - 2, -1, -1):
        path[i] = ptr[i + 1, path[i + 1]]
    return path


def to_viterbi_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    if not hasattr(to_viterbi_f0, "transition"):
        xx, yy = np.meshgrid(range(N_CLASS), range(N_CLASS))
        transition = np.maximum(30 - np.abs(xx - yy), 0).astype(np.float64)
        to_viterbi_f0.transition = transition / transition.sum(axis=1, keepdims=True)
    prob = hidden.T.astype(np.float64)
    prob = prob / prob.sum(axis=0)
    path = _viterbi(prob, to_viterbi_f0.transition)
    return to_local_average_f0(hidden, center=path[:, None], thred=thred)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _bn(state, prefix):
    return {
        "scale": state[f"{prefix}.weight"],
        "bias": state[f"{prefix}.bias"],
        "mean": state[f"{prefix}.running_mean"],
        "var": state[f"{prefix}.running_var"],
    }


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))  # [out,in,kh,kw] -> [kh,kw,in,out]


def _convblockres(state, prefix):
    p = {
        "conv1": {"kernel": _conv2d(state[f"{prefix}.conv.0.weight"])},
        "bn1": _bn(state, f"{prefix}.conv.1"),
        "conv2": {"kernel": _conv2d(state[f"{prefix}.conv.3.weight"])},
        "bn2": _bn(state, f"{prefix}.conv.4"),
    }
    if f"{prefix}.shortcut.weight" in state:
        p["shortcut"] = {
            "kernel": _conv2d(state[f"{prefix}.shortcut.weight"]),
            "bias": state[f"{prefix}.shortcut.bias"],
        }
    return p


def convert_rmvpe(torch_state: dict, n_blocks=4, n_gru=1, en_de_layers=5, inter_layers=4) -> dict:
    """torch E2E0 state dict -> flax params."""
    state = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in torch_state.items()}
    p: dict = {"unet": {}}
    u = p["unet"]
    u["encoder_bn"] = _bn(state, "unet.encoder.bn")
    for i in range(en_de_layers):
        layer = {}
        for j in range(n_blocks):
            layer[f"conv_{j}"] = _convblockres(state, f"unet.encoder.layers.{i}.conv.{j}")
        u[f"encoder_{i}"] = layer
    for i in range(inter_layers):
        layer = {}
        for j in range(n_blocks):
            layer[f"conv_{j}"] = _convblockres(state, f"unet.intermediate.layers.{i}.conv.{j}")
        u[f"inter_{i}"] = layer
    for i in range(en_de_layers):
        layer = {
            "convt": {
                "kernel": np.transpose(state[f"unet.decoder.layers.{i}.conv1.0.weight"], (2, 3, 0, 1)),
            },
            "bn1": _bn(state, f"unet.decoder.layers.{i}.conv1.1"),
        }
        for j in range(n_blocks):
            layer[f"conv2_{j}"] = _convblockres(state, f"unet.decoder.layers.{i}.conv2.{j}")
        u[f"decoder_{i}"] = layer
    p["cnn"] = {"kernel": _conv2d(state["cnn.weight"]), "bias": state["cnn.bias"]}
    gru = {}
    for layer in range(n_gru):
        for suffix, name in (("", "fw"), ("_reverse", "bw")):
            gru[f"l{layer}_{name}_w_ih"] = state[f"fc.0.gru.weight_ih_l{layer}{suffix}"]
            gru[f"l{layer}_{name}_w_hh"] = state[f"fc.0.gru.weight_hh_l{layer}{suffix}"]
            gru[f"l{layer}_{name}_b_ih"] = state[f"fc.0.gru.bias_ih_l{layer}{suffix}"]
            gru[f"l{layer}_{name}_b_hh"] = state[f"fc.0.gru.bias_hh_l{layer}{suffix}"]
    p["gru"] = gru
    p["fc"] = {"kernel": np.transpose(state["fc.1.weight"]), "bias": state["fc.1.bias"]}
    return {"params": p}


# ---------------------------------------------------------------------------
# BasePE wrapper (inference.py:15-70)
# ---------------------------------------------------------------------------


class RMVPE(BasePE):
    def provenance(self) -> str:
        import pathlib

        return f"rmvpe({pathlib.Path(self._model_path).name})"

    def __init__(self, model_path, hop_length: int = 160):
        self._model_path = str(model_path)
        from diffsinger_tpu.dsp.mel import MelSpectrogram
        from diffsinger_tpu.utils.torch_convert import load_torch_file

        self.model = E2E0(4, 1, (2, 2))
        ckpt = load_torch_file(model_path)
        self.params = jax.tree.map(jnp.asarray, convert_rmvpe(ckpt["model"]))
        self.hop_length = hop_length
        self.mel = MelSpectrogram(
            sr=SAMPLE_RATE, n_mels=N_MELS, n_fft=WINDOW_LENGTH, win_size=WINDOW_LENGTH,
            hop_size=hop_length, fmin=MEL_FMIN, fmax=MEL_FMAX,
        )
        # RMVPE's frontend uses HTK mels and torch center=True padding
        from diffsinger_tpu.dsp.mel import mel_filterbank

        self._mel_basis = jnp.asarray(
            mel_filterbank(SAMPLE_RATE, WINDOW_LENGTH, N_MELS, MEL_FMIN, MEL_FMAX, htk=True)
        )
        self._apply = jax.jit(lambda p, m: self.model.apply(p, m))

    @functools.partial(jax.jit, static_argnums=0)
    def _frontend(self, audio):
        from diffsinger_tpu.dsp.stft import stft_complex

        window = jnp.asarray(
            (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(WINDOW_LENGTH) / WINDOW_LENGTH)).astype(np.float32)
        )
        spec = jnp.abs(stft_complex(
            audio, n_fft=WINDOW_LENGTH, hop=self.hop_length, win_size=WINDOW_LENGTH,
            window=window, center=True,
        ))  # [B, T, K]
        mel = jnp.einsum("mk,btk->btm", self._mel_basis, spec,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.log(jnp.clip(mel, min=1e-5))

    def infer_from_audio(self, audio: np.ndarray, sample_rate=16000, thred=0.03,
                         use_viterbi=False) -> np.ndarray:
        from diffsinger_tpu.dsp.resample import resample_jax

        audio = jnp.asarray(audio, jnp.float32)[None]
        if sample_rate != SAMPLE_RATE:
            audio = resample_jax(audio, sample_rate, SAMPLE_RATE)
        mel = self._frontend(audio)  # [1, T, M]
        n_frames = mel.shape[1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
        hidden = np.asarray(self._apply(self.params, mel))[0, :n_frames]
        if use_viterbi:
            return to_viterbi_f0(hidden, thred=thred)
        return to_local_average_f0(hidden, thred=thred)

    def get_pitch(self, waveform, samplerate, length, *, hop_size, f0_min=65, f0_max=1100,
                  speed=1, interp_uv=False):
        from diffsinger_tpu.dsp.common import interp_f0
        from diffsinger_tpu.utils.infer_utils import resample_align_curve

        f0 = self.infer_from_audio(waveform, sample_rate=samplerate)
        uv = f0 == 0
        f0, uv = interp_f0(f0, uv)
        hop = int(np.round(hop_size * speed))
        time_step = hop / samplerate
        f0_res = resample_align_curve(f0, 0.01, time_step, length)
        uv_res = resample_align_curve(uv.astype(np.float32), 0.01, time_step, length) > 0.5
        if not interp_uv:
            f0_res[uv_res] = 0
        return f0_res, uv_res
