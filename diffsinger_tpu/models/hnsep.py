"""Vocal-remover CascadedNet harmonic-noise separator in JAX
(reference modules/hnsep/vr/{nets,layers}.py).

Three-stage band-split U-Nets over the complex STFT producing a bounded complex
mask; harmonic = iSTFT(spec * mask). Inference-only (weights converted from the
torch checkpoint); channel-last [B, bins, frames, C] layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffsinger_tpu.models.rmvpe import BatchNormInference


def upsample_x2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with align_corners=True over (H, W) of [B, H, W, C]
    (torch F.interpolate parity)."""

    def up1d(arr, axis):
        n = arr.shape[axis]
        out_n = n * 2
        # positions map: out i -> in i * (n-1)/(out_n-1)
        pos = jnp.arange(out_n) * (n - 1) / (out_n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_n
        w = w.reshape(shape)
        return a * (1 - w) + b * w

    return up1d(up1d(x, 1), 2)


class Conv2DBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: object = 1  # int or (ph, pw)
    dilation: object = 1  # int or (dh, dw)
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        pad = self.pad if isinstance(self.pad, (tuple, list)) else (self.pad, self.pad)
        dil = self.dilation if isinstance(self.dilation, (tuple, list)) else (self.dilation, self.dilation)
        x = nn.Conv(
            self.nout, (self.ksize, self.ksize), strides=(self.stride, self.stride),
            padding=[(pad[0], pad[0]), (pad[1], pad[1])], kernel_dilation=tuple(dil),
            use_bias=False, name="conv",
        )(x)
        x = BatchNormInference(self.nout, name="bn")(x)
        if self.activ == "relu":
            return jax.nn.relu(x)
        return jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU default


class Encoder(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = Conv2DBNActiv(self.nout, 3, self.stride, 1, activ="leaky", name="conv1")(x)
        x = Conv2DBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv2")(x)
        return x


def crop_center_frames(skip, x):
    """Crop skip's frame axis (2) to x's (layers.py:6-22)."""
    if skip.shape[2] == x.shape[2]:
        return skip
    s = (skip.shape[2] - x.shape[2]) // 2
    return skip[:, :, s : s + x.shape[2]]


class Decoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = upsample_x2_align_corners(x)
        if skip is not None:
            skip = crop_center_frames(skip, x)
            x = jnp.concatenate([x, skip], axis=-1)
        return Conv2DBNActiv(self.nout, 3, 1, 1, activ="relu", name="conv1")(x)


class ASPPModule(nn.Module):
    """Anisotropic-dilation ASPP: dilations are (freq, time) pairs
    (BaseNet default ((4,2),(8,4),(12,6)), nets.py:10)."""

    nout: int
    dilations: Sequence = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        h = x.shape[1]
        feat1 = Conv2DBNActiv(self.nout, 1, 1, 0, activ="relu", name="conv1")(
            x.mean(axis=1, keepdims=True)
        )
        feat1 = jnp.repeat(feat1, h, axis=1)
        feat2 = Conv2DBNActiv(self.nout, 1, 1, 0, activ="relu", name="conv2")(x)
        feat3 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[0], self.dilations[0],
                              activ="relu", name="conv3")(x)
        feat4 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[1], self.dilations[1],
                              activ="relu", name="conv4")(x)
        feat5 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[2], self.dilations[2],
                              activ="relu", name="conv5")(x)
        out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
        return Conv2DBNActiv(self.nout, 1, 1, 0, activ="relu", name="bottleneck")(out)


def lstm_cell_step(x_t, h, c, w_ih, w_hh, b_ih, b_hh):
    g = x_t @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    c = f * c + i * jnp.tanh(gg)
    return jnp.tanh(c) * o, c


class BiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        """x: [T, B, I] -> [T, B, 2*hidden] (torch nn.LSTM bidirectional)."""
        t, b, _ = x.shape
        outs = []
        for name in ("fw", "bw"):
            in_dim = x.shape[-1]
            w_ih = self.param(f"{name}_w_ih", nn.initializers.normal(0.02), (4 * self.hidden, in_dim))
            w_hh = self.param(f"{name}_w_hh", nn.initializers.normal(0.02), (4 * self.hidden, self.hidden))
            b_ih = self.param(f"{name}_b_ih", nn.initializers.zeros, (4 * self.hidden,))
            b_hh = self.param(f"{name}_b_hh", nn.initializers.zeros, (4 * self.hidden,))
            xs = x if name == "fw" else jnp.flip(x, axis=0)

            def step(carry, x_t, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                h, c = carry
                h, c = lstm_cell_step(x_t, h, c, w_ih, w_hh, b_ih, b_hh)
                return (h, c), h

            init = (jnp.zeros((b, self.hidden), x.dtype), jnp.zeros((b, self.hidden), x.dtype))
            _, ys = jax.lax.scan(step, init, xs)
            if name == "bw":
                ys = jnp.flip(ys, axis=0)
            outs.append(ys)
        return jnp.concatenate(outs, axis=-1)


class LSTMModule(nn.Module):
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        """x: [B, bins, frames, C] -> [B, bins, frames, 1]."""
        b, nbins, nframes, _ = x.shape
        h = Conv2DBNActiv(1, 1, 1, 0, activ="relu", name="conv")(x)[..., 0]  # [B, bins, frames]
        h = jnp.transpose(h, (2, 0, 1))  # [frames, B, bins]
        h = BiLSTM(self.nout_lstm // 2, name="lstm")(h)  # [frames, B, nout]
        h = nn.Dense(self.nin_lstm, name="dense")(h.reshape(-1, h.shape[-1]))
        # BatchNorm1d over features, eval stats
        h = BatchNormInference(self.nin_lstm, name="dense_bn")(h)
        h = jax.nn.relu(h)
        h = h.reshape(nframes, b, 1, self.nin_lstm)
        return jnp.transpose(h, (1, 3, 0, 2))  # [B, bins, frames, 1]


class BaseNet(nn.Module):
    nout: int
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        e1 = Conv2DBNActiv(self.nout, 3, 1, 1, activ="relu", name="enc1")(x)
        e2 = Encoder(self.nout * 2, name="enc2")(e1)
        e3 = Encoder(self.nout * 4, name="enc3")(e2)
        e4 = Encoder(self.nout * 6, name="enc4")(e3)
        e5 = Encoder(self.nout * 8, name="enc5")(e4)
        h = ASPPModule(self.nout * 8, name="aspp")(e5)
        h = Decoder(self.nout * 6, name="dec4")(h, e4)
        h = Decoder(self.nout * 4, name="dec3")(h, e3)
        h = Decoder(self.nout * 2, name="dec2")(h, e2)
        lstm = LSTMModule(self.nin_lstm, self.nout_lstm, name="lstm_dec2")(h)
        h = jnp.concatenate([h, lstm], axis=-1)
        h = Decoder(self.nout, name="dec1")(h, e1)
        return h


class CascadedNet(nn.Module):
    """Complex-mask separator. Input spec: complex [B, C_audio, bins, frames];
    output mask: complex [B, C_audio, bins, frames] (nets.py:44-131)."""

    n_fft: int
    hop_length: int
    nout: int = 32
    nout_lstm: int = 128
    is_complex: bool = True
    is_mono: bool = False

    @nn.compact
    def __call__(self, spec):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        nin = (4 if self.is_complex else 2) // (2 if self.is_mono else 1)

        # complex [B, C, bins, frames] -> channel-last real [B, bins, frames, 2C]
        x = jnp.concatenate([spec.real, spec.imag], axis=1)
        x = jnp.transpose(x, (0, 2, 3, 1))[:, :max_bin]

        bandw = max_bin // 2
        l1_in = x[:, :bandw]
        h1_in = x[:, bandw:]
        l1 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm, name="stg1_low")(l1_in)
        l1 = Conv2DBNActiv(self.nout // 4, 1, 1, 0, activ="relu", name="stg1_low_out")(l1)
        h1 = BaseNet(self.nout // 4, nin_lstm // 2, self.nout_lstm // 2, name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNet(self.nout, nin_lstm // 2, self.nout_lstm, name="stg2_low")(l2_in)
        l2 = Conv2DBNActiv(self.nout // 2, 1, 1, 0, activ="relu", name="stg2_low_out")(l2)
        h2 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm // 2, name="stg2_high")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = BaseNet(self.nout, nin_lstm, self.nout_lstm, name="stg3_full")(f3_in)

        mask = nn.Conv(nin, (1, 1), use_bias=False, name="out")(f3)  # [B, bins, frames, nin]
        mask = jnp.transpose(mask, (0, 3, 1, 2))  # [B, nin, bins, frames]
        if self.is_complex:
            half = mask.shape[1] // 2
            mask = jax.lax.complex(mask[:, :half], mask[:, half:])
            mag = jnp.abs(mask)
            mask = jnp.tanh(mag) * mask / (mag + 1e-8)
        else:
            mask = jax.nn.sigmoid(mask)
        # replicate-pad the top bin
        pad_n = output_bin - mask.shape[2]
        mask = jnp.concatenate([mask] + [mask[:, :, -1:]] * pad_n, axis=2)
        return mask


# ---------------------------------------------------------------------------
# torch conversion + end-to-end prediction
# ---------------------------------------------------------------------------


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _cbn(state, prefix):
    return {
        "conv": {"kernel": np.transpose(_np(state[f"{prefix}.conv.0.weight"]), (2, 3, 1, 0))},
        "bn": {
            "scale": _np(state[f"{prefix}.conv.1.weight"]),
            "bias": _np(state[f"{prefix}.conv.1.bias"]),
            "mean": _np(state[f"{prefix}.conv.1.running_mean"]),
            "var": _np(state[f"{prefix}.conv.1.running_var"]),
        },
    }


def _basenet(state, prefix):
    p = {
        "enc1": _cbn(state, f"{prefix}.enc1"),
        "aspp": {k: _cbn(state, f"{prefix}.aspp.{src}") for k, src in [
            ("conv1", "conv1.1"), ("conv2", "conv2"), ("conv3", "conv3"),
            ("conv4", "conv4"), ("conv5", "conv5"), ("bottleneck", "bottleneck"),
        ]},
    }
    for enc in ("enc2", "enc3", "enc4", "enc5"):
        p[enc] = {
            "conv1": _cbn(state, f"{prefix}.{enc}.conv1"),
            "conv2": _cbn(state, f"{prefix}.{enc}.conv2"),
        }
    for dec in ("dec4", "dec3", "dec2", "dec1"):
        p[dec] = {"conv1": _cbn(state, f"{prefix}.{dec}.conv1")}
    lstm = {
        "conv": _cbn(state, f"{prefix}.lstm_dec2.conv"),
        "dense": {
            "kernel": np.transpose(_np(state[f"{prefix}.lstm_dec2.dense.0.weight"])),
            "bias": _np(state[f"{prefix}.lstm_dec2.dense.0.bias"]),
        },
        "dense_bn": {
            "scale": _np(state[f"{prefix}.lstm_dec2.dense.1.weight"]),
            "bias": _np(state[f"{prefix}.lstm_dec2.dense.1.bias"]),
            "mean": _np(state[f"{prefix}.lstm_dec2.dense.1.running_mean"]),
            "var": _np(state[f"{prefix}.lstm_dec2.dense.1.running_var"]),
        },
        "lstm": {},
    }
    for suffix, name in (("", "fw"), ("_reverse", "bw")):
        lstm["lstm"][f"{name}_w_ih"] = _np(state[f"{prefix}.lstm_dec2.lstm.weight_ih_l0{suffix}"])
        lstm["lstm"][f"{name}_w_hh"] = _np(state[f"{prefix}.lstm_dec2.lstm.weight_hh_l0{suffix}"])
        lstm["lstm"][f"{name}_b_ih"] = _np(state[f"{prefix}.lstm_dec2.lstm.bias_ih_l0{suffix}"])
        lstm["lstm"][f"{name}_b_hh"] = _np(state[f"{prefix}.lstm_dec2.lstm.bias_hh_l0{suffix}"])
    p["lstm_dec2"] = lstm
    return p


def convert_cascaded_net(state: dict) -> dict:
    p = {
        "stg1_low": _basenet(state, "stg1_low_band_net.0"),
        "stg1_low_out": _cbn(state, "stg1_low_band_net.1"),
        "stg1_high": _basenet(state, "stg1_high_band_net"),
        "stg2_low": _basenet(state, "stg2_low_band_net.0"),
        "stg2_low_out": _cbn(state, "stg2_low_band_net.1"),
        "stg2_high": _basenet(state, "stg2_high_band_net"),
        "stg3_full": _basenet(state, "stg3_full_band_net"),
        "out": {"kernel": np.transpose(_np(state["out.weight"]), (2, 3, 1, 0))},
    }
    return {"params": p}


_SEP_CACHE = {}


def predict_harmonic(model_path, waveform: np.ndarray) -> np.ndarray:
    """Load (cached) CascadedNet + config, run the reference's
    predict_from_audio framing (nets.py:predict_from_audio), return the
    harmonic waveform."""
    import pathlib

    import yaml

    from diffsinger_tpu.dsp.stft import istft, stft_complex
    from diffsinger_tpu.utils.torch_convert import load_torch_file

    model_path = str(model_path)
    if model_path not in _SEP_CACHE:
        cfg_path = pathlib.Path(model_path).with_name("config.yaml")
        with open(cfg_path) as f:
            args = yaml.safe_load(f)
        model = CascadedNet(
            args["n_fft"], args["hop_length"], args["n_out"], args["n_out_lstm"],
            is_complex=True, is_mono=args["is_mono"],
        )
        params = jax.tree.map(jnp.asarray, convert_cascaded_net(load_torch_file(model_path)))
        n_fft, hop = args["n_fft"], args["hop_length"]
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))

        # ONE jitted program for the whole stft -> mask -> istft pipeline
        # (jax.jit's own cache recompiles per padded length). Running this
        # eagerly would dispatch hundreds of single-op programs through the
        # device tunnel AND trip eager-complex gaps on some TPU runtimes
        # (axon implements complex ops under jit but not as eager
        # broadcast/transpose primitives — probed 2026-08-17).
        is_mono = args["is_mono"]

        @jax.jit
        def pipeline(params, x):
            spec = stft_complex(x[None], n_fft=n_fft, hop=hop, win_size=n_fft,
                                window=window, center=True)  # [1, F, K]
            spec_cf = jnp.transpose(spec, (0, 2, 1))[:, None]  # [1, 1, K, F]
            if not is_mono:
                spec_cf = jnp.concatenate([spec_cf, spec_cf], axis=1)
            mask = model.apply(params, spec_cf)
            pred = jnp.mean(spec_cf * mask, axis=1)  # [1, K, F]
            return istft(jnp.transpose(pred, (0, 2, 1)), n_fft=n_fft, hop=hop,
                         win_size=n_fft, window=window, center=True)[0]

        _SEP_CACHE[model_path] = (pipeline, params, args)
    pipeline, params, args = _SEP_CACHE[model_path]

    n_fft, hop = args["n_fft"], args["hop_length"]
    t = len(waveform)
    n_frames = t // hop + 1
    t_pad = (32 * (n_frames // 32 + 1) - 1) * hop - t
    tl_pad = t_pad // 2 // hop * hop
    x = np.pad(waveform, (tl_pad, t_pad - tl_pad))
    wav = pipeline(params, jnp.asarray(x.astype(np.float32)))
    out = np.asarray(wav)[tl_pad : tl_pad + t]
    if len(out) < t:
        out = np.pad(out, (0, t - len(out)))
    return out.astype(np.float32)
