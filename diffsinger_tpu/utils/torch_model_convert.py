"""Torch DiffSinger checkpoint -> JAX params conversion for the acoustic and
variance models (SURVEY.md §7.2#6: name mapping, Conv1d/Linear transpositions,
packed-qkv layouts, buffer exclusion, legacy ignore lists).

Handles Lightning checkpoints (``state_dict`` with ``model.`` prefix) as well as
bare state dicts. Layout rules:

* torch ``Linear``  [out, in]      -> flax ``Dense``   kernel [in, out]
* torch ``Conv1d``  [out, in, k]   -> flax ``nn.Conv`` kernel [k, in, out]
* torch depthwise Conv1d [C, 1, k] -> flax (feature_group_count=C) [k, 1, C]
* 1x1 Conv1d used as a projection  -> flax ``Dense``   kernel [in, out]
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

# legacy parameters the reference itself ignores at load (utils/__init__.py:171-173)
LEGACY_IGNORES = ("fs2.encoder.embed_tokens",)


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(state, prefix, dense=True):
    out = {"kernel": np.transpose(_np(state[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return {"dense": out} if dense else out


def _conv1d(state, prefix):
    w = _np(state[f"{prefix}.weight"])  # [out, in, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def _conv1x1_as_dense(state, prefix):
    w = _np(state[f"{prefix}.weight"])  # [out, in, 1]
    out = {"kernel": np.transpose(w[:, :, 0])}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def _layernorm(state, prefix):
    return {"scale": _np(state[f"{prefix}.weight"]), "bias": _np(state[f"{prefix}.bias"])}


def _embedding(state, prefix):
    return {"embedding": _np(state[f"{prefix}.weight"])}


def strip_model_prefix(state: Dict) -> Dict:
    out = {}
    for k, v in state.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if any(k2.startswith(p) for p in LEGACY_IGNORES):
            continue
        out[k2] = v
    return out


# ---------------------------------------------------------------------------
# sub-structures
# ---------------------------------------------------------------------------


def _enc_layer(state, prefix, use_rope: bool):
    """EncSALayer (common_layers.py:216-265) -> commons.EncSALayer params."""
    p = {
        "layer_norm1": _layernorm(state, f"{prefix}.layer_norm1"),
        "layer_norm2": _layernorm(state, f"{prefix}.layer_norm2"),
        "ffn": {
            "ffn_1": _conv1d(state, f"{prefix}.ffn.ffn_1"),
            "ffn_2": _linear(state, f"{prefix}.ffn.ffn_2"),
        },
    }
    attn = {}
    if use_rope:
        attn["in_proj"] = {"kernel": np.transpose(_np(state[f"{prefix}.self_attn.in_proj.weight"]))}
        attn["out_proj"] = {"kernel": np.transpose(_np(state[f"{prefix}.self_attn.out_proj.weight"]))}
    else:
        attn["in_proj"] = {
            "kernel": np.transpose(_np(state[f"{prefix}.self_attn.in_proj_weight"]))
        }
        attn["out_proj"] = {
            "kernel": np.transpose(_np(state[f"{prefix}.self_attn.out_proj.weight"]))
        }
    p["self_attn"] = attn
    return p


def _fs2_encoder(state, prefix, num_layers: int, use_rope: bool):
    p = {"layer_norm": _layernorm(state, f"{prefix}.layer_norm")}
    for i in range(num_layers):
        p[f"layers_{i}"] = _enc_layer(state, f"{prefix}.layers.{i}.op", use_rope)
    return p


def _wavenet(state, prefix, num_layers: int):
    p = {
        "input_projection": _conv1x1_as_dense(state, f"{prefix}.input_projection"),
        "mlp_0": _linear(state, f"{prefix}.mlp.0", dense=False),
        "mlp_2": _linear(state, f"{prefix}.mlp.2", dense=False),
        "skip_projection": _conv1x1_as_dense(state, f"{prefix}.skip_projection"),
        "output_projection": _conv1x1_as_dense(state, f"{prefix}.output_projection"),
    }
    for i in range(num_layers):
        q = f"{prefix}.residual_layers.{i}"
        p[f"residual_layers_{i}"] = {
            "dilated_conv": _conv1d(state, f"{q}.dilated_conv"),
            "diffusion_projection": _linear(state, f"{q}.diffusion_projection", dense=False),
            "conditioner_projection": _conv1x1_as_dense(state, f"{q}.conditioner_projection"),
            "output_projection": _conv1x1_as_dense(state, f"{q}.output_projection"),
        }
    return p


def _lynxnet(state, prefix, num_layers: int):
    p = {
        "input_projection": _conv1x1_as_dense(state, f"{prefix}.input_projection"),
        "diffusion_embedding_1": _linear(state, f"{prefix}.diffusion_embedding.1", dense=False),
        "diffusion_embedding_3": _linear(state, f"{prefix}.diffusion_embedding.3", dense=False),
        "norm": _layernorm(state, f"{prefix}.norm"),
        "output_projection": _conv1x1_as_dense(state, f"{prefix}.output_projection"),
    }
    for i in range(num_layers):
        q = f"{prefix}.residual_layers.{i}"
        # convmodule.net: 0=LayerNorm, 2=pw conv, 4=dw conv, 5=PReLU, 6=pw conv
        dw = _np(state[f"{q}.convmodule.net.4.weight"])  # [inner, 1, k]
        conv = {
            "norm": _layernorm(state, f"{q}.convmodule.net.0"),
            "pw_conv1": _conv1d(state, f"{q}.convmodule.net.2"),
            "dw_conv": {
                "kernel": np.transpose(dw, (2, 1, 0)),
                "bias": _np(state[f"{q}.convmodule.net.4.bias"]),
            },
            "pw_conv2": _conv1d(state, f"{q}.convmodule.net.6"),
        }
        if f"{q}.convmodule.net.5.weight" in state:
            conv["act"] = {"alpha": _np(state[f"{q}.convmodule.net.5.weight"])}
        p[f"residual_layers_{i}"] = {
            "conditioner_projection": _conv1x1_as_dense(state, f"{q}.conditioner_projection"),
            "diffusion_projection": _conv1x1_as_dense(state, f"{q}.diffusion_projection"),
            "convmodule": conv,
        }
    return p


def _backbone(state, prefix, backbone_type: str, backbone_args: dict):
    if backbone_type == "wavenet":
        return _wavenet(state, prefix, backbone_args.get("num_layers", 20))
    if backbone_type == "lynxnet":
        return _lynxnet(state, prefix, backbone_args.get("num_layers", 6))
    raise NotImplementedError(backbone_type)


def _convnext_decoder(state, prefix, num_layers: int):
    p = {
        "inconv": _conv1d(state, f"{prefix}.inconv"),
        "outconv": _conv1d(state, f"{prefix}.outconv"),
    }
    for i in range(num_layers):
        q = f"{prefix}.conv.{i}"
        dw = _np(state[f"{q}.dwconv.weight"])  # [C, 1, 7]
        p[f"conv_{i}"] = {
            "dwconv": {"kernel": np.transpose(dw, (2, 1, 0)), "bias": _np(state[f"{q}.dwconv.bias"])},
            "norm": _layernorm(state, f"{q}.norm"),
            "pwconv1": _linear(state, f"{q}.pwconv1", dense=False),
            "pwconv2": _linear(state, f"{q}.pwconv2", dense=False),
            "gamma": _np(state[f"{q}.gamma"]),
        }
    return p


def _fs2_acoustic(state, hp, prefix="fs2"):
    use_rope = hp.get("use_rope", False)
    p = {
        "txt_embed": _embedding(state, f"{prefix}.txt_embed"),
        "dur_embed": _linear(state, f"{prefix}.dur_embed"),
        "pitch_embed": _linear(state, f"{prefix}.pitch_embed"),
        "encoder": _fs2_encoder(state, f"{prefix}.encoder", hp["enc_layers"], use_rope),
    }
    if hp.get("use_lang_id", False):
        p["lang_embed"] = _embedding(state, f"{prefix}.lang_embed")
    if hp.get("use_spk_id", False):
        p["spk_embed"] = _embedding(state, f"{prefix}.spk_embed")
    for v in ("energy", "breathiness", "voicing", "tension"):
        if hp.get(f"use_{v}_embed", False):
            p[f"variance_embeds_{v}"] = _linear(state, f"{prefix}.variance_embeds.{v}")
    if hp.get("use_key_shift_embed", False):
        p["key_shift_embed"] = _linear(state, f"{prefix}.key_shift_embed")
    if hp.get("use_speed_embed", False):
        p["speed_embed"] = _linear(state, f"{prefix}.speed_embed")
    return p


def _core_fn_prefix(state: Dict, outer: str) -> str:
    """ddpm names its backbone denoise_fn, reflow velocity_fn (ddpm.py:60, reflow.py:18)."""
    for fn in ("denoise_fn", "velocity_fn"):
        if any(k.startswith(f"{outer}.{fn}.") for k in state):
            return f"{outer}.{fn}"
    raise KeyError(f"no denoiser under '{outer}'")


def convert_acoustic(torch_state: Dict, hp: dict) -> Dict:
    """Torch DiffSingerAcoustic state dict -> flax params for
    diffsinger_tpu.models.toplevel.AcousticModule."""
    from diffsinger_tpu.models import compat

    state = strip_model_prefix(torch_state)
    p = {"fs2": _fs2_acoustic(state, hp)}
    backbone_type = compat.get_backbone_type(hp)
    backbone_args = compat.get_backbone_args(hp, backbone_type) or {}
    p["denoiser"] = _backbone(state, _core_fn_prefix(state, "diffusion"),
                              backbone_type, backbone_args)
    if hp.get("use_shallow_diffusion", False):
        aux_args = hp["shallow_diffusion_args"]["aux_decoder_args"]
        p["aux_decoder"] = {
            "decoder": _convnext_decoder(
                state, "aux_decoder.decoder", aux_args.get("num_layers", 6)
            )
        }
    return {"params": p}


def convert_variance(torch_state: Dict, hp: dict) -> Dict:
    """Torch DiffSingerVariance state dict -> flax params for VarianceModule."""
    from diffsinger_tpu.models import compat
    from diffsinger_tpu.models.toplevel import variance_prediction_list

    state = strip_model_prefix(torch_state)
    use_rope = hp.get("use_rope", False)
    fs2 = {
        "txt_embed": _embedding(state, "fs2.txt_embed"),
        "encoder": _fs2_encoder(state, "fs2.encoder", hp["enc_layers"], use_rope),
    }
    if hp.get("use_lang_id", False):
        fs2["lang_embed"] = _embedding(state, "fs2.lang_embed")
    if hp["predict_dur"]:
        fs2["onset_embed"] = _embedding(state, "fs2.onset_embed")
        fs2["word_dur_embed"] = _linear(state, "fs2.word_dur_embed")
        fs2["midi_embed"] = _embedding(state, "fs2.midi_embed")
        dp = {"linear": _linear(state, "fs2.dur_predictor.linear")}
        n_layers = hp["dur_prediction_args"]["num_layers"]
        for i in range(n_layers):
            dp[f"conv_{i}"] = _conv1d(state, f"fs2.dur_predictor.conv.{i}.1")
            dp[f"norm_{i}"] = _layernorm(state, f"fs2.dur_predictor.conv.{i}.3")
        fs2["dur_predictor"] = dp
    else:
        fs2["ph_dur_embed"] = _linear(state, "fs2.ph_dur_embed")
    p = {"fs2": fs2}
    if hp.get("use_spk_id", False):
        p["spk_embed"] = _embedding(state, "spk_embed")

    if hp["predict_pitch"]:
        pitch_hp = hp["pitch_prediction_args"]
        if hp.get("use_melody_encoder", False):
            me_hp = hp.get("melody_encoder_args", {})
            me = {
                "note_midi_embed": _linear(state, "melody_encoder.note_midi_embed"),
                "note_dur_embed": _linear(state, "melody_encoder.note_dur_embed"),
                "encoder": _fs2_encoder(
                    state, "melody_encoder.encoder",
                    me_hp.get("enc_layers", hp["enc_layers"]),
                    me_hp.get("use_rope", hp.get("use_rope", False)),
                ),
                "out_proj": _linear(state, "melody_encoder.out_proj"),
            }
            if hp.get("use_glide_embed", False):
                me["note_glide_embed"] = _embedding(state, "melody_encoder.note_glide_embed")
            p["melody_encoder"] = me
            p["delta_pitch_embed"] = _linear(state, "delta_pitch_embed")
        else:
            p["base_pitch_embed"] = _linear(state, "base_pitch_embed")
        p["pitch_retake_embed"] = _embedding(state, "pitch_retake_embed")
        bt = compat.get_backbone_type(hp, nested_config=pitch_hp)
        ba = compat.get_backbone_args(pitch_hp, bt) or {}
        p["pitch_denoiser"] = _backbone(state, _core_fn_prefix(state, "pitch_predictor"), bt, ba)

    var_list = variance_prediction_list(hp)
    if var_list:
        p["pitch_embed"] = _linear(state, "pitch_embed")
        for v in var_list:
            p[f"variance_embeds_{v}"] = _linear(state, f"variance_embeds.{v}")
        var_hp = hp["variances_prediction_args"]
        bt = compat.get_backbone_type(hp, nested_config=var_hp)
        ba = compat.get_backbone_args(var_hp, bt) or {}
        p["variance_denoiser"] = _backbone(state, _core_fn_prefix(state, "variance_predictor"), bt, ba)
    return {"params": p}


def convert_checkpoint_file(path, hp: dict, category: str):
    """Load a reference Lightning .ckpt and convert to our params pytree."""
    from diffsinger_tpu.utils.torch_convert import load_torch_file

    ckpt = load_torch_file(path)
    state = ckpt.get("state_dict", ckpt)
    if category == "acoustic":
        return convert_acoustic(state, hp)
    if category == "variance":
        return convert_variance(state, hp)
    raise ValueError(category)
