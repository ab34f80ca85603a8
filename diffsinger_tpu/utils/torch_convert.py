"""Torch checkpoint -> JAX params conversion (host-side; torch CPU only).

Covers the reference's persisted formats (SURVEY.md §5.4):
* NSF-HiFiGAN vocoder ckpts: ``{'generator': state_dict}`` with weight-norm
  (g/v) tensors that must be fused (modules/nsf_hifigan/models.py:18-33 removes
  weight norm at load);
* layout changes: torch Conv1d [out, in, k] -> flax [k, in, out];
  ConvTranspose1d [in, out, k] -> [k, in, out]; Linear [out, in] -> [in, out].
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def fuse_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace {name}.weight_g/{name}.weight_v pairs with the fused weight
    (torch weight_norm, dim=0): W = g * v / ||v||_{dims>0}."""
    out = {}
    done = set()
    for k in state:
        if k.endswith(".weight_g"):
            base = k[: -len(".weight_g")]
            g = _to_numpy(state[k]).astype(np.float64)
            v = _to_numpy(state[base + ".weight_v"]).astype(np.float64)
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base + ".weight"] = (g * v / norm).astype(np.float32)
            done.add(k)
            done.add(base + ".weight_v")
    for k, v in state.items():
        if k not in done and not k.endswith(".weight_v"):
            out[k] = _to_numpy(v)
    return out


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax nn.Conv [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def conv_transpose1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> ConvTranspose1dTorch [k, in, out]."""
    return np.transpose(w, (2, 0, 1))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense [in, out]."""
    return np.transpose(w)


def convert_nsf_hifigan(generator_state: Dict, config) -> Dict:
    """Torch NSF-HiFiGAN generator state dict -> flax params for
    :class:`diffsinger_tpu.vocoders.nsf_hifigan_model.Generator`."""
    state = fuse_weight_norm(generator_state)
    num_kernels = len(config.resblock_kernel_sizes)
    num_ups = len(config.upsample_rates)
    p: Dict = {}

    def put(path: str, value):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value, dtype=np.float32)

    put("conv_pre/kernel", conv1d_kernel(state["conv_pre.weight"]))
    put("conv_pre/bias", state["conv_pre.bias"])
    put("conv_post/kernel", conv1d_kernel(state["conv_post.weight"]))
    put("conv_post/bias", state["conv_post.bias"])

    for i in range(num_ups):
        put(f"ups_{i}/kernel", conv_transpose1d_kernel(state[f"ups.{i}.weight"]))
        put(f"ups_{i}/bias", state[f"ups.{i}.bias"])
        if config.mini_nsf:
            if i == 1:
                put("source_conv/kernel", conv1d_kernel(state["source_conv.weight"]))
                put("source_conv/bias", state["source_conv.bias"])
        else:
            put(f"noise_convs_{i}/kernel", conv1d_kernel(state[f"noise_convs.{i}.weight"]))
            put(f"noise_convs_{i}/bias", state[f"noise_convs.{i}.bias"])

    if not config.mini_nsf:
        put("m_source_linear/kernel", linear_kernel(state["m_source.l_linear.weight"]))
        put("m_source_linear/bias", state["m_source.l_linear.bias"])

    n_res = 3 if config.resblock == "1" else 2
    for idx in range(num_ups * num_kernels):
        if config.resblock == "1":
            for m in range(n_res):
                put(f"resblocks_{idx}/convs1_{m}/kernel",
                    conv1d_kernel(state[f"resblocks.{idx}.convs1.{m}.weight"]))
                put(f"resblocks_{idx}/convs1_{m}/bias", state[f"resblocks.{idx}.convs1.{m}.bias"])
                put(f"resblocks_{idx}/convs2_{m}/kernel",
                    conv1d_kernel(state[f"resblocks.{idx}.convs2.{m}.weight"]))
                put(f"resblocks_{idx}/convs2_{m}/bias", state[f"resblocks.{idx}.convs2.{m}.bias"])
        else:
            for m in range(n_res):
                put(f"resblocks_{idx}/convs_{m}/kernel",
                    conv1d_kernel(state[f"resblocks.{idx}.convs.{m}.weight"]))
                put(f"resblocks_{idx}/convs_{m}/bias", state[f"resblocks.{idx}.convs.{m}.bias"])
    return {"params": p}


def load_torch_file(path):
    """Load a torch checkpoint on host (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
