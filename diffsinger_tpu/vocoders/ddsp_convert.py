"""pc-ddsp TorchScript -> native CombSub parameter conversion.

The reference ships DDSP vocoders as TorchScript ``.jit`` bundles with a
``config.yaml`` sidecar (reference modules/vocoders/ddsp.py:23-34). TorchScript
cannot execute on TPU, so conversion extracts the weights once on the host
(torch CPU is fine at *convert* time) into the native
:class:`~diffsinger_tpu.vocoders.ddsp_combsub.CombSub` pytree, cached as
``<bundle>.dsckpt``. Runtime synthesis is then pure JAX/XLA.

The converter is strict: it maps known pc-ddsp parameter names and raises with
the bundle's full parameter inventory when it meets an unknown layout, rather
than silently mis-converting.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Tuple

import numpy as np


def _fold_weight_norm(state: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """Fold weight-norm (old hook style or new parametrizations) to a plain
    weight matrix for ``base`` (e.g. 'mel2ctrl.dense_out')."""
    if f"{base}.weight_g" in state:
        g, v = state[f"{base}.weight_g"], state[f"{base}.weight_v"]
    elif f"{base}.parametrizations.weight.original0" in state:
        g = state[f"{base}.parametrizations.weight.original0"]
        v = state[f"{base}.parametrizations.weight.original1"]
    elif f"{base}.weight" in state:
        return state[f"{base}.weight"]
    else:
        raise KeyError(f"no weight(-norm) params found for '{base}'")
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(
        (-1,) + (1,) * (v.ndim - 1)
    )
    return g * v / np.maximum(norm, 1e-12)


def torchscript_state(jit_path) -> Tuple[Dict[str, np.ndarray], dict]:
    """Load a TorchScript bundle (host CPU) and return (state_dict as numpy,
    config.yaml args)."""
    import torch
    import yaml

    jit_path = pathlib.Path(jit_path)
    model = torch.jit.load(str(jit_path), map_location="cpu")
    model.eval()
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    config_path = jit_path.with_name("config.yaml")
    args = {}
    if config_path.exists():
        with open(config_path) as f:
            args = yaml.safe_load(f)
    return state, args


def convert_combsub_state(state: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Map a pc-ddsp CombSub state_dict onto the native CombSub params pytree.

    Returns (flax params, inferred dims {n_mels, n_mag_harmonic, n_mag_noise,
    lstm_hidden}). Raises KeyError listing the inventory on unknown layouts.
    """
    try:
        conv0_w = state["mel2ctrl.stack.0.weight"]       # [64, n_mels, 3]
        conv0_b = state["mel2ctrl.stack.0.bias"]
        gn_w = state["mel2ctrl.stack.1.weight"]
        gn_b = state["mel2ctrl.stack.1.bias"]
        conv1_w = state["mel2ctrl.stack.3.weight"]       # [64, 64, 3]
        conv1_b = state["mel2ctrl.stack.3.bias"]
        lstm = {
            k.split("mel2ctrl.decoder.")[-1]: v
            for k, v in state.items() if k.startswith("mel2ctrl.decoder.")
        }
        norm_w = state["mel2ctrl.norm.weight"]
        norm_b = state["mel2ctrl.norm.bias"]
        dense_w = _fold_weight_norm(state, "mel2ctrl.dense_out")  # [n_out, 256]
        dense_b = state["mel2ctrl.dense_out.bias"]
    except KeyError as e:
        inventory = "\n".join(f"  {k}: {tuple(v.shape)}" for k, v in state.items())
        raise KeyError(
            f"Unrecognized DDSP bundle layout (missing {e}). Expected the "
            f"pc-ddsp CombSub Mel2Control parameter names. Bundle inventory:\n"
            f"{inventory}"
        ) from e

    n_mels = conv0_w.shape[1]
    lstm_hidden = lstm["weight_hh_l0"].shape[1]
    n_out = dense_w.shape[0]

    params = {
        "params": {
            "mel2ctrl": {
                # torch Conv1d [out, in, k] -> flax Conv kernel [k, in, out]
                "stack_conv0": {"kernel": conv0_w.transpose(2, 1, 0), "bias": conv0_b},
                "stack_gn": {"scale": gn_w, "bias": gn_b},
                "stack_conv1": {"kernel": conv1_w.transpose(2, 1, 0), "bias": conv1_b},
                "decoder": {
                    "fw_w_ih": lstm["weight_ih_l0"],
                    "fw_w_hh": lstm["weight_hh_l0"],
                    "fw_b_ih": lstm["bias_ih_l0"],
                    "fw_b_hh": lstm["bias_hh_l0"],
                    "bw_w_ih": lstm["weight_ih_l0_reverse"],
                    "bw_w_hh": lstm["weight_hh_l0_reverse"],
                    "bw_b_ih": lstm["bias_ih_l0_reverse"],
                    "bw_b_hh": lstm["bias_hh_l0_reverse"],
                },
                "norm": {"scale": norm_w, "bias": norm_b},
                # torch Linear [out, in] -> flax Dense kernel [in, out]
                "dense_out": {"kernel": dense_w.T, "bias": dense_b},
            }
        }
    }
    dims = {"n_mels": int(n_mels), "lstm_hidden": int(lstm_hidden), "n_out": int(n_out)}
    return params, dims


def convert_torchscript_ddsp(jit_path, out_path=None) -> pathlib.Path:
    """Convert ``<bundle>.jit`` (+config.yaml) into ``<bundle>.jit.dsckpt``
    holding the native CombSub params and synthesis dims."""
    from flax import serialization

    jit_path = pathlib.Path(jit_path)
    state, args = torchscript_state(jit_path)
    model_type = ((args.get("model") or {}).get("type")) if args else None
    if model_type not in (None, "CombSub", "CombSubFast"):
        raise NotImplementedError(
            f"DDSP bundle model type '{model_type}' is not supported; only the "
            f"CombSub family converts natively."
        )
    params, dims = convert_combsub_state(state)
    data = (args.get("data") or {}) if args else {}
    model_args = (args.get("model") or {}) if args else {}
    n_mag_noise = int(model_args.get("n_mag_noise", 0) or 0)
    n_mag_harmonic = int(model_args.get("n_mag_harmonic", 0) or 0)
    if not n_mag_harmonic:
        # infer: n_out = 2*n_mag_harmonic + n_mag_noise and the two filter
        # banks share the window bin count in stock configs
        win = int(data.get("win_length", 0) or 0)
        bins = win // 2 + 1 if win else dims["n_out"] // 3
        n_mag_harmonic = bins
        n_mag_noise = dims["n_out"] - 2 * bins
    blob = {
        "category": "ddsp_combsub",
        "params": params["params"],
        "meta": {
            "sampling_rate": int(data.get("sampling_rate", 44100)),
            "block_size": int(data.get("block_size", 512)),
            "win_length": int(data.get("win_length", 2048)),
            "n_mag_harmonic": n_mag_harmonic,
            "n_mag_noise": n_mag_noise,
            "n_mels": dims["n_mels"],
        },
    }
    out_path = pathlib.Path(out_path) if out_path else jit_path.with_suffix(
        jit_path.suffix + ".dsckpt"
    )
    out_path.write_bytes(serialization.msgpack_serialize(blob))
    print(f"| converted DDSP bundle -> {out_path} "
          f"({blob['meta']})")
    return out_path
