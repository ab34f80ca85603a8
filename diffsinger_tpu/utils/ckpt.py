"""Checkpoint save/load (reference semantics: utils/training_utils.py:286-303,
utils/__init__.py:166-222, basics/base_module.py:4-18).

Format: orbax-style directories named ``model_ckpt_steps_<N>`` under the work
dir, holding the params pytree, optimizer state, and metadata (including the
``category`` tag that prevents loading an acoustic ckpt into a variance model).
A msgpack fallback (flax.serialization) keeps checkpoints dependency-light.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any, Dict, Optional

from flax import serialization

CKPT_PREFIX = "model_ckpt_steps_"
_STEP_RE = re.compile(rf"{CKPT_PREFIX}(\d+)\.dsckpt")


def checkpoint_path(work_dir, steps: int) -> pathlib.Path:
    return pathlib.Path(work_dir) / f"{CKPT_PREFIX}{steps}.dsckpt"


def list_checkpoints(work_dir) -> list:
    """All (steps, path) under work_dir, sorted ascending by step."""
    work_dir = pathlib.Path(work_dir)
    if not work_dir.exists():
        return []
    found = []
    for p in work_dir.iterdir():
        m = _STEP_RE.fullmatch(p.name)
        if m:
            found.append((int(m.group(1)), p))
    return sorted(found)


def get_latest_checkpoint_path(work_dir) -> Optional[pathlib.Path]:
    """Latest step-named checkpoint (training_utils.py:286-303)."""
    ckpts = list_checkpoints(work_dir)
    return ckpts[-1][1] if ckpts else None


def save_checkpoint(path, params, *, category: str, global_step: int,
                    opt_state=None, extra: Dict[str, Any] | None = None) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {"category": category, "global_step": int(global_step), **(extra or {})}
    record = {"meta": meta, "params": serialization.to_state_dict(params)}
    if opt_state is not None:
        record["opt_state"] = serialization.to_state_dict(opt_state)
    blob = serialization.msgpack_serialize(record)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(blob)
    tmp.replace(path)


def load_checkpoint(path, *, expected_category: str | None = None) -> Dict[str, Any]:
    path = pathlib.Path(path)
    blob = serialization.msgpack_restore(path.read_bytes())
    meta = blob.get("meta", {})
    if expected_category is not None:
        category = meta.get("category")
        if category is not None and category != expected_category:
            raise RuntimeError(
                f"Category mismatches: checkpoint is '{category}' but a "
                f"'{expected_category}' checkpoint is required."
            )
    return blob


def restore_params(template, state_dict) -> Any:
    """Rebuild a typed pytree from a saved state dict using a template."""
    return serialization.from_state_dict(template, state_dict)


def _torch_checkpoints(work_dir) -> list:
    """Reference Lightning checkpoints (``model_ckpt_steps_<N>.ckpt``)."""
    work_dir = pathlib.Path(work_dir)
    if not work_dir.exists():
        return []
    found = []
    for p in work_dir.glob(f"{CKPT_PREFIX}*.ckpt"):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)\.ckpt", p.name)
        if m:
            found.append((int(m.group(1)), p))
    return sorted(found)


def load_params_for_inference(work_dir, template, *, category: str,
                              ckpt_steps: Optional[int] = None,
                              hparams: Optional[dict] = None):
    """Find + load the latest (or step-specific) checkpoint's params.

    Mirrors scripts/infer.py's ckpt discovery by step prefix (scripts/infer.py:16-32)
    plus load_ckpt's strictness (utils/__init__.py:166-222). Native ``.dsckpt``
    files take priority; reference torch ``.ckpt`` files are auto-converted
    (requires ``hparams``).
    """
    work_dir = pathlib.Path(work_dir)
    native = list_checkpoints(work_dir)
    if native:
        if ckpt_steps is not None:
            candidates = [p for s, p in native if s <= ckpt_steps]
            if not candidates:
                raise FileNotFoundError(f"No checkpoint at or before step {ckpt_steps} in {work_dir}")
            path = candidates[-1]
        else:
            path = native[-1][1]
        blob = load_checkpoint(path, expected_category=category)
        print(f"| load '{path}' (step {blob['meta'].get('global_step')})")
        return restore_params(template, blob["params"]), blob["meta"]

    torch_ckpts = _torch_checkpoints(work_dir) if hparams is not None else []
    if torch_ckpts:
        if ckpt_steps is not None:
            candidates = [(s, p) for s, p in torch_ckpts if s <= ckpt_steps]
            if not candidates:
                raise FileNotFoundError(f"No checkpoint at or before step {ckpt_steps} in {work_dir}")
            step, path = candidates[-1]
        else:
            step, path = torch_ckpts[-1]
        from diffsinger_tpu.utils.torch_model_convert import convert_checkpoint_file

        print(f"| converting torch checkpoint '{path}' (step {step})")
        params = convert_checkpoint_file(path, hparams, category)
        return restore_params(template, params), {"category": category, "global_step": step}

    raise FileNotFoundError(f"No checkpoints found in {work_dir}")


def keep_checkpoints(work_dir, *, num_ckpt_keep: int,
                     permanent_ckpt_start: int = 0,
                     permanent_ckpt_interval: int = -1) -> list:
    """Apply the retention policy (DsModelCheckpoint, training_utils.py:203-283):
    keep the newest ``num_ckpt_keep`` plus permanent checkpoints. Returns the
    paths that were deleted."""
    ckpts = list_checkpoints(work_dir)
    deletable = []
    for steps, p in ckpts[:-num_ckpt_keep] if num_ckpt_keep > 0 else []:
        permanent = (
            permanent_ckpt_interval > 0
            and steps >= permanent_ckpt_start
            and steps % permanent_ckpt_interval == 0
        )
        if not permanent:
            deletable.append(p)
    for p in deletable:
        p.unlink()
    return deletable
