"""Cascading YAML configuration.

Preserves the reference's config semantics and key names so existing configs and
dictionaries keep working (reference: utils/hparams.py:30-146):

* each YAML may declare ``base_config`` (str or list); bases are loaded
  depth-first and overridden by the child with a recursive dict-merge;
* when an experiment work dir (``checkpoints/<exp_name>``) holds a saved
  ``config.yaml`` snapshot, it takes precedence over the config chain unless
  ``reset=True``;
* ``hparams_str`` (``"k=v,k2=v2"``) applies typed overrides on top.

Unlike the reference there is **no process-global mutable dict**: callers get an
explicit :class:`HParams` object and pass it down. This keeps model construction
functional (important for jit/pjit closure hygiene) while staying schema-compatible.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import yaml


class HParams(dict):
    """A plain dict with attribute access. Keys match docs/ConfigurationSchemas.md."""

    def __getattr__(self, item: str) -> Any:
        try:
            return self[item]
        except KeyError as e:
            raise AttributeError(item) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def copy(self) -> "HParams":
        return HParams(dict.copy(self))


def override_config(old_config: dict, new_config: dict) -> None:
    """Recursive dict-merge: nested dicts merge, everything else replaces."""
    for k, v in new_config.items():
        if isinstance(v, dict) and k in old_config and isinstance(old_config[k], dict):
            override_config(old_config[k], v)
        else:
            old_config[k] = v


def _load_chain(config_fn: str | Path, loaded: set) -> dict:
    config_fn = str(config_fn)
    with open(config_fn, encoding="utf-8") as f:
        cfg = yaml.safe_load(f) or {}
    loaded.add(config_fn)
    if "base_config" in cfg:
        bases = cfg["base_config"]
        if not isinstance(bases, list):
            bases = [bases]
        merged: dict = {}
        here = os.path.dirname(os.path.abspath(config_fn))
        for base in bases:
            if base.startswith("."):
                base = os.path.normpath(os.path.join(here, base))
            elif not os.path.exists(base):
                # Reference configs address bases relative to their repo root
                # (CWD there); also search near the including file and our root.
                for root in (here, os.path.dirname(here), Path(__file__).resolve().parents[2]):
                    candidate = os.path.join(str(root), base)
                    if os.path.exists(candidate):
                        base = candidate
                        break
            if base not in loaded:
                override_config(merged, _load_chain(base, loaded))
        override_config(merged, cfg)
        return merged
    return cfg


def _apply_hparams_str(cfg: dict, hparams_str: str) -> None:
    for item in hparams_str.split(","):
        item = item.strip()
        if not item:
            continue
        k, v = item.split("=", 1)
        if k not in cfg:
            cfg[k] = yaml.safe_load(v)
        elif v in ("True", "False"):
            cfg[k] = v == "True"
        elif isinstance(cfg[k], bool):
            # yaml parse instead of (v == "True"): bool-defaulted keys accept
            # non-bool overrides too (e.g. recompute_grads=dots), and
            # true/yes/false still land as bools — the old coercion silently
            # turned any unrecognized string into False
            cfg[k] = yaml.safe_load(v)
        elif cfg[k] is None:
            cfg[k] = yaml.safe_load(v)
        else:
            cfg[k] = type(cfg[k])(v)


def load_config(
    config: str | Path = "",
    exp_name: str = "",
    hparams_str: str = "",
    *,
    infer: bool = False,
    reset: bool = False,
    ckpt_root: str | Path = "checkpoints",
    save_snapshot: bool = True,
) -> HParams:
    """Resolve the full configuration for an experiment.

    Mirrors the reference ``set_hparams`` contract (utils/hparams.py:30-146)
    minus the global side effects.
    """
    assert config or exp_name, "Either config or exp_name must be specified."
    work_dir = ""
    if exp_name:
        work_dir = os.path.join(str(ckpt_root), exp_name)

    cfg: dict = {}
    if config:
        cfg.update(_load_chain(config, set()))

    snapshot_path = os.path.join(work_dir, "config.yaml") if work_dir else ""
    if snapshot_path and os.path.exists(snapshot_path) and not reset:
        with open(snapshot_path, encoding="utf-8") as f:
            cfg.update(yaml.safe_load(f) or {})

    cfg["work_dir"] = work_dir
    if hparams_str:
        _apply_hparams_str(cfg, hparams_str)

    if (
        save_snapshot
        and work_dir
        and not infer
        and (not os.path.exists(snapshot_path) or reset)
    ):
        os.makedirs(work_dir, exist_ok=True)
        snap = dict(cfg)
        snap["base_config"] = []
        with open(snapshot_path, "w", encoding="utf-8") as f:
            yaml.safe_dump(snap, f, allow_unicode=True)

    cfg["infer"] = infer
    if not cfg.get("exp_name"):
        cfg["exp_name"] = exp_name
    return HParams(cfg)
