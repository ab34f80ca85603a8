"""Foundation utilities (host-side, numpy): collation, batching, class factories.

Re-expressions of reference utils/__init__.py for a JAX data pipeline; collation
produces fixed-shape numpy arrays ready for device upload.
"""

from __future__ import annotations

import importlib
import inspect
import re
from typing import Any, List, Sequence

import numpy as np


def collate_nd(items: Sequence[np.ndarray], pad_value=0, max_len: int | None = None) -> np.ndarray:
    """Pad a list of arrays (equal ranks, varying leading dim) into one batch.

    Behavior of reference utils/__init__.py:29-38, generalized with an optional
    ``max_len`` so batches can be padded to a static bucket length for XLA.
    """
    items = [np.asarray(x) for x in items]
    target_len = max(x.shape[0] for x in items)
    if max_len is not None:
        assert max_len >= target_len, f"max_len {max_len} < longest item {target_len}"
        target_len = max_len
    tail_shape = items[0].shape[1:]
    out = np.full((len(items), target_len, *tail_shape), pad_value, dtype=items[0].dtype)
    for i, x in enumerate(items):
        out[i, : x.shape[0]] = x
    return out


def pad_to(x: np.ndarray, length: int, pad_value=0, axis: int = 0) -> np.ndarray:
    """Pad one array along ``axis`` to a static length."""
    if x.shape[axis] == length:
        return x
    assert x.shape[axis] < length, f"array dim {x.shape[axis]} exceeds target {length}"
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - x.shape[axis])
    return np.pad(x, widths, constant_values=pad_value)


def batch_by_size(
    indices: np.ndarray,
    num_frames_fn,
    max_batch_frames: int = 80000,
    max_batch_size: int = 48,
    required_batch_count_multiple: int = 1,
) -> List[List[int]]:
    """Group indices into batches under frame- and item-count budgets.

    Same contract as reference utils/__init__.py:64-115: indices are assumed
    roughly sorted by length; batch boundaries respect both budgets, and the
    final batch list length is a multiple of ``required_batch_count_multiple``
    (smaller leftover batches are redistributed by splitting).
    """
    sizes = [num_frames_fn(i) for i in indices]
    batches: List[List[int]] = []
    batch: List[int] = []
    batch_frames = 0
    for idx, size in zip(indices, sizes):
        assert size <= max_batch_frames, (
            f"sentence at index {idx} exceeds max_batch_frames ({size} > {max_batch_frames})"
        )
        if batch and (
            batch_frames + size > max_batch_frames or len(batch) + 1 > max_batch_size
        ):
            batches.append(batch)
            batch = []
            batch_frames = 0
        batch.append(int(idx))
        batch_frames += size
    if batch:
        batches.append(batch)

    r = len(batches) % required_batch_count_multiple
    if r != 0:
        # split the largest batches to reach the next multiple
        need = required_batch_count_multiple - r
        splittable = sorted(range(len(batches)), key=lambda i: -len(batches[i]))
        for i in splittable[:need]:
            b = batches[i]
            if len(b) < 2:
                continue
            mid = len(b) // 2
            batches[i] = b[:mid]
            batches.append(b[mid:])
    return batches


def filter_kwargs(dict_to_filter: dict, kwarg_obj) -> dict:
    """Keep only kwargs accepted by ``kwarg_obj``'s signature
    (reference utils/__init__.py:149-163)."""
    sig = inspect.signature(kwarg_obj)
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()):
        return dict(dict_to_filter)
    keys = [
        name
        for name, p in sig.parameters.items()
        if p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD, inspect.Parameter.KEYWORD_ONLY)
    ]
    return {k: v for k, v in dict_to_filter.items() if k in keys}


def build_object_from_class_name(cls_str: str, parent_cls=None, *args, **kwargs):
    """Instantiate ``pkg.module.Class`` with signature-filtered kwargs
    (reference utils/__init__.py:266-275)."""
    pkg, cls_name = cls_str.rsplit(".", 1)
    cls = getattr(importlib.import_module(pkg), cls_name)
    if parent_cls is not None:
        assert issubclass(cls, parent_cls), f"| {cls} is not subclass of {parent_cls}."
    return cls(*args, **filter_kwargs(kwargs, cls))


def load_class_from_name(cls_str: str):
    pkg, cls_name = cls_str.rsplit(".", 1)
    return getattr(importlib.import_module(pkg), cls_name)


_REF_CLASS_REMAP = {
    # Map reference torch class paths that may appear in user YAMLs onto our
    # equivalents, so unmodified configs keep working.
    "torch.optim.AdamW": "optax:adamw",
    "torch.optim.Adam": "optax:adam",
    "torch.optim.lr_scheduler.StepLR": "diffsinger_tpu.training.schedules.StepLR",
    "torch.optim.lr_scheduler.ExponentialLR": "diffsinger_tpu.training.schedules.ExponentialLR",
    "utils.training_utils.RSQRTSchedule": "diffsinger_tpu.training.schedules.RSQRTSchedule",
    "utils.training_utils.WarmupCosineSchedule": "diffsinger_tpu.training.schedules.WarmupCosineSchedule",
    "training.acoustic_task.AcousticTask": "diffsinger_tpu.training.acoustic_task.AcousticTask",
    "training.variance_task.VarianceTask": "diffsinger_tpu.training.variance_task.VarianceTask",
    "preprocessing.acoustic_binarizer.AcousticBinarizer":
        "diffsinger_tpu.data.acoustic_binarizer.AcousticBinarizer",
    "preprocessing.variance_binarizer.VarianceBinarizer":
        "diffsinger_tpu.data.variance_binarizer.VarianceBinarizer",
}


def remap_reference_class_name(cls_str: str) -> str:
    return _REF_CLASS_REMAP.get(cls_str, cls_str)


def random_continuous_masks(batch: int, length: int, rng: np.random.Generator) -> np.ndarray:
    """Boolean [B, T] masks, each a random contiguous span (possibly empty),
    matching reference utils/__init__.py:41-51 semantics."""
    out = np.zeros((batch, length), dtype=bool)
    for b in range(batch):
        lo, hi = sorted(rng.integers(0, length + 1, size=2))
        out[b, lo:hi] = True
    return out


def make_positions(tokens: np.ndarray, padding_idx: int = 0) -> np.ndarray:
    """Position numbering that ignores padding (fairseq convention)."""
    mask = tokens != padding_idx
    return np.cumsum(mask, axis=1) * mask + padding_idx


def simple_repr(obj: Any) -> str:
    name = type(obj).__name__
    fields = ", ".join(f"{k}={v!r}" for k, v in vars(obj).items() if not k.startswith("_"))
    return f"{name}({fields})"


_CAMEL_RE = re.compile(r"(?<!^)(?=[A-Z])")


def camel_to_snake(name: str) -> str:
    return _CAMEL_RE.sub("_", name).lower()
