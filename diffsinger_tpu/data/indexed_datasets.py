"""HDF5-backed random-access item store (reference utils/indexed_datasets.py).

Format-compatible with the reference: ``{prefix}.data`` HDF5 with one group per
item keyed by the stringified index; a pickled ``{prefix}.meta`` (written by
the binarizer) carries per-attribute lengths and names. Items come back as
numpy arrays (host side; upload happens after collation).
"""

from __future__ import annotations

import pathlib
from collections import deque
from typing import Dict, Optional, Sequence

import h5py
import numpy as np


class IndexedDataset:
    def __init__(self, path, prefix: str, num_cache: int = 0):
        self.path = pathlib.Path(path) / f"{prefix}.data"
        if not self.path.exists():
            raise FileNotFoundError(f"IndexedDataset not found: {self.path}")
        self.dset: Optional[h5py.File] = None
        self.cache: deque = deque(maxlen=max(1, num_cache))
        self.num_cache = num_cache

    def _ensure_open(self):
        if self.dset is None:
            self.dset = h5py.File(self.path, "r")

    def __getitem__(self, i: int) -> Dict:
        self._ensure_open()
        if i < 0 or i >= len(self.dset):
            raise IndexError("index out of range")
        if self.num_cache > 0:
            for c in self.cache:
                if c[0] == i:
                    return c[1]
        group = self.dset[str(i)]
        item = {
            k: (v[()].item() if v.shape == () else np.asarray(v[()]))
            for k, v in group.items()
        }
        if self.num_cache > 0:
            self.cache.appendleft((i, item))
        return item

    def __len__(self) -> int:
        self._ensure_open()
        return len(self.dset)

    def close(self):
        if self.dset is not None:
            self.dset.close()
            self.dset = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class IndexedDatasetBuilder:
    def __init__(self, path, prefix: str, allowed_attr: Optional[Sequence[str]] = None,
                 auto_increment: bool = True):
        self.path = pathlib.Path(path) / f"{prefix}.data"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.dset = h5py.File(self.path, "w")
        self.counter = 0
        self.auto_increment = auto_increment
        self.allowed_attr = set(allowed_attr) if allowed_attr is not None else None

    def add_item(self, item: Dict, item_no: Optional[int] = None) -> int:
        if (self.auto_increment and item_no is not None) or (
            not self.auto_increment and item_no is None
        ):
            raise ValueError("auto_increment and provided item_no are mutually exclusive")
        if self.allowed_attr is not None:
            item = {k: item[k] for k in self.allowed_attr if k in item}
        if self.auto_increment:
            item_no = self.counter
            self.counter += 1
        for k, v in item.items():
            if v is None:
                continue
            self.dset.create_dataset(f"{item_no}/{k}", data=v)
        return item_no

    def finalize(self):
        self.dset.close()
