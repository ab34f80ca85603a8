"""Datasets + collaters over the binarized store
(reference basics/base_dataset.py, training/{acoustic,variance}_task.py collaters).

Collaters produce numpy batches padded to *bucket* lengths (multiples of
``frame_bucket``/``token_bucket``) so the jitted train step compiles once per
bucket pair instead of once per batch shape — the TPU-side answer to the
reference's dynamic [B, T] batches.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np

from diffsinger_tpu.data.indexed_datasets import IndexedDataset
from diffsinger_tpu.utils import collate_nd


def _bucket(n: int, step: int) -> int:
    return max(step, ((n + step - 1) // step) * step)


class BaseDataset:
    def __init__(self, data_dir, prefix: str, size_key: str = "lengths", preload: bool = False):
        self.prefix = prefix
        self.data_dir = Path(data_dir)
        with open(self.data_dir / f"{prefix}.meta", "rb") as f:
            self.metadata = pickle.load(f)
        self.sizes = self.metadata[size_key]
        self._ds = IndexedDataset(self.data_dir, prefix)
        if preload:
            self.items = [self._ds[i] for i in range(len(self._ds))]
        else:
            self.items = self._ds

    def __getitem__(self, index: int) -> Dict:
        return {"_idx": index, **self.items[index]}

    def __len__(self) -> int:
        return len(self.sizes)

    def num_frames(self, index: int) -> int:
        return int(self.sizes[index])

    def collate_base(self, samples: List[Dict]) -> Dict:
        return {
            "size": len(samples),
            "indices": np.asarray([s["_idx"] for s in samples], np.int64),
        }

    def pad_targets(self, indices, axes: Dict[str, str], bucket_steps: Dict[str, int]) -> Dict[str, int]:
        """Bucketized max lengths over ``indices`` for each logical axis.

        ``axes`` maps logical axis name -> metadata attribute (e.g.
        ``{"t_mel": "mel2ph"}``). Used in multi-host training so every host
        can compute the *global* pad targets for a step from metadata alone
        (the per-attribute lengths recorded at binarization), without
        communicating shapes.
        """
        out = {}
        for axis, attr in axes.items():
            if attr not in self.metadata:
                continue
            lengths = self.metadata[attr]
            out[axis] = _bucket(max(int(lengths[i]) for i in indices), bucket_steps[axis])
        return out


class AcousticDataset(BaseDataset):
    """Acoustic batches (AcousticDataset.collater, acoustic_task.py:40-67)."""

    def __init__(self, data_dir, hp: dict, prefix: str, preload: bool = False,
                 frame_bucket: int = 128, token_bucket: int = 16):
        super().__init__(data_dir, prefix, hp.get("dataset_size_key", "lengths"), preload)
        self.hp = hp
        self.frame_bucket = frame_bucket
        self.token_bucket = token_bucket
        self.required_variances = [
            v for v in ("energy", "breathiness", "voicing", "tension")
            if hp.get(f"use_{v}_embed", False)
        ]

    PAD_AXES = {"t_mel": "mel2ph", "t_txt": "tokens"}

    def collater(self, samples: List[Dict], pad_to: Dict[str, int] = None) -> Dict:
        batch = self.collate_base(samples)
        if batch["size"] == 0:
            return batch
        hp = self.hp
        pad_to = pad_to or {}
        t_mel = max(_bucket(max(len(s["mel2ph"]) for s in samples), self.frame_bucket),
                    pad_to.get("t_mel", 0))
        t_txt = max(_bucket(max(len(s["tokens"]) for s in samples), self.token_bucket),
                    pad_to.get("t_txt", 0))
        batch.update(
            tokens=collate_nd([s["tokens"] for s in samples], 0, t_txt).astype(np.int32),
            mel2ph=collate_nd([s["mel2ph"] for s in samples], 0, t_mel).astype(np.int32),
            mel=collate_nd([s["mel"] for s in samples], 0.0, t_mel).astype(np.float32),
            f0=collate_nd([s["f0"] for s in samples], 0.0, t_mel).astype(np.float32),
        )
        for v in self.required_variances:
            batch[v] = collate_nd([s[v] for s in samples], 0.0, t_mel).astype(np.float32)
        if hp.get("use_key_shift_embed", False):
            batch["key_shift"] = np.asarray(
                [[s["key_shift"]] for s in samples], np.float32
            )
        if hp.get("use_speed_embed", False):
            batch["speed"] = np.asarray([[s["speed"]] for s in samples], np.float32)
        if hp.get("use_spk_id", False):
            batch["spk_ids"] = np.asarray([s["spk_id"] for s in samples], np.int32)
        if hp.get("use_lang_id", False):
            batch["languages"] = collate_nd(
                [s["languages"] for s in samples], 0, t_txt
            ).astype(np.int32)
        return batch


class VarianceDataset(BaseDataset):
    """Variance batches (VarianceDataset.collater, variance_task.py:31-71)."""

    def __init__(self, data_dir, hp: dict, prefix: str, preload: bool = False,
                 frame_bucket: int = 128, token_bucket: int = 16):
        super().__init__(data_dir, prefix, hp.get("dataset_size_key", "lengths"), preload)
        self.hp = hp
        self.frame_bucket = frame_bucket
        self.token_bucket = token_bucket
        self.var_list = [
            v for v in ("energy", "breathiness", "voicing", "tension")
            if hp.get(f"predict_{v}", False)
        ]

    PAD_AXES = {"t_mel": "mel2ph", "t_txt": "tokens", "t_note": "note_midi"}

    def collater(self, samples: List[Dict], pad_to: Dict[str, int] = None) -> Dict:
        batch = self.collate_base(samples)
        if batch["size"] == 0:
            return batch
        hp = self.hp
        pad_to = pad_to or {}
        t_txt = max(_bucket(max(len(s["tokens"]) for s in samples), self.token_bucket),
                    pad_to.get("t_txt", 0))
        batch.update(
            tokens=collate_nd([s["tokens"] for s in samples], 0, t_txt).astype(np.int32),
            ph_dur=collate_nd([s["ph_dur"] for s in samples], 0, t_txt).astype(np.int32),
        )
        if hp.get("use_spk_id", False):
            batch["spk_ids"] = np.asarray([s["spk_id"] for s in samples], np.int32)
        if hp.get("use_lang_id", False):
            batch["languages"] = collate_nd([s["languages"] for s in samples], 0, t_txt).astype(np.int32)
        if hp["predict_dur"]:
            batch["ph2word"] = collate_nd([s["ph2word"] for s in samples], 0, t_txt).astype(np.int32)
            batch["midi"] = collate_nd([s["midi"] for s in samples], 0, t_txt).astype(np.int32)
        needs_frames = hp["predict_pitch"] or self.var_list
        if needs_frames:
            t_mel = max(_bucket(max(len(s["mel2ph"]) for s in samples), self.frame_bucket),
                        pad_to.get("t_mel", 0))
        if hp["predict_pitch"]:
            t_note = max(_bucket(max(len(s["note_midi"]) for s in samples), self.token_bucket),
                         pad_to.get("t_note", 0))
            batch["note_midi"] = collate_nd([s["note_midi"] for s in samples], -1.0, t_note).astype(np.float32)
            batch["note_rest"] = collate_nd([s["note_rest"] for s in samples], True, t_note)
            batch["note_dur"] = collate_nd([s["note_dur"] for s in samples], 0, t_note).astype(np.int32)
            if hp.get("use_glide_embed", False):
                batch["note_glide"] = collate_nd([s["note_glide"] for s in samples], 0, t_note).astype(np.int32)
            batch["mel2note"] = collate_nd([s["mel2note"] for s in samples], 0, t_mel).astype(np.int32)
            batch["base_pitch"] = collate_nd([s["base_pitch"] for s in samples], 0.0, t_mel).astype(np.float32)
        if needs_frames:
            batch["mel2ph"] = collate_nd([s["mel2ph"] for s in samples], 0, t_mel).astype(np.int32)
            batch["pitch"] = collate_nd([s["pitch"] for s in samples], 0.0, t_mel).astype(np.float32)
            batch["uv"] = collate_nd([s["uv"] for s in samples], True, t_mel)
        for v in self.var_list:
            batch[v] = collate_nd([s[v] for s in samples], 0.0, t_mel).astype(np.float32)
        return batch
