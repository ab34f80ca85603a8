"""Binarization orchestration (reference basics/base_binarizer.py).

Responsibilities preserved: speaker/language map construction, train/valid
split by test_prefixes (4 matching passes), phoneme-coverage check with a
distribution plot, per-item processing (optionally multiprocess), augmentation
scheduling, HDF5 writing and `.meta` pickling.
"""

from __future__ import annotations

import json
import pathlib
import pickle
import random
import shutil
import warnings
from copy import deepcopy

import numpy as np

from diffsinger_tpu.data.indexed_datasets import IndexedDatasetBuilder
from diffsinger_tpu.utils.multiprocess_utils import chunked_multiprocess_run
from diffsinger_tpu.utils.text import load_phoneme_dictionary


class BinarizationError(Exception):
    pass


class BaseBinarizer:
    def __init__(self, hparams: dict, datasets=None, data_attrs=None):
        self.hparams = hparams
        self.datasets = datasets if datasets is not None else hparams["datasets"]
        self.raw_data_dirs = [pathlib.Path(ds["raw_data_dir"]) for ds in self.datasets]
        self.binary_data_dir = pathlib.Path(hparams["binary_data_dir"])
        self.data_attrs = data_attrs or []
        self.binarization_args = hparams["binarization_args"]
        self.augmentation_args = hparams.get("augmentation_args", {})

        self.spk_map = {}
        self.spk_ids = None
        self.build_spk_map()
        self.lang_map = {}
        self.dictionaries = hparams.get("dictionaries") or {}
        self.build_lang_map()

        self.items = {}
        self.item_names = None
        self._train_item_names = None
        self._valid_item_names = None

        self.phoneme_dictionary = load_phoneme_dictionary(hparams)
        self.timestep = hparams["hop_size"] / hparams["audio_sample_rate"]

    # ------------------------------------------------------------------
    def build_spk_map(self):
        """Assign speaker ids, honoring explicit spk_id keys
        (base_binarizer.py:74-96)."""
        spk_ids = [ds.get("spk_id") for ds in self.datasets]
        assigned = {i for i in spk_ids if i is not None}
        idx = 0
        for i in range(len(spk_ids)):
            if spk_ids[i] is not None:
                continue
            while idx in assigned:
                idx += 1
            spk_ids[i] = idx
            assigned.add(idx)
        assert max(spk_ids) < self.hparams["num_spk"], (
            f"Index in spk_id sequence {spk_ids} is out of range. "
            f"All values should be smaller than num_spk."
        )
        for spk_id, dataset in zip(spk_ids, self.datasets):
            name = dataset["speaker"]
            if name in self.spk_map and self.spk_map[name] != spk_id:
                raise ValueError(
                    f"Invalid speaker ID assignment. Name '{name}' is assigned "
                    f"with different speaker IDs: {self.spk_map[name]} and {spk_id}."
                )
            self.spk_map[name] = spk_id
        self.spk_ids = spk_ids
        print("| spk_map: ", self.spk_map)

    def build_lang_map(self):
        dictionaries = self.hparams.get("dictionaries") or {}
        if not dictionaries:
            return
        assert len(dictionaries) <= self.hparams["num_lang"], (
            "Number of languages must not be greater than num_lang!"
        )
        for dataset in self.datasets:
            assert dataset["language"] in dictionaries, (
                f"Unrecognized language name: {dataset['language']}"
            )
        for lang_id, lang_name in enumerate(sorted(dictionaries.keys()), start=1):
            self.lang_map[lang_name] = lang_id
        print("| lang_map: ", self.lang_map)

    # ------------------------------------------------------------------
    def load_meta_data(self, raw_data_dir: pathlib.Path, ds_id, spk, lang) -> dict:
        raise NotImplementedError()

    def split_train_valid_set(self, prefixes: list):
        """4-pass prefix matching (base_binarizer.py:112-163)."""
        prefixes = {str(p): 1 for p in prefixes}
        valid = {}
        for prefix in deepcopy(prefixes):
            if prefix in self.item_names:
                valid[prefix] = 1
                prefixes.pop(prefix)
        for prefix in deepcopy(prefixes):
            matched = False
            for name in self.item_names:
                if name.split(":")[-1] == prefix:
                    valid[name] = 1
                    matched = True
            if matched:
                prefixes.pop(prefix)
        for prefix in deepcopy(prefixes):
            matched = False
            for name in self.item_names:
                if name.startswith(prefix):
                    valid[name] = 1
                    matched = True
            if matched:
                prefixes.pop(prefix)
        for prefix in deepcopy(prefixes):
            matched = False
            for name in self.item_names:
                if name.split(":")[-1].startswith(prefix):
                    valid[name] = 1
                    matched = True
            if matched:
                prefixes.pop(prefix)
        if prefixes:
            warnings.warn(
                f"The following rules in test_prefixes have no matching names in "
                f"the dataset: {', '.join(prefixes.keys())}",
                category=UserWarning,
            )
        valid_names = list(valid.keys())
        assert valid_names, "Validation set is empty!"
        train_names = [x for x in self.item_names if x not in set(valid_names)]
        assert train_names, "Training set is empty!"
        return train_names, valid_names

    @property
    def train_item_names(self):
        return self._train_item_names

    @property
    def valid_item_names(self):
        return self._valid_item_names

    def meta_data_iterator(self, prefix):
        names = self.train_item_names if prefix == "train" else self.valid_item_names
        for name in names:
            yield name, self.items[name]

    # ------------------------------------------------------------------
    def process(self):
        test_prefixes = []
        for ds_id, dataset in enumerate(self.datasets):
            items = self.load_meta_data(
                pathlib.Path(dataset["raw_data_dir"]),
                ds_id=ds_id, spk=dataset["speaker"], lang=dataset.get("language"),
            )
            self.items.update(items)
            test_prefixes.extend(f"{ds_id}:{p}" for p in dataset.get("test_prefixes", []))
        self.item_names = sorted(self.items.keys())
        self._train_item_names, self._valid_item_names = self.split_train_valid_set(test_prefixes)

        if self.binarization_args["shuffle"]:
            random.shuffle(self.item_names)

        self.binary_data_dir.mkdir(parents=True, exist_ok=True)
        with open(self.binary_data_dir / "spk_map.json", "w", encoding="utf-8") as f:
            json.dump(self.spk_map, f, ensure_ascii=False)
        with open(self.binary_data_dir / "lang_map.json", "w", encoding="utf-8") as f:
            json.dump(self.lang_map, f, ensure_ascii=False)
        for lang, dict_path in (self.hparams.get("dictionaries") or {}).items():
            shutil.copy(dict_path, self.binary_data_dir / f"dictionary-{lang}.txt")
        if self.hparams.get("dictionary"):
            shutil.copy(self.hparams["dictionary"], self.binary_data_dir / "dictionary.txt")
        self.check_coverage()

        try:
            self.process_dataset("valid")
            self.process_dataset(
                "train",
                num_workers=int(self.binarization_args["num_workers"]),
                apply_augmentation=any(
                    args.get("enabled") for args in self.augmentation_args.values()
                ),
            )
        except KeyboardInterrupt:
            raise SystemExit(-1)

    def check_coverage(self):
        """Phoneme distribution summary + hard failure on coverage gaps
        (base_binarizer.py:225-283)."""
        required = set(range(1, len(self.phoneme_dictionary)))
        occurred = set()
        count_map = {idx: 0 for idx in required}
        for item in self.items.values():
            occurred.update(item["ph_seq"])
            for idx in item["ph_seq"]:
                count_map[idx] += 1
        ph_count = {
            self.phoneme_dictionary.decode_one(idx, scalar=False): c
            for idx, c in count_map.items()
        }

        def disp(p):
            return f"({', '.join(p)})" if isinstance(p, tuple) else p

        print("===== Phoneme Distribution Summary =====")
        keys = sorted(ph_count.keys(), key=lambda v: v[0] if isinstance(v, tuple) else v)
        print(", ".join(f"{disp(k)}: {ph_count[k]}" for k in keys))

        from diffsinger_tpu.utils.plot import distribution_to_figure

        plt = distribution_to_figure(
            title="Phoneme Distribution Summary",
            x_label="Phoneme", y_label="Number of occurrences",
            items=[disp(k) for k in keys], values=[ph_count[k] for k in keys],
            rotate=len(self.dictionaries) > 1,
        )
        filename = self.binary_data_dir / "phoneme_distribution.jpg"
        plt.savefig(fname=filename, bbox_inches="tight", pad_inches=0.25)
        print(f"| save summary to '{filename}'")

        if occurred != required:
            missing = sorted(
                {self.phoneme_dictionary.decode_one(i, scalar=False) for i in required - occurred},
                key=lambda v: v[0] if isinstance(v, tuple) else v,
            )
            raise BinarizationError(
                f"The following phonemes are not covered in transcriptions: {missing}"
            )

    def process_dataset(self, prefix, num_workers=0, apply_augmentation=False):
        """Run process_item over the split, write HDF5 + meta
        (base_binarizer.py:285-377)."""
        args = [
            [name, meta, self.binarization_args]
            for name, meta in self.meta_data_iterator(prefix)
        ]
        builder = IndexedDatasetBuilder(self.binary_data_dir, prefix=prefix,
                                        allowed_attr=self.data_attrs)
        total_sec = {k: 0.0 for k in self.spk_map}
        total_raw_sec = {k: 0.0 for k in self.spk_map}
        extra_info = {"names": {}, "ph_texts": {}, "spk_ids": {}, "spk_names": {}, "lengths": {}}
        max_no = -1
        aug_map = (
            self.arrange_data_augmentation(self.meta_data_iterator(prefix))
            if apply_augmentation else {}
        )

        def record(item, item_no):
            nonlocal max_no
            max_no = max(max_no, item_no)
            for k, v in item.items():
                if isinstance(v, np.ndarray):
                    extra_info.setdefault(k, {})[item_no] = v.shape[0]
            extra_info["names"][item_no] = item["name"].split(":", 1)[-1]
            extra_info["ph_texts"][item_no] = item["ph_text"]
            extra_info["spk_ids"][item_no] = item["spk_id"]
            extra_info["spk_names"][item_no] = item["spk_name"]
            extra_info["lengths"][item_no] = item["length"]

        def postprocess(item):
            if item is None:
                return
            item_no = builder.add_item(item)
            record(item, item_no)
            total_raw_sec[item["spk_name"]] += item["seconds"]
            total_sec[item["spk_name"]] += item["seconds"]
            for task in aug_map.get(item["name"], []):
                aug_item = task["func"](item, **task["kwargs"])
                aug_no = builder.add_item(aug_item)
                record(aug_item, aug_no)
                total_sec[aug_item["spk_name"]] += aug_item["seconds"]

        try:
            if num_workers > 0:
                for item in chunked_multiprocess_run(self.process_item, args, num_workers):
                    postprocess(item)
            else:
                for a in args:
                    postprocess(self.process_item(*a))
            for k in extra_info:
                assert set(extra_info[k]) == set(range(max_no + 1)), (
                    "Item numbering is not consecutive."
                )
                extra_info[k] = [v for _, v in sorted(extra_info[k].items())]
        except KeyboardInterrupt:
            builder.finalize()
            raise
        builder.finalize()
        if prefix == "train":
            extra_info.pop("names")
            extra_info.pop("ph_texts")
            extra_info.pop("spk_names")
        extra_info["provenance"] = self.feature_provenance()
        with open(self.binary_data_dir / f"{prefix}.meta", "wb") as f:
            pickle.dump(extra_info, f)
        total = sum(total_raw_sec.values())
        print(f"| {prefix} total duration: {total:.2f}s")
        if apply_augmentation:
            aug_total = sum(total_sec.values())
            print(f"| {prefix} total duration (after augmentation): "
                  f"{aug_total:.2f}s ({aug_total / max(total, 1e-9):.2f}x)")

    def feature_provenance(self) -> dict:
        """Extractor names+versions recorded into the ``.meta`` so a dataset's
        feature lineage is machine-checkable (the reference binarizes through
        pyworld C++; native re-extraction is close but not bit-identical —
        tolerances documented in tests/test_world_goldens.py)."""
        from diffsinger_tpu import __version__

        return {
            "binarizer": type(self).__name__,
            "framework": f"diffsinger_tpu {__version__}",
        }

    def arrange_data_augmentation(self, data_iterator):
        raise NotImplementedError()

    def process_item(self, item_name, meta_data, binarization_args):
        raise NotImplementedError()
