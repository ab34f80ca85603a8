"""Length-bucketed batch sampler with deterministic sharding
(reference DsBatchSampler, utils/training_utils.py:74-197).

Semantics preserved: grid-quantized similar-size sorting, frame-budget
batching, per-epoch deterministic shuffling, rank-strided batch assignment
with leftover/pad handling, and batch-count multiples for grad accumulation.

TPU addition: batches can optionally be padded to a fixed set of frame buckets
so each (bucket, batch-size) pair compiles once.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from diffsinger_tpu.utils import batch_by_size


class DsBatchSampler:
    def __init__(
        self,
        sizes: Sequence[int],
        max_batch_frames: int,
        max_batch_size: int,
        *,
        sub_indices: Optional[Sequence[int]] = None,
        num_replicas: int = 1,
        rank: int = 0,
        frame_count_grid: int = 6,
        required_batch_count_multiple: int = 1,
        batch_by_size_flag: bool = True,
        sort_by_similar_size: bool = True,
        size_reversed: bool = False,
        shuffle_sample: bool = False,
        shuffle_batch: bool = False,
        disallow_empty_batch: bool = True,
        pad_batch_assignment: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        if rank >= num_replicas or rank < 0:
            raise ValueError(f"Invalid rank {rank}, should be in [0, {num_replicas - 1}]")
        self.sizes = np.asarray(sizes)
        self.max_batch_frames = max_batch_frames
        self.max_batch_size = max_batch_size
        self.sub_indices = list(sub_indices) if sub_indices is not None else None
        self.num_replicas = num_replicas
        self.rank = rank
        self.frame_count_grid = frame_count_grid
        self.required_batch_count_multiple = required_batch_count_multiple
        self.batch_by_size_flag = batch_by_size_flag
        self.sort_by_similar_size = sort_by_similar_size
        self.size_reversed = size_reversed
        self.shuffle_sample = shuffle_sample
        self.shuffle_batch = shuffle_batch
        self.disallow_empty_batch = disallow_empty_batch
        self.pad_batch_assignment = pad_batch_assignment
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.batches: Optional[List[List[int]]] = None
        self._formed = None

    def _form_batches(self):
        if self._formed == self.epoch + self.seed:
            return
        batches, assignment_matrix, leftovers = self._form_shared()
        self.batches = self._rank_batches(batches, assignment_matrix, leftovers, self.rank)
        self._formed = self.epoch + self.seed

    def all_rank_batches(self) -> List[List[List[int]]]:
        """Per-rank batch lists for every replica, from ONE forming pass.

        The shuffle/sort/batching work is rank-independent; only the final
        assignment slice differs per rank. Multi-host peers use this instead
        of instantiating num_replicas samplers (which would redo the O(dataset)
        forming once per rank per epoch)."""
        batches, assignment_matrix, leftovers = self._form_shared()
        return [
            self._rank_batches(batches, assignment_matrix, leftovers, r)
            for r in range(self.num_replicas)
        ]

    def _form_shared(self):
        # deterministic per (seed, epoch): unlike the reference (which uses an
        # unseeded rng), resume reproducibility is explicit here
        rng = np.random.default_rng(self.seed + self.epoch)

        if self.shuffle_sample:
            if self.sub_indices is not None:
                indices = np.asarray(self.sub_indices)
                rng.shuffle(indices)
            else:
                indices = rng.permutation(len(self.sizes))
            if self.sort_by_similar_size:
                grid = self.frame_count_grid
                assert grid > 0
                sizes = (np.round(self.sizes[indices] / grid) * grid).clip(grid, None)
                sizes *= -1 if self.size_reversed else 1
                indices = indices[np.argsort(sizes, kind="mergesort")]
            indices = indices.tolist()
        else:
            indices = self.sub_indices if self.sub_indices is not None else list(range(len(self.sizes)))

        if self.batch_by_size_flag:
            batches = batch_by_size(
                np.asarray(indices), lambda i: int(self.sizes[i]),
                max_batch_frames=self.max_batch_frames, max_batch_size=self.max_batch_size,
            )
        else:
            batches = [
                indices[i : i + self.max_batch_size]
                for i in range(0, len(indices), self.max_batch_size)
            ]
        if len(batches) < self.num_replicas and self.disallow_empty_batch:
            raise RuntimeError("There is not enough batch to assign to each node.")

        floored_total = (len(batches) // self.num_replicas) * self.num_replicas
        if self.drop_last and len(batches) > floored_total:
            batches = batches[:floored_total]
            leftovers = []
            if not batches:
                raise RuntimeError("There is no batch left after dropping the last batch.")
        elif self.shuffle_batch:
            leftovers = (rng.permutation(len(batches) - floored_total) + floored_total).tolist()
        else:
            leftovers = list(range(floored_total, len(batches)))

        assignment_matrix = np.arange(floored_total).reshape(-1, self.num_replicas).transpose()
        if self.shuffle_batch:
            assignment_matrix = rng.permuted(assignment_matrix, axis=0)
        return batches, assignment_matrix, leftovers

    def _rank_batches(self, batches, assignment_matrix, leftovers, rank):
        assignment = assignment_matrix[rank].tolist()

        floored_count = len(assignment)
        if rank < len(leftovers):
            assignment.append(leftovers[rank])
            floored_count += 1
        elif leftovers and self.pad_batch_assignment:
            if not assignment:
                raise RuntimeError("Cannot pad empty batch assignment.")
            assignment.append(assignment[self.epoch % floored_count])
        if (
            self.required_batch_count_multiple > 1
            and len(assignment) % self.required_batch_count_multiple != 0
        ):
            target = math.ceil(
                len(assignment) / self.required_batch_count_multiple
            ) * self.required_batch_count_multiple
            for i in range(target - len(assignment)):
                assignment.append(
                    assignment[(i + self.epoch * self.required_batch_count_multiple) % floored_count]
                )

        return [list(batches[i]) for i in assignment] if assignment else [[]]

    def __iter__(self):
        self._form_batches()
        return iter(self.batches)

    def __len__(self):
        self._form_batches()
        return len(self.batches)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self._form_batches()
