"""Batched serving for concurrent .ds segments (BASELINE.json config #5).

Groups pending segments by (token-bucket, frame-bucket) so each compiled
program serves many requests at once — on one v5e chip, batched execution
roughly doubles mel frames/sec over one-segment-at-a-time inference.

Multi-chip serving: pass ``mesh=create_mesh(...)`` (parallel/mesh.py) and the
server shards each group batch over the mesh's 'data' axis with replicated
params — the forward is purely batch-wise, so XLA partitions it without any
collectives (the TPU-native equivalent of running one DDP-style replica per
device; the reference has no serving-side scale-out at all). Group batches
are padded to a multiple of the data-axis size.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.inference.base_svs_infer import bucket_length
from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer
from diffsinger_tpu.utils import pad_to


class AcousticServer(DiffSingerAcousticInfer):
    """Batch-of-segments acoustic synthesis.

    ``synthesize_batch(segments)`` preprocesses all segments, groups them by
    bucket shape, pads each group into one [B, T] batch, runs the jitted
    forward + vocoder per group, and returns per-segment waveforms in input
    order.

    With ``mesh`` set, each group batch additionally shards over the mesh's
    'data' axis (params replicated), scaling serving throughput across chips.
    """

    def __init__(self, hparams: dict, max_batch_size: int = 8, mesh=None, **kwargs):
        super().__init__(hparams, **kwargs)
        self.max_batch_size = max_batch_size
        self.mesh = mesh
        if mesh is not None:
            from diffsinger_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._batch_sharding = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            self.params = jax.device_put(self.params, repl)
            if getattr(self, "vocoder", None) is not None and hasattr(self.vocoder, "params"):
                self.vocoder.params = jax.device_put(self.vocoder.params, repl)
            self._data_size = mesh.shape["data"]
        else:
            self._batch_sharding = None
            self._data_size = 1

    def _group_key(self, batch: Dict[str, np.ndarray]):
        t_txt = bucket_length(batch["tokens"].shape[1], step=16, minimum=16)
        t_mel = bucket_length(batch["mel2ph"].shape[1])
        return (t_txt, t_mel)

    def synthesize_batch(
        self, segments: List[dict], seed: int = -1, steps: Optional[int] = None,
    ) -> List[np.ndarray]:
        batches = [self.preprocess_input(p, idx=i) for i, p in enumerate(segments)]
        groups: Dict[tuple, List[int]] = defaultdict(list)
        for i, b in enumerate(batches):
            groups[self._group_key(b)].append(i)

        results: List[Optional[np.ndarray]] = [None] * len(segments)
        for (t_txt, t_mel), idxs in groups.items():
            for chunk_start in range(0, len(idxs), self.max_batch_size):
                chunk = idxs[chunk_start : chunk_start + self.max_batch_size]
                stacked = self._stack(batches, chunk, t_txt, t_mel)
                rng = jax.random.PRNGKey((seed if seed >= 0 else 0) & 0xFFFF_FFFF)
                mel, f0 = self._run_group(stacked, rng, steps)
                wavs = np.asarray(self.vocoder.spec2wav_jax(mel, jnp.asarray(f0)))
                hop = self.hparams["hop_size"]
                for j, seg_idx in enumerate(chunk):
                    length = batches[seg_idx]["mel2ph"].shape[1]
                    results[seg_idx] = wavs[j, : length * hop]
        return results

    def _stack(self, batches, idxs, t_txt, t_mel):
        def cat(key, length, pad_value=0):
            rows = [pad_to(batches[i][key], length, pad_value=pad_value, axis=1) for i in idxs]
            # pad the batch axis to a multiple of the mesh's data-axis size
            # (zero rows: tokens/mel2ph 0 is PAD everywhere; dropped on slice)
            short = -len(rows) % self._data_size
            rows += [np.zeros_like(rows[0])] * short
            return np.concatenate(rows, axis=0)

        out = {
            "tokens": cat("tokens", t_txt),
            "mel2ph": cat("mel2ph", t_mel),
            "f0": cat("f0", t_mel),
        }
        for key in ("key_shift", "speed", *self.variances_to_embed):
            if key in batches[idxs[0]]:
                out[key] = cat(key, t_mel)
        if "languages" in batches[idxs[0]]:
            out["languages"] = cat("languages", t_txt)
        return out

    def _device_put_batch(self, x):
        x = jnp.asarray(x)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
        return x

    def _run_group(self, stacked, rng, steps):
        kwargs = {}
        for key in ("key_shift", "speed"):
            if key in stacked:
                kwargs[key] = self._device_put_batch(stacked[key])
        variances = {v: self._device_put_batch(stacked[v])
                     for v in self.variances_to_embed if v in stacked}
        if variances:
            kwargs["variances"] = variances
        if "languages" in stacked:
            kwargs["languages"] = self._device_put_batch(stacked["languages"])
        key = ("serve", stacked["tokens"].shape, stacked["mel2ph"].shape,
               tuple(sorted(kwargs)), steps)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda params, rng, tokens, mel2ph, f0, kw: self.model.forward_infer(
                    params, rng, tokens, mel2ph, f0, steps=steps, **kw
                ).diff_out
            )
        mel = self._jit_cache[key](
            self.params, rng, self._device_put_batch(stacked["tokens"]),
            self._device_put_batch(stacked["mel2ph"]),
            self._device_put_batch(stacked["f0"]), kwargs,
        )
        return mel, stacked["f0"]
