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

import os
import pathlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.inference.base_svs_infer import bucket_length
from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer
from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer
from diffsinger_tpu.utils import pad_to
from diffsinger_tpu.utils.infer_utils import save_wav


class _ServerMixin:
    """Shared batch-serving scaffolding for the acoustic/variance servers:
    mesh wiring (replicated params + data-axis batch sharding), the
    device-put helper, and the per-segment-seed policy warning."""

    def _init_serving(self, max_batch_size: int, mesh):
        self.max_batch_size = max_batch_size
        self.mesh = mesh
        if mesh is not None:
            from diffsinger_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._batch_sharding = batch_sharding(mesh)
            self.params = jax.device_put(self.params, replicated_sharding(mesh))
            self._data_size = mesh.shape["data"]
        else:
            self._batch_sharding = None
            self._data_size = 1

    def _device_put_batch(self, x):
        if x is None:
            return None
        x = jnp.asarray(x)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
        return x

    @staticmethod
    def _warn_per_segment_seeds(params: List[dict]):
        if any("seed" in p for p in params):
            import warnings

            warnings.warn("batched serving ignores per-segment 'seed' fields; "
                          "use --seed for deterministic output")


class AcousticServer(_ServerMixin, DiffSingerAcousticInfer):
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
        self._init_serving(max_batch_size, mesh)
        if mesh is not None and getattr(self, "vocoder", None) is not None \
                and hasattr(self.vocoder, "params"):
            from diffsinger_tpu.parallel.mesh import replicated_sharding

            self.vocoder.params = jax.device_put(
                self.vocoder.params, replicated_sharding(mesh))

    def _group_key(self, batch: Dict[str, np.ndarray]):
        t_txt = bucket_length(batch["tokens"].shape[1], step=16, minimum=16)
        t_mel = bucket_length(batch["mel2ph"].shape[1])
        # speaker-mix width AND static/dynamic-ness must match within a
        # stacked group: a static [1, 1, N] value row cannot be concatenated
        # with (or zero-padded against) a dynamic [1, T, N] row
        spk = ((batch["spk_mix_id"].shape[-1],
                batch["spk_mix_value"].shape[1] > 1)
               if "spk_mix_id" in batch else None)
        return (t_txt, t_mel, spk)

    def synthesize_batch(
        self, segments: List[dict], seed: int = -1, steps: Optional[int] = None,
        depth: Optional[int] = None,
    ) -> List[np.ndarray]:
        batches = [self.preprocess_input(p, idx=i) for i, p in enumerate(segments)]
        # Sort-and-pack instead of exact-bucket grouping: heterogeneous scores
        # (e.g. samples/09: 10 segments, 450-1500 frames) would scatter into
        # near-singleton exact-shape groups, each paying a full dispatch.
        # Sorting by frame bucket and padding each chunk to ITS max bucket
        # trades bounded pad-FLOPs for far fewer (batched) dispatches; chunk
        # programs stay shape-keyed in the jit cache. Speaker-mix width still
        # partitions chunks (stacking requires equal widths).
        keys = [self._group_key(b) for b in batches]
        groups: Dict[tuple, List[int]] = defaultdict(list)
        for i, (_t_txt, _t_mel, spk) in enumerate(keys):
            groups[spk].append(i)

        results: List[Optional[np.ndarray]] = [None] * len(segments)
        hop = self.hparams["hop_size"]
        fused = hasattr(self.vocoder, "spec2wav_traced")
        profile = bool(os.environ.get("DS_SERVING_PROFILE"))

        # Phase 1 — dispatch every chunk (async): chunk k+1's device compute
        # overlaps chunk k's host fetch. Phase 2 — fetch in dispatch order.
        # JAX dispatch is non-blocking; with 1-2 chunks per score this stays
        # far from the deep-queue pathology the axon tunnel shows on training
        # loops (NOTES.md round-3 session 6).
        pending = []  # (chunk, t_txt, t_mel, wav_dev, t_dispatch_s)
        stats = []  # per-chunk wall attribution, kept on self.last_stats
        for _spk, idxs in groups.items():
            idxs = sorted(idxs, key=lambda i: (keys[i][1], keys[i][0]))
            for chunk_start in range(0, len(idxs), self.max_batch_size):
                chunk = idxs[chunk_start : chunk_start + self.max_batch_size]
                t_txt = max(keys[i][0] for i in chunk)
                t_mel = max(keys[i][1] for i in chunk)
                t0 = time.perf_counter()
                stacked = self._stack(batches, chunk, t_txt, t_mel)
                rng = jax.random.PRNGKey((seed if seed >= 0 else 0) & 0xFFFF_FFFF)
                if fused:
                    # sampler + vocoder (+ int16 wire cast) as ONE program
                    wav_dev = self._run_group_wav(stacked, rng, steps, depth)
                else:
                    mel, f0 = self._run_group(stacked, rng, steps)
                    wav_dev = self.vocoder.spec2wav_jax(mel, jnp.asarray(f0))
                # dispatch wall captured HERE (phase 1), not at fetch time —
                # otherwise later chunks' "dispatch" would absorb earlier
                # chunks' compute+fetch walls
                pending.append((chunk, t_txt, t_mel, wav_dev,
                                time.perf_counter() - t0))

        for chunk, t_txt, t_mel, wav_dev, dispatch_s in pending:
            t1 = time.perf_counter()
            if profile:
                np.asarray(wav_dev[:1, :1])  # forces remote execution (tunnel)
            t2 = time.perf_counter()
            wavs = np.asarray(wav_dev)
            if wavs.dtype == np.int16:  # fused path ships int16 over the wire
                wavs = wavs.astype(np.float32) / 32767.0
            t3 = time.perf_counter()
            stats.append({
                "batch": len(chunk), "t_txt": t_txt, "t_mel": t_mel,
                "dispatch_s": dispatch_s,
                # compute_s is only separable under profile (the 1-element
                # probe forces remote execution before the bulk fetch);
                # without it the device wait is folded into fetch_s
                "compute_s": (t2 - t1) if profile else None,
                "fetch_s": t3 - t2,
                "wire_mb": wav_dev.nbytes / 1e6,
            })
            if profile:
                print(f"| serve chunk B={len(chunk)} [{t_txt}x{t_mel}]: "
                      f"stack+dispatch {dispatch_s:.3f}s compute-wait {t2-t1:.3f}s "
                      f"fetch {t3-t2:.3f}s ({wav_dev.nbytes/1e6:.1f} MB)")
            for j, seg_idx in enumerate(chunk):
                length = batches[seg_idx]["mel2ph"].shape[1]
                results[seg_idx] = wavs[j, : length * hop]
        self.last_stats = stats
        return results

    def run_inference(
        self,
        params: List[dict],
        out_dir: pathlib.Path = None,
        title: str = None,
        num_runs: int = 1,
        spk_mix: Dict[str, float] = None,
        seed: int = -1,
        save_mel: bool = False,
        steps: Optional[int] = None,
        depth: Optional[int] = None,
    ):
        """Batched drop-in for the sequential driver: segments of a score run
        grouped by bucket shape (``scripts/infer.py acoustic --batch_size``).

        Noise semantics differ from sequential mode: one PRNG key per group
        batch (derived from ``seed``/run index) instead of one per segment —
        per-segment ``seed`` fields are ignored (warned).  Output is still
        deterministic given ``seed``.
        """
        if save_mel:  # mel export stays sequential (per-segment npz rows)
            return super().run_inference(
                params, out_dir=out_dir, title=title, num_runs=num_runs,
                spk_mix=spk_mix, seed=seed, save_mel=True, steps=steps, depth=depth)
        self._warn_per_segment_seeds(params)
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for run in range(num_runs):
            run_seed = (seed if seed >= 0 else hash((title, run))) & 0xFFFF_FFFF
            wavs = self.synthesize_batch(params, seed=run_seed, steps=steps, depth=depth)
            result = self._concat_segments(params, wavs)
            filename = (f"{title}-{str(run).zfill(3)}.wav" if num_runs > 1
                        else f"{title}.wav")
            save_path = out_dir / filename
            print(f"| save audio: {save_path}")
            save_wav(result, save_path, self.hparams["audio_sample_rate"])

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
        if "spk_mix_id" in batches[idxs[0]]:
            out["spk_mix_id"] = cat("spk_mix_id", batches[idxs[0]]["spk_mix_id"].shape[1])
            val_len = (t_mel if batches[idxs[0]]["spk_mix_value"].shape[1] > 1 else 1)
            out["spk_mix_value"] = cat("spk_mix_value", val_len)
        return out

    def _device_put_batch(self, x):
        x = jnp.asarray(x)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
        return x

    def _group_kwargs(self, stacked):
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
        mix = None
        if "spk_mix_id" in stacked:
            mix = {"id": self._device_put_batch(stacked["spk_mix_id"]),
                   "value": self._device_put_batch(stacked["spk_mix_value"])}
        return kwargs, mix

    def _run_group(self, stacked, rng, steps):
        kwargs, mix = self._group_kwargs(stacked)
        key = ("serve", stacked["tokens"].shape, stacked["mel2ph"].shape,
               tuple(sorted(kwargs)), mix is not None, steps)
        if key not in self._jit_cache:

            def fn(params, rng, tokens, mel2ph, f0, kw, mix):
                return self.model.forward_infer(
                    params, rng, tokens, mel2ph, f0, steps=steps,
                    **self._mixed_kwargs(params, kw, mix),
                ).diff_out

            self._jit_cache[key] = jax.jit(fn)
        mel = self._jit_cache[key](
            self.params, rng, self._device_put_batch(stacked["tokens"]),
            self._device_put_batch(stacked["mel2ph"]),
            self._device_put_batch(stacked["f0"]), kwargs, mix,
        )
        return mel, stacked["f0"]

    def _run_group_wav(self, stacked, rng, steps, depth=None):
        """Fused sampler+vocoder group program -> wav [B, T_mel*hop]."""
        kwargs, mix = self._group_kwargs(stacked)
        key = ("serve_wav", stacked["tokens"].shape, stacked["mel2ph"].shape,
               tuple(sorted(kwargs)), mix is not None, steps, depth)
        if key not in self._jit_cache:

            def fn(params, voc_params, rng, tokens, mel2ph, f0, kw, mix):
                out = self.model.forward_infer(
                    params, rng, tokens, mel2ph, f0, steps=steps, depth=depth,
                    **self._mixed_kwargs(params, kw, mix),
                )
                wav = self.vocoder.spec2wav_traced(voc_params, out.diff_out, f0)
                # int16 wire format: the deliverable is a 16-bit wav, and over
                # the axon tunnel the waveform FETCH (not compute) dominates
                # the serving wall (measured 17 MB/s; docs/perf/chain_bench.json)
                return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](
            self.params, self.vocoder.params, rng,
            self._device_put_batch(stacked["tokens"]),
            self._device_put_batch(stacked["mel2ph"]),
            self._device_put_batch(stacked["f0"]), kwargs, mix,
        )


class VarianceServer(_ServerMixin, DiffSingerVarianceInfer):
    """Batch-of-segments variance prediction (VERDICT r3 #3: the chain's
    variance stage ran segments serially while the acoustic stage batched).

    Segments are grouped by (predictor flags, bucket shapes, present-kwarg
    set, speaker-mix widths); each group chunk stacks its padded rows into one
    [B, T] batch and dispatches ONE jitted forward (the same cached programs
    the sequential driver uses — ``_run_padded`` is batch-size agnostic).

    Noise semantics follow AcousticServer: one PRNG key per group chunk
    (derived from ``seed``/run index) instead of one per segment; per-segment
    ``seed`` fields are ignored with a warning.
    """

    def __init__(self, hparams: dict, max_batch_size: int = 8, mesh=None, **kwargs):
        super().__init__(hparams, **kwargs)
        self._init_serving(max_batch_size, mesh)

    def _group_key(self, batch, flags):
        present = tuple(sorted(
            k for k in ("ph_dur", "word_dur", "mel2ph", "pitch", "expr",
                        "note_glide", "languages")
            if k in batch and batch[k] is not None
        ))
        # both mix levels' speaker counts AND static/dynamic-ness must match
        # within a stacked group (a [1,1,N] row cannot concat with [1,T,M])
        spk = (batch["ph_spk_mix_id"].shape[-1],
               batch["spk_mix_id"].shape[-1],
               batch["ph_spk_mix_value"].shape[1] > 1,
               batch["spk_mix_value"].shape[1] > 1) if "ph_spk_mix_id" in batch else None
        return (flags, present, spk)

    @staticmethod
    def _stack_rows(rows, pad_rows: int):
        if rows[0] is None:
            return None
        rows = list(rows) + [np.zeros_like(rows[0])] * pad_rows
        return np.concatenate([np.asarray(r) for r in rows], axis=0)

    def predict_batch(self, params_list: List[dict], seed: int = -1,
                      steps: Optional[int] = None):
        """Run the variance stage over all segments, batched by group.
        Returns per-segment (dur_pred, pitch_pred, variance_dict) in order."""
        flags_list = [self.segment_flags(p) for p in params_list]
        batches = [
            self.preprocess_input(
                p, idx=i,
                load_dur=not f[0] and (f[1] or f[2]),
                load_pitch=not f[1] and f[2],
            )
            for i, (p, f) in enumerate(zip(params_list, flags_list))
        ]
        groups: Dict[tuple, List[int]] = defaultdict(list)
        for i, (b, f) in enumerate(zip(batches, flags_list)):
            groups[self._group_key(b, f)].append(i)
        shapes = [self.bucket_shapes(b) for b in batches]

        preds: List[Optional[tuple]] = [None] * len(params_list)
        for (flags, _present, _spk), idxs in groups.items():
            # sort-and-pack (see AcousticServer.synthesize_batch): chunks pad
            # to the per-chunk max of each bucket dim instead of splitting
            # heterogeneous scores into near-singleton exact-shape groups
            idxs = sorted(idxs, key=lambda i: shapes[i][::-1])
            for chunk_start in range(0, len(idxs), self.max_batch_size):
                chunk = idxs[chunk_start: chunk_start + self.max_batch_size]
                buckets = tuple(
                    max(shapes[i][d] for i in chunk) for d in range(4))
                rows = [self.padded_arrays(batches[i], buckets) for i in chunk]
                pad_rows = -len(rows) % self._data_size
                tokens, midi, ph2word, base_pitch = (
                    self._stack_rows([r[k] for r in rows], pad_rows)
                    for k in range(4))
                kw_keys = rows[0][4].keys()
                array_kwargs = {
                    k: self._stack_rows([r[4][k] for r in rows], pad_rows)
                    for k in kw_keys
                }
                spk_mix = None
                if rows[0][5] is not None:
                    spk_mix = {
                        k: self._stack_rows([r[5][k] for r in rows], pad_rows)
                        for k in rows[0][5]
                    }
                rng = jax.random.PRNGKey((seed if seed >= 0 else 0) & 0xFFFF_FFFF)
                array_kwargs = {k: self._device_put_batch(v)
                                for k, v in array_kwargs.items()}
                if spk_mix is not None:
                    spk_mix = {k: self._device_put_batch(v)
                               for k, v in spk_mix.items()}
                dur_b, pitch_b, vars_b = self._run_padded(
                    self._device_put_batch(tokens), self._device_put_batch(midi),
                    self._device_put_batch(ph2word),
                    self._device_put_batch(base_pitch), array_kwargs, spk_mix,
                    flags, rng, steps,
                )
                dur_np = np.asarray(dur_b) if dur_b is not None else None
                pitch_np = np.asarray(pitch_b) if pitch_b is not None else None
                vars_np = {k: np.asarray(v) for k, v in (vars_b or {}).items()}
                for j, seg_idx in enumerate(chunk):
                    t_ph = batches[seg_idx]["tokens"].shape[1]
                    t_s = batches[seg_idx]["base_pitch"].shape[1]
                    out_dur = (dur_np[j, :t_ph]
                               if dur_np is not None and flags[0] else None)
                    out_pitch = pitch_np[j, :t_s] if pitch_np is not None else None
                    out_vars = {k: v[j, :t_s] for k, v in vars_np.items()}
                    preds[seg_idx] = (out_dur, out_pitch, out_vars)
        return preds

    def run_inference(self, params: List[dict], out_dir: pathlib.Path = None,
                      title: str = None, num_runs: int = 1, seed: int = -1,
                      steps: Optional[int] = None):
        import json

        self._warn_per_segment_seeds(params)
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for run in range(num_runs):
            run_seed = (seed if seed >= 0 else hash((title, run))) & 0xFFFF_FFFF
            preds = self.predict_batch(params, seed=run_seed, steps=steps)
            results = [
                self._apply_predictions(p, *pred)
                for p, pred in zip(params, preds)
            ]
            filename = f"{title}-{str(run).zfill(3)}.ds" if num_runs > 1 else f"{title}.ds"
            save_path = out_dir / filename
            with open(save_path, "w", encoding="utf8") as f:
                print(f"| save params: {save_path}")
                json.dump(results, f, ensure_ascii=False, indent=2)
