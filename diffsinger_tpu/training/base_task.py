"""Training runtime (reference basics/base_task.py + utils/training_utils.py).

Responsibilities preserved: step-based val intervals, log_interval scalars,
max_updates stop, checkpoint save/rotation with permanent checkpoints,
auto-resume (params + optimizer state + step), finetune param loading with
blacklist/shape filtering, prefix-based param freezing, per-epoch deterministic
batch sampling, TensorBoard logging.

TPU re-design: one jitted SPMD train step per shape bucket over a
``Mesh(('data','model'))``; gradient all-reduce is XLA-inserted (no DDP
machinery); "16-mixed" precision maps to bf16 compute with fp32 params.

Note on the reference's ``trainer_stage`` persistence (basics/base_task.py:
466-475): it exists there because Lightning re-runs validation immediately
after resuming. This loop always validates *before* writing the checkpoint and
resumes at ``step + 1``, so a mid-validation interrupt can at worst repeat one
validation pass — no stage flag is needed.
"""

from __future__ import annotations

import os
import pathlib
import time
from typing import Dict, Optional

import jax
import numpy as np

from diffsinger_tpu.data.batch_sampler import DsBatchSampler
from diffsinger_tpu.parallel.mesh import (
    create_mesh, make_global_batch, replicated_sharding,
)
from diffsinger_tpu.training.train_state import (
    TrainState, build_optimizer, create_train_state, make_train_step,
    optimizer_step, sync_gradient_step,
)
from diffsinger_tpu.utils import ckpt as ckpt_utils
from diffsinger_tpu.utils.text import load_phoneme_dictionary


class SummaryLogger:
    """tensorboardX writer with a JSONL fallback."""

    def __init__(self, log_dir):
        self.log_dir = pathlib.Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(str(self.log_dir))
        except Exception:
            self.writer = None
        self.jsonl = open(self.log_dir / "metrics.jsonl", "a")

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        import json

        self.jsonl.write(json.dumps({"step": int(step), tag: float(value)}) + "\n")

    def add_figure(self, tag, fig, step):
        if self.writer is not None:
            self.writer.add_figure(tag, fig, step)

    def add_audio(self, tag, audio, step, sample_rate):
        if self.writer is not None:
            try:
                self.writer.add_audio(tag, audio[:, None], step, sample_rate=sample_rate)
            except ModuleNotFoundError:
                # tensorboardX audio needs soundfile; fall back to wav files
                import pathlib

                from diffsinger_tpu.utils.infer_utils import save_wav

                wav_dir = pathlib.Path(self.log_dir) / "audio"
                wav_dir.mkdir(exist_ok=True)
                save_wav(audio, wav_dir / f"{tag}_step{step}.wav", sample_rate)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()
        self.jsonl.flush()


def _norm_param_prefix(p: str) -> str:
    """Reference-style param prefixes ('model.fs2.txt_embed') → flax paths:
    strip the 'model.' wrapper and map the reference's encoder-internal token
    embedding name to ours (fs2.encoder.embed_tokens → fs2.txt_embed, the
    same alias torch_model_convert.LEGACY_IGNORES handles)."""
    if p.startswith("model."):
        p = p[len("model."):]
    return p.replace("fs2.encoder.embed_tokens", "fs2.txt_embed")


def filter_finetune_params(template, loaded_state: Dict, ignored_prefixes, strict_shapes=True):
    """Shape-adaptive finetune param filtering (basics/base_task.py:113-165)."""
    from flax import serialization, traverse_util

    flat_t = traverse_util.flatten_dict(serialization.to_state_dict(template), sep="/")
    flat_l = traverse_util.flatten_dict(loaded_state, sep="/")
    prefixes = [_norm_param_prefix(p) for p in ignored_prefixes]
    out = dict(flat_t)
    skipped = []
    for k, v in flat_l.items():
        path = k.replace("/", ".")
        # flax trees root at the 'params' collection; prefixes name the
        # submodule directly (same stripping as make_freeze_mask)
        if path.startswith("params."):
            path = path[len("params."):]
        if any(path.startswith(p) or p in path for p in prefixes):
            skipped.append(k)
            continue
        if k in flat_t:
            if np.shape(flat_t[k]) == np.shape(v):
                out[k] = v
            elif strict_shapes:
                raise ValueError(f"Shape mismatch for finetune param {k}: "
                                 f"{np.shape(v)} vs {np.shape(flat_t[k])}")
            else:
                skipped.append(k)
    if skipped:
        print(f"| finetune: skipped {len(skipped)} params")
    rebuilt = traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})
    return serialization.from_state_dict(template, rebuilt)


def make_freeze_mask(params, frozen_prefixes):
    """Pytree of bools: True where the param path matches a frozen prefix
    (basics/base_task.py:92-111)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    mask = {}
    for k in flat:
        dotted = k.replace("/", ".")
        # flax trees root at the 'params' collection; reference prefixes
        # ('model.fs2', basics/base_task.py:92-111) name the submodule
        # directly — strip both wrappers before matching
        if dotted.startswith("params."):
            dotted = dotted[len("params."):]
        mask[k] = any(
            dotted.startswith(_norm_param_prefix(p)) for p in frozen_prefixes
        )
    return traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in mask.items()})


def resolve_precision(precision) -> Optional[object]:
    """Map the reference's ``pl_trainer_precision`` (configs/base.yaml:77)
    onto a compute dtype: any 16-bit setting ('16-mixed', 'bf16-mixed',
    '16', 'bf16') -> bf16 compute with fp32 params/optimizer (bf16 is the
    TPU-safe replacement for the reference's fp16 autocast; see SURVEY §5.8);
    '32'/'32-true'/None -> fp32 throughout."""
    import jax.numpy as jnp

    p = str(precision)
    if "16" in p:
        return jnp.bfloat16
    return None


_MASK_KEYS_ON_PAD = ("tokens", "mel2ph", "mel2note")


def pad_batch_rows(batch: dict, size: int, target_b: int) -> dict:
    """Pad the batch axis from ``size`` to ``target_b`` rows.

    Padding rows duplicate the last item (keeps every value finite — zero
    f0 would produce -inf log-pitch embeddings) but zero out `tokens` /
    `mel2ph` / `mel2note`, so every loss mask (`tokens > 0`, `mel2ph > 0`)
    assigns the duplicates zero weight: padded rows contribute nothing to
    the gradient instead of multiplying the last sample's weight.
    """
    if size >= target_b:
        return batch
    pad_n = target_b - size
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == size:
            pad_rows = np.repeat(v[-1:], pad_n, 0)
            if k in _MASK_KEYS_ON_PAD:
                pad_rows = np.zeros_like(pad_rows)
            batch[k] = np.concatenate([v, pad_rows], 0)
    return batch


def _bucket_batch_size(n: int, multiple: int) -> int:
    """Round a batch size up to a power-of-two multiple of ``multiple`` so
    the train-step jit cache is keyed by O(log B) batch sizes instead of
    every distinct size the frame-budget sampler produces."""
    import math

    k = max(1, math.ceil(n / multiple))
    return multiple * (1 << (k - 1).bit_length())


class BaseTask:
    """Generic training driver; subclasses provide model/loss/dataset."""

    category: str = "base"

    def __init__(self, hp: dict):
        self.hp = hp
        self.work_dir = pathlib.Path(hp["work_dir"] or ".")
        self.phoneme_dictionary = load_phoneme_dictionary(hp)
        self.compute_dtype = resolve_precision(hp.get("pl_trainer_precision", "32-true"))
        self.model = self.build_model(self.compute_dtype)
        # validation always runs fp32 — the reference's autocast-off island
        # (basics/base_task.py:266). Same params, fp32 compute.
        self.eval_model = self.build_model(None) if self.compute_dtype is not None else self.model
        self.loss_fn = self.build_loss_fn(self.model)
        self.eval_loss_fn = (
            self.loss_fn if self.eval_model is self.model
            else self.build_loss_fn(self.eval_model)
        )
        self.mesh = create_mesh()
        self.logger = SummaryLogger(self.work_dir / "lightning_logs" / "tb")

    # -- subclass contract (reference basics/base_task.py:49-56) --------
    def build_model(self, dtype=None):
        raise NotImplementedError()

    def build_loss_fn(self, model):
        raise NotImplementedError()

    def build_datasets(self):
        raise NotImplementedError()

    def validation_extras(self, state, valid_ds, batch, metrics):
        """Hook for task-specific validation metrics/plots."""

    # ------------------------------------------------------------------
    def _init_or_resume(self, tx):
        hp = self.hp
        rng = jax.random.PRNGKey(hp.get("seed", 0) if hp.get("seed") is not None else 0)
        params = self.model.init(rng)
        latest = ckpt_utils.get_latest_checkpoint_path(self.work_dir)
        if latest is not None:
            blob = ckpt_utils.load_checkpoint(latest, expected_category=self.category)
            params = ckpt_utils.restore_params(params, blob["params"])
            state = create_train_state(params, tx)
            if "opt_state" in blob:
                try:
                    state = state.replace(
                        opt_state=ckpt_utils.restore_params(state.opt_state, blob["opt_state"])
                    )
                except Exception as e:
                    # a silently reinitialized optimizer changes training
                    # dynamics (the reference instead repairs param groups,
                    # basics/base_task.py:477-514) — require explicit opt-in
                    if not hp.get("allow_optimizer_state_reset", False):
                        raise RuntimeError(
                            f"optimizer state in {latest} does not match the "
                            f"current optimizer config ({e}). Set "
                            f"allow_optimizer_state_reset: true to continue "
                            f"with a reinitialized optimizer (moments restart "
                            f"from zero; the LR schedule's step counter is "
                            f"fast-forwarded to the global step)."
                        ) from e
                    print(f"| optimizer state not restored ({e}); reinitialized "
                          f"by allow_optimizer_state_reset=true")
            import jax.numpy as jnp
            import optax

            # state.step counts MICRO-batches (it keys the per-step RNG
            # fold_in stream); the checkpoint's global_step counts applied
            # optimizer updates — restore micro = updates * accum so the RNG
            # stream CONTINUES instead of replaying consumed keys
            accum = max(1, int(hp.get("accumulate_grad_batches", 1)))
            state = state.replace(step=jnp.asarray(
                blob["meta"]["global_step"] * accum, jnp.int32))
            # keep the applied-update counter consistent with the saved
            # global step even if the optimizer state failed to restore —
            # through freezing's multi_transform nesting too (a top-level
            # isinstance check would silently restart the step counter at 0
            # on a frozen+accumulating resume)
            state = state.replace(opt_state=sync_gradient_step(
                state.opt_state, blob["meta"]["global_step"]))
            self._resume_epoch = int(blob["meta"].get("epoch", 0))
            print(f"| resumed from {latest} at step {blob['meta']['global_step']}"
                  f" (epoch {self._resume_epoch})")
            return state
        if hp.get("finetune_enabled", False) and hp.get("finetune_ckpt_path"):
            blob = ckpt_utils.load_checkpoint(hp["finetune_ckpt_path"])
            params = filter_finetune_params(
                params, blob["params"],
                hp.get("finetune_ignored_params", []),
                strict_shapes=hp.get("finetune_strict_shapes", True),
            )
            print(f"| finetune from {hp['finetune_ckpt_path']}")
        return create_train_state(params, tx)

    def _save(self, state: TrainState):
        hp = self.hp
        if jax.process_index() != 0:
            return  # multi-host: params are replicated; rank 0 owns the files
        step = optimizer_step(state)
        path = ckpt_utils.checkpoint_path(self.work_dir, step)
        ckpt_utils.save_checkpoint(
            path, jax.device_get(state.params), category=self.category,
            global_step=step, opt_state=jax.device_get(state.opt_state),
            extra={"epoch": int(getattr(self, "_epoch", 0))},
        )
        deleted = ckpt_utils.keep_checkpoints(
            self.work_dir,
            num_ckpt_keep=hp.get("num_ckpt_keep", 5),
            permanent_ckpt_start=hp.get("permanent_ckpt_start", 0),
            permanent_ckpt_interval=hp.get("permanent_ckpt_interval", -1),
        )
        print(f"| saved checkpoint at step {step}"
              + (f" (rotated {len(deleted)})" if deleted else ""))

    # ------------------------------------------------------------------
    def start(self, max_steps: Optional[int] = None):
        hp = self.hp
        tx, schedule = build_optimizer(hp)
        frozen_prefixes = list(hp.get("frozen_params") or []) \
            if hp.get("freezing_enabled", False) else []
        # staged shallow-diffusion training: a branch excluded from the loss
        # graph gets exactly-zero grads, but optax AdamW still applies weight
        # decay to zero-grad params (torch skips grad-less params entirely, so
        # the reference's staged recipe implies no decay on the idle branch).
        # Freeze the idle branch to match.
        if hp.get("use_shallow_diffusion", False):
            shallow = hp.get("shallow_diffusion_args", {})
            if not shallow.get("train_diffusion", True):
                frozen_prefixes.append("denoiser")
            if not shallow.get("train_aux_decoder", True):
                frozen_prefixes.append("aux_decoder")
        if frozen_prefixes:
            import optax

            # eval_shape: only the tree STRUCTURE is needed — a real init here
            # would pay a full (discarded) parameter initialization
            mask = make_freeze_mask(
                jax.eval_shape(self.model.init, jax.random.PRNGKey(0)),
                frozen_prefixes,
            )
            # route frozen params to set_to_zero ENTIRELY — a pre-chained
            # gradient zero is not enough (AdamW weight decay would still
            # move them; the reference's requires_grad=False stops both)
            labels = jax.tree.map(
                lambda frozen: "frozen" if frozen else "train", mask)
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, labels)
        state = self._init_or_resume(tx)
        state = jax.device_put(state, replicated_sharding(self.mesh))
        train_step = make_train_step(self.loss_fn, tx)
        jitted: Dict = {}
        self._jit_train_cache = jitted  # exposed so tests can assert compile counts

        train_ds, valid_ds = self.build_datasets()
        n_proc = jax.process_count()
        rank = jax.process_index()
        n_devices_global = int(self.mesh.devices.size)
        n_devices_local = max(1, n_devices_global // n_proc)
        max_updates = max_steps if max_steps is not None else hp.get("max_updates", 160000)
        val_interval = hp.get("val_check_interval", 2000)
        log_interval = hp.get("log_interval", 100)
        # TRAINING rng stream (dropout masks + diffusion noise/t draws).
        # 'rbg' keys generate bits through the TPU-native XLA RngBitGenerator
        # instead of lane-serial threefry — measured 8-17 ms/step cheaper at
        # the production batch (docs/perf/aux_probe.json: the aux decoder's
        # dropout alone costs 17 ms/step in threefry bits). split/fold_in
        # stay threefry-derived, so stream independence is unaffected; only
        # the per-element bit generation changes. Param INIT keeps the
        # default impl (init reproducibility is seed-documented).
        rng = jax.random.key(hp.get("seed") or 0,
                             impl=hp.get("train_rng_impl", "rbg"))
        bucket_steps = {
            "t_mel": getattr(train_ds, "frame_bucket", 128),
            "t_txt": getattr(train_ds, "token_bucket", 16),
            "t_note": getattr(train_ds, "token_bucket", 16),
        }

        def make_sampler(r: int) -> DsBatchSampler:
            # per-host loading: rank-strided batch assignment (the reference's
            # manual DDP sharding, training_utils.py:150-183) — each process
            # loads only its own batches; arrays are stitched globally via
            # make_global_batch.
            return DsBatchSampler(
                train_ds.sizes,
                max_batch_frames=hp.get("max_batch_frames", 50000),
                max_batch_size=hp.get("max_batch_size", 64),
                num_replicas=n_proc,
                rank=r,
                frame_count_grid=hp.get("sampler_frame_count_grid", 6),
                required_batch_count_multiple=hp.get("accumulate_grad_batches", 1),
                sort_by_similar_size=hp.get("sort_by_len", True),
                shuffle_sample=True,
                shuffle_batch=True,
                seed=hp.get("seed") or 0,
            )

        # optional xprof capture (SURVEY.md §5.1): `profile_steps: N` in hparams
        # (or train.py --profile N) traces N steps after warmup into
        # work_dir/profile for xprof/tensorboard
        profile_steps = int(hp.get("profile_steps", 0) or 0)
        profile_start = optimizer_step(state) + 3  # skip compile + warmup steps
        profiling = False

        step = optimizer_step(state)
        # resume mid-training restarts the data stream at the CHECKPOINTED
        # epoch: the sampler is seeded by (seed, epoch), so replaying from
        # epoch 0 would double-sample early epochs' batch order
        epoch = int(getattr(self, "_resume_epoch", 0))
        self._epoch = epoch
        t_last = time.time()
        # host-side step tracking: `optimizer_step` is a blocking device_get
        # that would synchronize the loop every iteration (over the remote
        # tunnel, a full RTT per step). The applied-update count is
        # deterministic — micro-batches // accumulate_grad_batches — so the
        # hot loop computes it on the host and lets XLA pipeline dispatch.
        accum = max(1, int(hp.get("accumulate_grad_batches", 1)))
        start_step, micro = step, 0
        # backpressure: hold at most ONE dispatched-but-unfinished step.
        # Unbounded dispatch piles donated train-state buffers in HBM
        # (measured: steps/s decays 3.8 -> 0.5 within ~20 steps); a scalar
        # fetch of the *previous* step's loss keeps the pipeline at depth 1
        # while still overlapping host batch prep with device compute.
        pending_metrics = None
        # Pipelined dispatch degrades the axon remote runtime (measured:
        # steps/s decays 2.2 -> 0.4 within ~20 steps even at depth 1 —
        # deferred remote releases of donated state buffers pile up in HBM),
        # so the tunnel defaults to per-step sync; local runtimes pipeline.
        # DS_SYNC_STEPS=0/1 overrides either way.
        remote_runtime = jax.devices()[0].platform == "axon"
        sync_steps = os.environ.get("DS_SYNC_STEPS", "1" if remote_runtime else "0") == "1"
        # opt-in half-precision WIRE format for float batch arrays: halves the
        # host->device bytes of the dominant transfer (the mel target — the
        # measured bottleneck over the remote tunnel: 651 ms upload vs 261 ms
        # device compute per 50k-frame step, docs/perf/train_parts.json). The
        # train step restores float32 on device before any arithmetic
        # (make_train_step), so only the targets' storage granularity changes
        # (f16 ulp at |mel|=12 is ~8e-3). Default off: float32 wire keeps
        # reference-exact targets.
        wire_f16 = str(hp.get("train_wire_dtype", "float32")).lower() in (
            "float16", "f16", "fp16")
        # gate val/log on a step *change* so grad accumulation (k micro-batches
        # per applied update) doesn't re-trigger them k times per boundary
        last_val_step = step
        last_log_step = step

        # sanity validation before training (reference num_sanity_val_steps,
        # Lightning semantics: default 1 bounded val batch, no TB logging) —
        # surfaces dataset/config/loss errors before paying train compiles
        sanity_steps = int(hp.get("num_sanity_val_steps", 1) or 0)
        if sanity_steps > 0 and len(valid_ds) > 0:
            self.run_validation(state, valid_ds, limit_batches=sanity_steps,
                                sanity=True)

        def prepared_batches():
            """Host-side batch prep (epoch forming, collate, pad) as ONE
            generator spanning epochs. It runs on a background thread (see
            batch pipeline below), with the device commit as a second
            chained stage, so collate(k+2), upload(k+1) and compute(k)
            overlap — dispatch depth stays 1 (no second step is dispatched
            before the previous loss arrives, so the donated-state pileup
            measured on the axon runtime cannot occur). Spanning epochs
            matters: a production frame budget over a small corpus can form
            very few batches per epoch (the train bench's fills exactly
            one), and a per-epoch generator would have nothing to
            prefetch."""
            nonlocal epoch
            while True:
                sampler = make_sampler(rank)
                sampler.set_epoch(epoch)
                if n_proc > 1:
                    # every host deterministically recomputes its peers' batch
                    # assignments (same seed/epoch/sizes) so global pad targets
                    # need no communication; one forming pass yields all ranks
                    peer_batches = sampler.all_rank_batches()
                    n_positions = min(len(b) for b in peer_batches)
                else:
                    peer_batches, n_positions = None, None
                local_batches = peer_batches[rank] if peer_batches is not None else sampler
                yielded = 0
                for pos, indices in enumerate(local_batches):
                    if not indices:
                        continue
                    if peer_batches is not None:
                        if pos >= n_positions:
                            break
                        all_indices = [i for b in peer_batches for i in b[pos]]
                        pad_to = train_ds.pad_targets(
                            all_indices, train_ds.PAD_AXES, bucket_steps)
                        global_max_b = max(len(b[pos]) for b in peer_batches)
                        target_b = _bucket_batch_size(global_max_b, n_devices_local)
                    else:
                        pad_to = None
                        target_b = None
                    batch = train_ds.collater([train_ds[i] for i in indices], pad_to=pad_to)
                    batch.pop("indices", None)
                    size = batch.pop("size")
                    # pad the batch axis to a power-of-two device multiple with
                    # loss-masked duplicate rows (bounded jit cache, zero
                    # gradient weight for the padding — see pad_batch_rows)
                    if target_b is None:
                        target_b = _bucket_batch_size(size, n_devices_local)
                    batch = pad_batch_rows(batch, size, target_b)
                    if wire_f16:
                        batch = {
                            k: (v.astype(np.float16)
                                if isinstance(v, np.ndarray) and v.dtype == np.float32
                                else v)
                            for k, v in batch.items()
                        }
                    key = tuple(sorted((k, v.shape) for k, v in batch.items()))
                    yield key, batch
                    yielded += 1
                if not yielded:
                    raise RuntimeError(
                        "training epoch formed no batches — empty dataset or "
                        "every batch position was dropped by the multi-host "
                        "minimum; check max_batch_frames vs item lengths")
                epoch += 1
                # checkpointed for resume (the prefetch thread runs ahead of
                # the consumed stream by at most its depth-1 buffer, so the
                # recorded epoch is within one batch of the true position)
                self._epoch = epoch

        def commit_batch(item):
            key, batch = item
            return key, make_global_batch(self.mesh, batch)

        # Batch pipeline: two chained single-thread stages split the host
        # work by resource — CPU collate vs host→device transfer (device_put
        # waits on DMA/network and releases the GIL) — so the loop's steady
        # state approaches max(compute, upload, collate) instead of their
        # sum. Measured basis: transfers overlap device compute even over
        # the axon tunnel (docs/perf/overlap_probe.json). Depth bounds the
        # staged batches (≤ 2·depth+1 alive). 0 = inline (single-threaded).
        # Default 1: measured best on both families (acoustic 2.59 vs 2.11
        # steps/s at depth 2; variance depth 2 DECAYS the axon runtime
        # 13→2.5 steps/s within ~40 steps — deeper in-flight transfer queues
        # trigger the same deferred-release pathology as pipelined dispatch).
        # (dataloader_prefetch_factor deliberately NOT honored here: old
        # work-dir config snapshots all carry its inert default of 2, which
        # is exactly the depth measured pathological above — aliasing it
        # would resume every pre-existing experiment at depth 2.)
        prefetch_depth = int(os.environ.get(
            "DS_PREFETCH_DEPTH", hp.get("train_prefetch_depth", 1)))
        _closers = []
        if prefetch_depth > 0:
            from diffsinger_tpu.utils.prefetch import PrefetchIterator

            host_iter = PrefetchIterator(
                prepared_batches(), prefetch_depth, name="ds-collate")
            batch_iter = PrefetchIterator(
                map(commit_batch, host_iter), prefetch_depth, name="ds-upload")
            _closers = [host_iter, batch_iter]
        else:
            batch_iter = map(commit_batch, prepared_batches())
        pending_batch = next(batch_iter, None)
        try:
            while pending_batch is not None and step < max_updates:
                key, batch = pending_batch
                if key not in jitted:
                    if os.environ.get("DS_LOG_FLOPS") == "1":
                        # AOT path: the SAME executable serves cost analysis
                        # and the training calls (no duplicate compile)
                        with self.mesh:
                            compiled = jax.jit(
                                train_step, donate_argnums=0
                            ).lower(state, batch, rng).compile()
                        try:
                            cost = compiled.cost_analysis()
                            if isinstance(cost, (list, tuple)):
                                cost = cost[0]
                            rows = max(v.shape[0] for v in batch.values() if v.ndim >= 1)
                            print(f"| train_step_flops batch={rows} "
                                  f"frames={max(v.shape[1] for v in batch.values() if v.ndim > 1)} "
                                  f"flops={float(cost.get('flops', 0.0)):.4e}",
                                  flush=True)
                        except Exception:
                            pass
                        jitted[key] = compiled
                    else:
                        jitted[key] = jax.jit(train_step, donate_argnums=0)
                if profile_steps and not profiling and step >= profile_start:
                    from jax import profiler as jax_profiler

                    jax_profiler.start_trace(str(pathlib.Path(hp["work_dir"]) / "profile"))
                    profiling = True
                with self.mesh:
                    state, metrics = jitted[key](state, batch, rng)
                # prepare the NEXT batch while the device runs this step
                # (prepared_batches docstring); the loss fetch below then
                # only waits for whatever compute the host prep didn't hide
                pending_batch = next(batch_iter, None)
                if sync_steps:
                    float(metrics["total_loss"])
                elif pending_metrics is not None:
                    float(pending_metrics["total_loss"])
                pending_metrics = metrics
                micro += 1
                step = start_step + micro // accum
                if profiling and step >= profile_start + profile_steps:
                    from jax import profiler as jax_profiler

                    jax.block_until_ready(state.params)
                    jax_profiler.stop_trace()
                    profiling = False
                    profile_steps = 0
                    print(f"| xprof trace saved to {hp['work_dir']}/profile")

                if step % log_interval == 0 and step != last_log_step:
                    last_log_step = step
                    metrics = {k: float(v) for k, v in metrics.items()}
                    lr = schedule(step)
                    dt = time.time() - t_last
                    t_last = time.time()
                    self.logger.add_scalar("training/lr", lr, step)
                    for k, v in metrics.items():
                        self.logger.add_scalar(f"training/{k}", v, step)
                    print(f"| step {step} " +
                          " ".join(f"{k}={v:.4f}" for k, v in metrics.items()) +
                          f" lr={lr:.2e} ({log_interval / max(dt, 1e-9):.2f} it/s)")

                if step % val_interval == 0 and step != last_val_step:
                    last_val_step = step
                    self.run_validation(state, valid_ds)
                    self._save(state)
        finally:
            for _c in _closers:  # stop prefetch threads, release staged batches
                _c.close()
        if step != last_val_step:  # don't repeat an interval-triggered val/save
            self.run_validation(state, valid_ds)
            self._save(state)
        self.logger.flush()
        return state

    def run_validation(self, state: TrainState, valid_ds, limit_batches=None,
                       sanity: bool = False):
        """Validation losses via a jitted fp32 eval loss (per-shape cache is
        jax.jit's own; collaters bucket-pad, so compiles are bounded by the
        bucket count). Multi-host runs walk the same chunk list on every
        process, each loading its rank's slice (stitched globally); rank 0
        additionally renders the figure/audio extras from its local slice.

        ``limit_batches``/``sanity`` serve the reference's sanity-validation
        run before training (num_sanity_val_steps): a bounded pass that
        catches config/data errors early, skipping extras and TB scalars."""
        hp = self.hp
        rng = jax.random.PRNGKey(42)
        losses_acc: Dict[str, list] = {}
        self._metric_states = {}  # streaming metric accumulators reset per run
        if not hasattr(self, "_jit_eval_loss"):
            self._jit_eval_loss = jax.jit(self.eval_loss_fn)
        n = len(valid_ds)
        n_proc = jax.process_count()
        rank = jax.process_index()
        bs = max(1, hp.get("max_val_batch_size", 1))
        # max_val_batch_frames (reference default 60000): bound the padded
        # frame footprint of a validation batch. The longest-item bound is
        # conservative but deterministic across hosts (sizes are global).
        max_frames = int(hp.get("max_val_batch_frames", 60000) or 0)
        sizes = getattr(valid_ds, "sizes", None)
        if max_frames > 0 and sizes is not None and n > 0:
            bs = max(1, min(bs, max_frames // max(int(np.max(sizes)), 1)))
        if n_proc > 1:
            # per-process slice size must fill the local devices evenly;
            # round DOWN so the frame budget above is not exceeded (floor:
            # one row per local device — below that the budget is physically
            # unenforceable and the floor wins)
            n_local = max(1, self.mesh.devices.size // n_proc)
            bs = max(n_local, (bs // n_local) * n_local)
        bucket_steps = {
            "t_mel": getattr(valid_ds, "frame_bucket", 128),
            "t_txt": getattr(valid_ds, "token_bucket", 16),
            "t_note": getattr(valid_ds, "token_bucket", 16),
        }
        for n_batches, i in enumerate(range(0, n, bs * n_proc)):
            if limit_batches is not None and n_batches >= limit_batches:
                break
            if n_proc > 1:
                # fixed-size chunk: wrap indices so every process has a full
                # slice (duplicated tail items slightly reweight the epoch
                # mean — same tradeoff as the reference's DDP leftover pad)
                chunk = [min(j, n - 1) for j in range(i, i + bs * n_proc)]
                idxs = chunk[rank * bs:(rank + 1) * bs]
                pad_to = valid_ds.pad_targets(chunk, valid_ds.PAD_AXES, bucket_steps)
            else:
                idxs = list(range(i, min(n, i + bs)))
                pad_to = None
            batch = valid_ds.collater([valid_ds[j] for j in idxs], pad_to=pad_to)
            batch.pop("indices", None)
            batch.pop("size", None)
            jb = make_global_batch(self.mesh, batch) if n_proc > 1 else batch
            with self.mesh:
                _, metrics = self._jit_eval_loss(state.params, jb, rng)
            for k, v in metrics.items():
                losses_acc.setdefault(k, []).append(float(v))
            if rank == 0 and not sanity:
                # multi-host: rank 0 renders figures/audio from its local
                # slice (the lowest-index items of each chunk, i.e. the
                # plot-eligible ones); other ranks skip. Matches the
                # reference's every-rank writers in spirit while keeping one
                # writer per run (training_utils.py:334-365).
                if n_proc > 1:
                    # extras run single-process: a jit launched by rank 0
                    # alone on globally-sharded params is illegal (every
                    # process must participate). Params are fully replicated
                    # (P()), so fetch them to host once and let the extras'
                    # jits run on rank 0's local device.
                    if not hasattr(self, "_val_host_params_step") or \
                            self._val_host_params_step != int(state.step):
                        self._val_host_params = jax.device_get(state.params)
                        self._val_host_params_step = int(state.step)
                    extras_state = state.replace(params=self._val_host_params)
                else:
                    extras_state = state
                self.validation_extras(
                    extras_state, valid_ds, {"indices": idxs, **batch}, losses_acc)
        if sanity:
            # sanity pass: losses must be finite; no TB scalars (the run
            # precedes step 0 — Lightning suppresses its sanity logs too)
            bad = {k: v for k, v in losses_acc.items()
                   if not np.isfinite(np.mean(v))}
            if bad:
                raise RuntimeError(f"sanity validation produced non-finite "
                                   f"losses: {sorted(bad)}")
            print("| sanity validation ok: " +
                  " ".join(f"{k}={np.mean(v):.4f}" for k, v in losses_acc.items()))
            return
        step = optimizer_step(state)
        for k, vals in losses_acc.items():
            self.logger.add_scalar(f"validation/{k}", float(np.mean(vals)), step)
        # streaming metric accumulators (validation_extras): log each FINAL
        # value once — the whole-set number, not a mean of per-batch prefixes
        metric_strs = []
        for k, st in getattr(self, "_metric_states", {}).items():
            val = float(st.value())
            self.logger.add_scalar(f"metrics/{k}", val, step)
            metric_strs.append(f"{k}={val:.4f}")
        print(f"| validation @ {step}: " +
              " ".join(f"{k}={np.mean(v):.4f}" for k, v in losses_acc.items()) +
              (("  " + " ".join(metric_strs)) if metric_strs else ""))
        self.logger.flush()
