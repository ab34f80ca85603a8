"""Minimal BaseTask + in-memory dataset for training-runtime tests.

Exercises the generic training loop (B-bucketing, jit-cache bounds, multi-host
batch assembly, checkpointing) without binarization or a real model, keeping
CPU compiles trivial. Used by tests/test_precision_and_multihost.py and
tests/_multihost_worker.py.
"""

from __future__ import annotations

import numpy as np


def _bucket(n: int, step: int) -> int:
    return max(step, ((n + step - 1) // step) * step)


class MiniDataset:
    """Implements the dataset protocol BaseTask.start() consumes."""

    PAD_AXES = {"t_mel": "mel"}
    frame_bucket = 16
    token_bucket = 16

    def __init__(self, lengths):
        self.sizes = np.asarray(lengths)
        self.metadata = {"mel": [int(x) for x in lengths],
                         "lengths": [int(x) for x in lengths]}

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        t = int(self.sizes[i])
        return {
            "_idx": i,
            "x": rng.standard_normal((t, 4)).astype(np.float32),
            "y": rng.standard_normal((t, 4)).astype(np.float32),
        }

    def pad_targets(self, indices, axes, bucket_steps):
        out = {}
        for axis, attr in axes.items():
            if attr not in self.metadata:
                continue
            out[axis] = _bucket(
                max(int(self.metadata[attr][i]) for i in indices), bucket_steps[axis]
            )
        return out

    def collater(self, samples, pad_to=None):
        pad_to = pad_to or {}
        t = max(
            _bucket(max(len(s["x"]) for s in samples), self.frame_bucket),
            pad_to.get("t_mel", 0),
        )

        def pad(key):
            return np.stack(
                [np.pad(s[key], ((0, t - len(s[key])), (0, 0))) for s in samples]
            )

        return {
            "size": len(samples),
            "indices": np.asarray([s["_idx"] for s in samples], np.int64),
            "x": pad("x"),
            "y": pad("y"),
        }


class LinearModel:
    def __init__(self, dtype=None):
        self.dtype = dtype

    def init(self, rng):
        import jax

        return {"w": jax.random.normal(rng, (4, 4), np.float32) * 0.1}


def make_mini_task(hp: dict):
    """A concrete BaseTask over MiniDataset + LinearModel."""
    import jax.numpy as jnp

    from diffsinger_tpu.training.base_task import BaseTask

    class _MiniTask(BaseTask):
        category = "mini"

        def build_model(self, dtype=None):
            return LinearModel(dtype)

        def build_loss_fn(self, model):
            def loss_fn(params, batch, rng):
                w = params["w"]
                if model.dtype is not None:
                    w = w.astype(model.dtype)
                pred = batch["x"].astype(w.dtype) @ w
                loss = jnp.mean(
                    jnp.square(pred.astype(jnp.float32) - batch["y"])
                )
                return loss, {"loss": loss}

            return loss_fn

        def build_datasets(self):
            return (
                MiniDataset(self.hp["train_lengths"]),
                MiniDataset(self.hp["valid_lengths"]),
            )

        def validation_extras(self, state, valid_ds, batch, metrics):
            """Record who renders extras: on multi-host runs only rank 0 may
            call this (base_task rank-0 gating), from its local slice.

            Like the real tasks (acoustic_task.validation_extras), this runs a
            single-process jit over ``state.params`` — on multi-host that is
            only legal because base_task hands extras host-fetched params, so
            this doubles as a regression test for that fetch."""
            import json as _json
            import pathlib as _pathlib

            import jax as _jax
            import jax.numpy as _jnp

            infer = _jax.jit(lambda p, x: x @ p["w"].astype(x.dtype))
            pred = infer(state.params, _jnp.asarray(batch["x"]))
            rec = {"rank": _jax.process_index(),
                   "indices": [int(i) for i in batch["indices"]],
                   "pred_finite": bool(_jnp.isfinite(pred).all())}
            path = _pathlib.Path(self.hp["work_dir"]) / f"extras_rank{rec['rank']}.jsonl"
            with open(path, "a") as f:
                f.write(_json.dumps(rec) + "\n")

    return _MiniTask(hp)


def mini_hparams(work_dir, dict_path, **overrides) -> dict:
    hp = dict(
        work_dir=str(work_dir),
        dictionary=str(dict_path),
        train_lengths=[10, 25, 40, 70, 100, 130, 33, 81],
        valid_lengths=[20, 50],
        optimizer_args=dict(optimizer_cls="torch.optim.AdamW", lr=1e-2,
                            beta1=0.9, beta2=0.98, weight_decay=0.0),
        lr_scheduler_args=dict(scheduler_cls="torch.optim.lr_scheduler.StepLR",
                               step_size=1000, gamma=0.5),
        clip_grad_norm=1,
        max_batch_frames=200,
        max_batch_size=4,
        sampler_frame_count_grid=6,
        log_interval=2,
        val_check_interval=1000,
        num_ckpt_keep=2,
        max_val_batch_size=2,
        seed=0,
    )
    hp.update(overrides)
    return hp


def write_mini_dict(tmp_path):
    p = tmp_path / "mini_dict.txt"
    p.write_text("a\ta\nka\tk a\n")
    return p
