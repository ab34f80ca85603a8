"""Train state + optimizer construction from the reference's config keys
(``optimizer_args``/``lr_scheduler_args``, configs/base.yaml:38-48).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diffsinger_tpu.training.schedules import build_lr_schedule


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _scale_by_rss_torch(initial_accumulator_value: float, eps: float):
    """torch.optim.Adagrad's accumulator scaling: g / (sqrt(sum g²) + eps),
    eps OUTSIDE the sqrt (optax.scale_by_rss puts it inside)."""

    def init(params):
        return jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)

    def update(updates, state, params=None):
        del params
        sum_sq = jax.tree.map(lambda s, g: s + g * g, state, updates)
        scaled = jax.tree.map(
            lambda g, s: g / (jnp.sqrt(s) + eps), updates, sum_sq)
        return scaled, sum_sq

    return optax.GradientTransformation(init, update)


def build_optimizer(hp: dict):
    """AdamW (+ grad clip + accumulation) with the configured LR schedule.

    Maps the reference's torch class names (utils/__init__.py:266-314) onto
    optax; the schedule is a pure fn of step so resume-time re-simulation
    (basics/base_task.py:500-514) is implicit.
    """
    opt_args = hp["optimizer_args"]
    schedule = build_lr_schedule(
        hp["lr_scheduler_args"], base_lr=opt_args["lr"], hidden_size=hp.get("hidden_size", 256)
    )
    cls = opt_args.get("optimizer_cls", "torch.optim.AdamW").rsplit(".", 1)[-1]
    wd = opt_args.get("weight_decay", 0.0)
    # loudly reject torch args whose omission would silently change the
    # update trajectory (the reference tolerates unknown keys because torch
    # consumes them; here an unmapped semantic arg means a DIFFERENT
    # optimizer). Harmless unknown keys still pass through, reference-style.
    _unmappable = {
        "SGD": [("dampening", 0.0)],
        "Adam": [("amsgrad", False)],
        "AdamW": [("amsgrad", False)],
        "Adagrad": [("lr_decay", 0.0)],
    }
    for key, neutral in _unmappable.get(cls, []):
        if opt_args.get(key, neutral) != neutral:
            raise NotImplementedError(
                f"{cls}: optimizer arg {key}={opt_args[key]!r} has no optax "
                f"mapping here — remove it or use its neutral value {neutral!r}")
    if cls == "SGD" and opt_args.get("nesterov", False) \
            and not opt_args.get("momentum", 0.0):
        raise ValueError("SGD: nesterov requires a momentum (torch raises too)")
    adam_common = dict(
        learning_rate=schedule,
        b1=opt_args.get("beta1", 0.9),
        b2=opt_args.get("beta2", 0.98),
        eps=opt_args.get("eps", 1e-8),
    )
    # torch-coupled weight decay (SGD/RMSprop/Adagrad add wd*p to the GRAD,
    # before momentum/accumulators — unlike AdamW's decoupled decay)
    coupled_wd = [optax.add_decayed_weights(wd)] if wd else []
    if cls == "AdamW":
        tx = optax.adamw(weight_decay=wd, **adam_common)
    elif cls == "Adam":
        # torch.optim.Adam's weight_decay is COUPLED (adds wd*p to the grad
        # before the moment updates), unlike AdamW's decoupled decay
        tx = optax.chain(*coupled_wd, optax.adam(**adam_common))
    elif cls == "SGD":
        tx = optax.chain(*coupled_wd, optax.sgd(
            learning_rate=schedule,
            momentum=opt_args.get("momentum", 0.0) or None,
            nesterov=opt_args.get("nesterov", False),
        ))
    elif cls == "RMSprop":
        tx = optax.chain(*coupled_wd, optax.rmsprop(
            learning_rate=schedule,
            decay=opt_args.get("alpha", 0.99),
            eps=opt_args.get("eps", 1e-8),
            eps_in_sqrt=False,  # torch adds eps OUTSIDE the sqrt
            momentum=opt_args.get("momentum", 0.0) or None,
            centered=opt_args.get("centered", False),
        ))
    elif cls == "Adagrad":
        # hand-rolled: optax.adagrad puts eps INSIDE the sqrt
        # (rsqrt(sum_sq + eps)) while torch computes g / (sqrt(sum_sq) + eps)
        # — a ~10x update difference while the accumulator is ≲ eps
        tx = optax.chain(
            *coupled_wd,
            _scale_by_rss_torch(
                opt_args.get("initial_accumulator_value", 0.0),
                opt_args.get("eps", 1e-10)),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise NotImplementedError(f"Unsupported optimizer: {cls}")
    chain = []
    clip = hp.get("clip_grad_norm", 0)
    if clip:
        chain.append(optax.clip_by_global_norm(float(clip)))
    chain.append(tx)
    tx = optax.chain(*chain)
    accum = hp.get("accumulate_grad_batches", 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def sync_gradient_step(opt_state, step: int):
    """Return ``opt_state`` with every nested MultiStepsState's applied-update
    counter AND every LR-schedule counter (ScaleByScheduleState.count) set to
    ``step`` — through multi_transform/masked/chain wrappers (param freezing
    nests MultiSteps inside MultiTransformState). Used on resume so the
    counters match the checkpoint's global step even when the optimizer state
    itself could not be restored (allow_optimizer_state_reset: moments
    legitimately restart at zero — so ScaleByAdamState.count, which drives
    bias correction, is deliberately NOT touched — but the schedule must
    continue from the global step, not replay its warmup)."""

    def rec(o):
        if isinstance(o, optax.MultiStepsState):
            # recurse first: the INNER opt state holds the schedule counters
            o = type(o)(*(rec(v) for v in o))
            return o._replace(gradient_step=jnp.asarray(step, jnp.int32))
        if isinstance(o, optax.ScaleByScheduleState):
            return o._replace(count=jnp.asarray(step, jnp.int32))
        if isinstance(o, tuple) and hasattr(o, "_fields"):  # NamedTuple state
            return type(o)(*(rec(v) for v in o))
        if isinstance(o, tuple):
            return tuple(rec(v) for v in o)
        if isinstance(o, list):
            return [rec(v) for v in o]
        if isinstance(o, dict):  # multi_transform inner_states
            return {k: rec(v) for k, v in o.items()}
        return o

    return rec(opt_state)


def optimizer_step(state: TrainState) -> int:
    """The number of OPTIMIZER updates applied, reference-`global_step`
    semantics: with gradient accumulation (optax.MultiSteps), micro-batches
    don't count — only applied updates do (Lightning counts the same way,
    basics/base_task.py val_check_interval is in optimizer steps)."""
    def find_multi_steps(opt):
        if isinstance(opt, optax.MultiStepsState):
            return opt
        # param freezing wraps the optimizer in multi_transform; the
        # MultiSteps state then lives under inner_states['train']
        inner = getattr(opt, "inner_states", None)
        if isinstance(inner, dict):
            for v in inner.values():
                found = find_multi_steps(getattr(v, "inner_state", v))
                if found is not None:
                    return found
        return None

    ms = find_multi_steps(state.opt_state)
    if ms is not None:
        return int(jax.device_get(ms.gradient_step))
    return int(jax.device_get(state.step))


def make_train_step(loss_fn, tx):
    """Generic SPMD train step: grads -> update -> new state.

    ``loss_fn(params, batch, rng) -> (loss, metrics)``. Under a Mesh with the
    batch sharded on 'data' and params replicated, XLA inserts the gradient
    all-reduce over ICI automatically (no explicit collectives needed).
    """

    def train_step(state: TrainState, batch, rng: jax.Array):
        # float16 leaves are a WIRE format (train_wire_dtype, base_task.py):
        # restore float32 on device before any arithmetic so loss math never
        # runs in f16
        batch = jax.tree.map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.float16 else x, batch)
        rng = jax.random.fold_in(rng, state.step)

        def wrapped(params):
            return loss_fn(params, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step
