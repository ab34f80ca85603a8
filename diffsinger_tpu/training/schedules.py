"""LR schedules as optax-compatible step->lr functions.

Semantics match the torch schedulers the reference configs name
(utils/training_utils.py:23-69 and torch.optim.lr_scheduler.*); since optax
schedules are pure functions of the step, "resume re-simulation"
(basics/base_task.py:500-514) is free — the schedule always evaluates from the
global step.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

Schedule = Callable[[int], float]


def StepLR(lr: float, step_size: int, gamma: float = 0.1, **_) -> Schedule:
    def fn(step):
        return lr * (gamma ** (step // step_size))

    return fn


def ExponentialLR(lr: float, gamma: float, **_) -> Schedule:
    def fn(step):
        return lr * (gamma ** step)

    return fn


def ConstantLR(lr: float, factor: float = 1.0 / 3, total_iters: int = 5, **_) -> Schedule:
    def fn(step):
        return lr * (factor if step < total_iters else 1.0)

    return fn


def LinearLR(lr: float, start_factor: float = 1.0 / 3, end_factor: float = 1.0,
             total_iters: int = 5, **_) -> Schedule:
    def fn(step):
        if step >= total_iters:
            return lr * end_factor
        return lr * (start_factor + (end_factor - start_factor) * step / total_iters)

    return fn


def MultiStepLR(lr: float, milestones: Sequence[int], gamma: float = 0.1, **_) -> Schedule:
    ms = sorted(milestones)

    def fn(step):
        passed = sum(1 for m in ms if step >= m)
        return lr * (gamma ** passed)

    return fn


def CosineAnnealingLR(lr: float, T_max: int, eta_min: float = 0.0, **_) -> Schedule:
    def fn(step):
        return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * step / T_max)) / 2

    return fn


def ChainedScheduler(schedulers: Sequence[Schedule], **_) -> Schedule:
    """torch ChainedScheduler semantics for chainable (multiplicative-factor)
    schedulers: the factors compose. Sub-schedules must be built with lr=1 so
    they return pure factors (build_lr_schedule does this); the chain then
    scales the product by the base lr it was built with."""

    def fn(step):
        f = 1.0
        for s in schedulers:
            f *= s(step)
        return f

    return fn


def RSQRTSchedule(lr: float, warmup_updates: int, hidden_size: int, **_) -> Schedule:
    """Reference RSQRTSchedule (training_utils.py:23-46)."""

    def fn(step):
        warmup = min(step / warmup_updates, 1.0)
        rsqrt_decay = max(warmup_updates, step) ** -0.5
        rsqrt_hidden = hidden_size ** -0.5
        return max(lr * warmup * rsqrt_decay * rsqrt_hidden, 1e-7)

    return fn


def WarmupCosineSchedule(lr: float, warmup_steps: int, t_total: int, eta_min: float = 0.0,
                         cycles: float = 0.5, **_) -> Schedule:
    """Reference WarmupCosineSchedule (training_utils.py:49-70)."""

    def fn(step):
        if step < warmup_steps:
            return lr * step / max(1.0, warmup_steps)
        progress = (step - warmup_steps) / max(1, t_total - warmup_steps)
        return lr * max(eta_min, 0.5 * (1.0 + math.cos(math.pi * cycles * 2.0 * progress)))

    return fn


def SequentialLR(schedulers: Sequence[Schedule], milestones: Sequence[int], **_) -> Schedule:
    """torch SequentialLR semantics: switch schedules at milestones, each
    schedule sees a step counter restarted at its milestone."""

    def fn(step):
        idx = 0
        offset = 0
        for i, m in enumerate(milestones):
            if step >= m:
                idx = i + 1
                offset = m
        return schedulers[idx](step - offset)

    return fn


_SCHEDULES = {
    "StepLR": StepLR,
    "ExponentialLR": ExponentialLR,
    "ConstantLR": ConstantLR,
    "LinearLR": LinearLR,
    "MultiStepLR": MultiStepLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "RSQRTSchedule": RSQRTSchedule,
    "WarmupCosineSchedule": WarmupCosineSchedule,
    "SequentialLR": SequentialLR,
    "ChainedScheduler": ChainedScheduler,
}


def _resolve_name(cls_str: str) -> str:
    return cls_str.rsplit(".", 1)[-1]


def build_lr_schedule(scheduler_args: dict, *, base_lr: float, hidden_size: int = 256) -> Schedule:
    """Build a schedule from the reference's ``lr_scheduler_args`` config
    (utils/__init__.py:278-314), including nested SequentialLR."""

    def helper(args: dict, lr: float) -> Schedule:
        # configs/base.yaml default; a user override of just step_size/gamma
        # (without re-stating the class) keeps StepLR
        cls_str = args.get("scheduler_cls") or args.get("cls") or "StepLR"
        name = _resolve_name(cls_str)
        if name == "SequentialLR":
            # each stage sees the composite's own lr (torch binds them all
            # to the same optimizer base lr)
            subs = [helper(s, lr) for s in args["schedulers"]]
            return SequentialLR(subs, args["milestones"])
        if name == "ChainedScheduler":
            # sub-schedules built at lr=1 so they return pure factors —
            # including nested composites (building them at the outer lr
            # would scale by it twice); the chain then applies its own lr.
            subs = [helper(s, 1.0) for s in args["schedulers"]]
            chained = ChainedScheduler(subs)
            if lr == 1.0:
                return chained
            return lambda step: lr * chained(step)
        builder = _SCHEDULES.get(name)
        if builder is None:
            raise NotImplementedError(f"Unsupported scheduler: {name}")
        kwargs = {k: v for k, v in args.items() if k not in ("scheduler_cls", "cls")}
        kwargs.setdefault("lr", lr)
        kwargs.setdefault("hidden_size", hidden_size)
        return builder(**kwargs)

    return helper(dict(scheduler_args), base_lr)
