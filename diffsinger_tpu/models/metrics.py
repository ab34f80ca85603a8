"""Validation metrics (reference modules/metrics/{duration,curve}.py).

Implemented as accumulator dataclasses whose ``update`` is a pure JAX function
returning new state — the sums are psum-reducible across a data-parallel mesh
exactly like torchmetrics' ``dist_reduce_fx='sum'``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from diffsinger_tpu.utils.seq import rhythm_regulator


def _word_sum(values: jnp.ndarray, ph2word: jnp.ndarray) -> jnp.ndarray:
    """Aggregate phoneme-level values per word: [B, T_ph] -> [B, T_ph(=T_w cap)]."""
    b, t = ph2word.shape
    out = jnp.zeros((b, t + 1), values.dtype)
    out = out.at[jnp.arange(b)[:, None], ph2word].add(values)
    return out[:, 1:]


@dataclasses.dataclass
class MetricState:
    """Pair-of-sums accumulator (numerator/denominator)."""

    num: float = 0.0
    den: float = 0.0

    def value(self) -> float:
        return self.num / max(self.den, 1e-9)


class RhythmCorrectness:
    """Fraction of words whose predicted duration is within tolerance
    (duration.py:23-64)."""

    def __init__(self, tolerance: float = 0.05):
        assert 0.0 < tolerance < 1.0
        self.tolerance = tolerance

    def update(self, state: MetricState, pdur_pred, pdur_target, ph2word, mask=None) -> MetricState:
        wdur_pred = _word_sum(pdur_pred.astype(jnp.float32), ph2word)
        wdur_target = _word_sum(pdur_target.astype(jnp.float32), ph2word)
        if mask is None:
            wdur_mask = _word_sum(jnp.ones_like(pdur_pred, jnp.float32), ph2word) > 0
        else:
            wdur_mask = _word_sum(mask.astype(jnp.float32), ph2word) > 0
        correct = (jnp.abs(wdur_pred - wdur_target) <= wdur_target * self.tolerance) & wdur_mask
        return MetricState(state.num + float(correct.sum()), state.den + float(wdur_mask.sum()))


class PhonemeDurationAccuracy:
    """Fraction of phonemes accurate after rhythm regulation (duration.py:67-103)."""

    def __init__(self, tolerance: float = 0.2):
        self.tolerance = tolerance

    def update(self, state: MetricState, pdur_pred, pdur_target, ph2word, mask=None) -> MetricState:
        wdur_target = _word_sum(pdur_target.astype(jnp.float32), ph2word)
        pdur_align = rhythm_regulator(pdur_pred, ph2word, wdur_target).astype(jnp.float32)
        accurate = jnp.abs(pdur_align - pdur_target) <= pdur_target * self.tolerance
        if mask is not None:
            accurate = accurate & mask
            total = float(mask.sum())
        else:
            total = float(pdur_pred.size)
        return MetricState(state.num + float(accurate.sum()), state.den + total)


class RawCurveAccuracy:
    """Fraction of frames within tolerance (curve.py:6-34)."""

    def __init__(self, tolerance: float = 0.5):
        self.tolerance = tolerance

    def update(self, state: MetricState, pred, target, mask=None) -> MetricState:
        close = jnp.abs(pred - target) <= self.tolerance
        if mask is not None:
            close = close & mask
            total = float(mask.sum())
        else:
            total = float(pred.size)
        return MetricState(state.num + float(close.sum()), state.den + total)


@dataclasses.dataclass
class R2State:
    sum_squared_error: float = 0.0
    sum_error: float = 0.0
    residual: float = 0.0
    total: float = 0.0

    def value(self) -> float:
        denom = self.sum_squared_error - self.sum_error ** 2 / max(self.total, 1e-9)
        return 1.0 - self.residual / max(denom, 1e-9)


class RawCurveR2Score:
    """Streaming R^2 over masked curves (curve.py:37-75)."""

    def update(self, state: R2State, pred, target, mask=None) -> R2State:
        pred = pred.reshape(-1)
        target = target.reshape(-1)
        if mask is not None:
            m = mask.reshape(-1).astype(pred.dtype)
            pred = pred * m
            target = target * m
            total = float(m.sum())
        else:
            total = float(target.size)
        residual = target - pred
        return R2State(
            state.sum_squared_error + float(jnp.sum(target * target)),
            state.sum_error + float(jnp.sum(target)),
            state.residual + float(jnp.sum(residual * residual)),
            state.total + total,
        )
