"""Spec normalization / repeat-bin transforms for the generative cores.

Parity with reference modules/core/ddpm.py:379-505 (and the identical reflow
variants): plain (min,max) -> [-1,1] normalization for mel, and the
"repetitive" trick for scalar curves (pitch/variances): a [B, T] curve is
clamped, repeated over R bins, normalized; denormalization averages the bins.

All transforms expose flat [B, T, F*R] tensors at the sampler boundary — the
layout the channel-last backbones consume directly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class SpecTransform:
    """Mel-style [B, T, M] (num_feats=1) or [B, F, T, M] normalization."""

    def __init__(self, spec_min: Sequence[float], spec_max: Sequence[float], out_dims: int, num_feats: int = 1):
        smin = np.asarray(spec_min, dtype=np.float32)
        smax = np.asarray(spec_max, dtype=np.float32)
        if num_feats == 1:
            smin = smin.reshape(-1)[:out_dims][None, None, :]  # [1, 1, M]
            smax = smax.reshape(-1)[:out_dims][None, None, :]
        else:
            smin = smin.reshape(num_feats, -1)[:, :out_dims][None, :, None, :]  # [1, F, 1, M]
            smax = smax.reshape(num_feats, -1)[:, :out_dims][None, :, None, :]
        self.spec_min = smin
        self.spec_max = smax
        self.out_dims = out_dims
        self.num_feats = num_feats

    def norm(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.spec_min) / (self.spec_max - self.spec_min) * 2 - 1

    def denorm(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x + 1) / 2 * (self.spec_max - self.spec_min) + self.spec_min

    # --- flat [B, T, F*M] <-> structured ---
    def flatten(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_feats == 1:
            return x
        b, f, t, m = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, f * m)

    def unflatten(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_feats == 1:
            return x
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_feats, self.out_dims).transpose(0, 2, 1, 3)


class RepetitiveTransform(SpecTransform):
    """Scalar curve(s) <-> repeat-bin spec (ddpm.py:386-421)."""

    def __init__(self, vmin, vmax, repeat_bins: int):
        num_feats = 1 if isinstance(vmin, (int, float)) else len(vmin)
        smin = [vmin] if num_feats == 1 else [[v] for v in vmin]
        smax = [vmax] if num_feats == 1 else [[v] for v in vmax]
        super().__init__(smin, smax, out_dims=repeat_bins, num_feats=num_feats)
        self.repeat_bins = repeat_bins

    def norm(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] or [B, F, T] -> [B, T, R] or [B, F, T, R]."""
        x = jnp.repeat(x[..., None], self.repeat_bins, axis=-1)
        return super().norm(x)

    def denorm(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, R] or [B, F, T, R] -> [B, T] or [B, F, T]."""
        return super().denorm(x).mean(axis=-1)


class PitchTransform(RepetitiveTransform):
    """Pitch-delta transform with clipping (ddpm.py:424-445)."""

    def __init__(self, vmin: float, vmax: float, cmin: float, cmax: float, repeat_bins: int):
        super().__init__(vmin, vmax, repeat_bins)
        self.cmin = cmin
        self.cmax = cmax

    def norm(self, x: jnp.ndarray) -> jnp.ndarray:
        return super().norm(jnp.clip(x, self.cmin, self.cmax))

    def denorm(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(super().denorm(x), self.cmin, self.cmax)


class MultiVarianceTransform(RepetitiveTransform):
    """Stacked variance curves with per-feature clamps (ddpm.py:448-505).

    norm: sequence of [B, T] -> [B, T, R] (F=1) or [B, F, T, R]
    denorm: back to a list of [B, T].
    """

    def __init__(
        self,
        ranges: List[Tuple[float, float]],
        clamps: List[Optional[Tuple[Optional[float], Optional[float]]]],
        repeat_bins: int,
    ):
        assert len(ranges) == len(clamps)
        self.clamps = clamps
        vmin = [r[0] for r in ranges]
        vmax = [r[1] for r in ranges]
        if len(vmin) == 1:
            vmin, vmax = vmin[0], vmax[0]
        super().__init__(vmin, vmax, repeat_bins)

    def clamp(self, xs) -> list:
        out = []
        for x, c in zip(xs, self.clamps):
            out.append(x if c is None else jnp.clip(x, c[0], c[1]))
        return out

    def norm(self, xs) -> jnp.ndarray:
        assert len(xs) == self.num_feats
        stacked = jnp.stack(self.clamp(xs), axis=1)  # [B, F, T]
        if self.num_feats == 1:
            stacked = stacked[:, 0]
        return super().norm(stacked)

    def denorm(self, x: jnp.ndarray) -> list:
        out = super().denorm(x)
        xs = [out] if self.num_feats == 1 else [out[:, i] for i in range(self.num_feats)]
        return self.clamp(xs)
