"""Rectified-flow training targets and ODE samplers (euler/rk2/rk4/rk5).

Parity with reference modules/core/reflow.py. ``velocity_fn(x, t_scaled) -> v``
operates on flat [B, T, D] tensors; ``t_scaled`` is float [B] (already
multiplied by ``time_scale_factor`` as the backbones expect).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

VelocityFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def p_losses_inputs(x_end: jnp.ndarray, t: jnp.ndarray, rng: jax.Array):
    """Interpolated state and target velocity (reflow.py:36-41).

    :param x_end: [B, T, D] normalized data
    :param t: [B] float in [t_start, 1]
    :return: (x_t, v_gt = x_end - x_start)
    """
    x_start = jax.random.normal(rng, x_end.shape, dtype=x_end.dtype)
    x_t = x_start + t[:, None, None] * (x_end - x_start)
    return x_t, x_end - x_start


def _step_euler(velocity_fn, x, t, dt, tsf):
    return x + velocity_fn(x, tsf * t) * dt


def _step_rk2(velocity_fn, x, t, dt, tsf):
    k1 = velocity_fn(x, tsf * t)
    k2 = velocity_fn(x + 0.5 * k1 * dt, tsf * (t + 0.5 * dt))
    return x + k2 * dt


def _step_rk4(velocity_fn, x, t, dt, tsf):
    k1 = velocity_fn(x, tsf * t)
    k2 = velocity_fn(x + 0.5 * k1 * dt, tsf * (t + 0.5 * dt))
    k3 = velocity_fn(x + 0.5 * k2 * dt, tsf * (t + 0.5 * dt))
    k4 = velocity_fn(x + k3 * dt, tsf * (t + dt))
    return x + (k1 + 2 * k2 + 2 * k3 + k4) * dt / 6


def _step_rk5(velocity_fn, x, t, dt, tsf):
    k1 = velocity_fn(x, tsf * t)
    k2 = velocity_fn(x + 0.25 * k1 * dt, tsf * (t + 0.25 * dt))
    k3 = velocity_fn(x + 0.125 * (k2 + k1) * dt, tsf * (t + 0.25 * dt))
    k4 = velocity_fn(x + 0.5 * (-k2 + 2 * k3) * dt, tsf * (t + 0.5 * dt))
    k5 = velocity_fn(x + 0.0625 * (3 * k1 + 9 * k4) * dt, tsf * (t + 0.75 * dt))
    k6 = velocity_fn(
        x + (-3 * k1 + 2 * k2 + 12 * k3 - 12 * k4 + 8 * k5) * dt / 7, tsf * (t + dt)
    )
    return x + (7 * k1 + 32 * k3 + 12 * k4 + 32 * k5 + 7 * k6) * dt / 90


_STEPS = {"euler": _step_euler, "rk2": _step_rk2, "rk4": _step_rk4, "rk5": _step_rk5}


def sample_ode(
    velocity_fn: VelocityFn,
    x: jnp.ndarray,
    *,
    t_start: float,
    steps: int,
    algorithm: str = "euler",
    time_scale_factor: float = 1000.0,
) -> jnp.ndarray:
    """Integrate from t_start to 1 with a fixed-step scheme (reflow.py:104-138)."""
    step_fn = _STEPS.get(algorithm)
    if step_fn is None:
        raise ValueError(f"Unsupported algorithm for Rectified Flow: {algorithm}.")
    b = x.shape[0]
    dt = (1.0 - t_start) / max(1, steps)

    def body(x, i):
        t = jnp.full((b,), t_start + i * dt, dtype=jnp.float32)
        return step_fn(velocity_fn, x, t, dt, time_scale_factor), None

    x, _ = jax.lax.scan(body, x, jnp.arange(steps, dtype=jnp.float32))
    return x


def inference_dynamic(
    velocity_fn: VelocityFn,
    noise: jnp.ndarray,
    *,
    depth: jnp.ndarray,
    steps: jnp.ndarray,
    t_start_min: float,
    time_scale_factor: float,
    x_end: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Deployment-contract sampler: ``depth`` (f32 scalar) and ``steps``
    (i32 scalar) are *runtime* values, so exported graphs accept OpenUTAU's
    per-phrase depth/steps without re-export (reference
    deployment/modules/rectified_flow.py:37-69). Euler integration only —
    matching the reference's deployed ONNX, which hardcodes sample_euler.

    The dynamic trip count lowers to ``lax.while_loop`` (ONNX ``Loop`` with a
    live condition; StableHLO ``while``).
    """
    if x_end is None:
        t_start = jnp.float32(0.0)
        x = noise
    else:
        t_start = jnp.maximum(1.0 - jnp.asarray(depth, jnp.float32),
                              jnp.float32(t_start_min))
        x = jnp.where(
            t_start <= 0.0, noise,
            jnp.where(t_start >= 1.0, x_end,
                      t_start * x_end + (1.0 - t_start) * noise),
        )
    steps = jnp.maximum(jnp.asarray(steps, jnp.int32), 1)
    # depth<=0 (t_start>=1) is a pure x_end passthrough: skip the loop
    # entirely instead of integrating `steps` zero-length Euler steps
    # (parity with the static path's early return)
    steps = jnp.where(t_start >= 1.0, jnp.int32(0), steps)
    dt = (1.0 - t_start) / jnp.maximum(steps, 1).astype(jnp.float32)
    b = noise.shape[0]

    def cond_fn(carry):
        return carry[0] < steps

    def body_fn(carry):
        i, x = carry
        t = jnp.full((b,), t_start + i.astype(jnp.float32) * dt, jnp.float32)
        return i + 1, x + velocity_fn(x, time_scale_factor * t) * dt

    _, x = jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), x))
    return x


def inference(
    velocity_fn: VelocityFn,
    shape_like: jnp.ndarray,
    *,
    t_start: float,
    steps: int,
    algorithm: str,
    time_scale_factor: float,
    rng: jax.Array,
    x_end: jnp.ndarray | None = None,
    use_shallow_diffusion: bool = False,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full rectified-flow inference driver (reflow.py:104-138): start from noise
    or from the shallow source blended with noise at t_start.

    ``noise`` overrides the PRNG draw — the externally-injected-noise regression
    mode for cross-implementation mel comparison (SURVEY.md §7.2#4)."""
    if noise is None:
        noise = jax.random.normal(rng, shape_like.shape, dtype=jnp.float32)
    if use_shallow_diffusion and t_start > 0:
        assert x_end is not None, "Missing shallow diffusion source."
        if t_start >= 1.0:
            return x_end
        x = t_start * x_end + (1 - t_start) * noise
    else:
        t_start = 0.0
        x = noise
    return sample_ode(
        velocity_fn,
        x,
        t_start=t_start,
        steps=steps,
        algorithm=algorithm,
        time_scale_factor=time_scale_factor,
    )
