"""Runtime-(depth, steps) sampler tests — the deployment contract.

The reference's exported ONNX accepts continuous ``depth`` and integer
``steps`` at inference time (deployment/modules/diffusion.py:107-160,
rectified_flow.py:37-69) so OpenUTAU can tune them per phrase without
re-export. These tests check our ``inference_dynamic`` cores against numpy
transliterations of those reference modules and against the static samplers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.core import ddpm, reflow
from diffsinger_tpu.core.schedule import DiffusionSchedule

B, T, D = 2, 8, 4
TIMESTEPS = 1000


def toy_eps_np(x, t):
    return 0.3 * x + np.sin(np.asarray(t, dtype=np.float32).reshape(-1, 1, 1) / 100.0)


def toy_eps_jax(x, t):
    return 0.3 * x + jnp.sin(t.astype(jnp.float32).reshape(-1, 1, 1) / 100.0)


def toy_v_np(x, t_scaled):
    return -0.5 * x + np.cos(np.asarray(t_scaled, dtype=np.float64).reshape(-1, 1, 1) / 1000.0)


def toy_v_jax(x, t_scaled):
    return -0.5 * x + jnp.cos(t_scaled.astype(jnp.float32).reshape(-1, 1, 1) / 1000.0)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create("linear", TIMESTEPS, max_beta=0.02)


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(3).standard_normal((B, T, D)).astype(np.float32)


@pytest.fixture(scope="module")
def x_start():
    return np.random.default_rng(11).standard_normal((B, T, D)).astype(np.float32)


# ---------------------------------------------------------------------------
# numpy transliterations of the reference deployment modules
# ---------------------------------------------------------------------------

def ref_ddpm_dynamic_np(sched, noise, depth, steps, k_step, x_start=None):
    """deployment/modules/diffusion.py:107-160 (DDIM branch), numpy."""
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float32)
    timesteps = sched.timesteps
    steps = max(int(steps), 1)
    if x_start is None:
        speedup = max(1, timesteps // steps)
        factors = [i for i in range(1, timesteps + 1) if timesteps % i == 0]
        speedup = [f for f in factors if f <= speedup][-1]
        step_range = list(reversed(range(0, k_step, speedup)))
        x = noise.copy()
    else:
        depth_int = min(int(round(depth * timesteps)), k_step)
        speedup = max(1, depth_int // steps)
        depth_int = depth_int // speedup * speedup
        step_range = list(reversed(range(0, depth_int, speedup)))
        if depth_int >= timesteps:
            x = noise.copy()
        elif depth_int > 0:
            t = depth_int - 1
            x = (
                sched.sqrt_alphas_cumprod[t] * x_start
                + sched.sqrt_one_minus_alphas_cumprod[t] * noise
            )
        else:
            x = x_start.copy()
    for t in step_range:
        a_t = acp[t]
        t_prev = t - speedup
        a_prev = acp[max(t_prev, 0) if t_prev > 0 else 0]
        eps = toy_eps_np(x, np.full((B,), t))
        x = np.sqrt(a_prev) * (
            x / np.sqrt(a_t)
            + (np.sqrt((1 - a_prev) / a_prev) - np.sqrt((1 - a_t) / a_t)) * eps
        )
    return x


def ref_reflow_dynamic_np(noise, depth, steps, t_start_min, tsf, x_end=None):
    """deployment/modules/rectified_flow.py:37-69, numpy."""
    if x_end is None:
        t_start = 0.0
        x = noise.astype(np.float64)
    else:
        t_start = max(1.0 - depth, t_start_min)
        if t_start <= 0.0:
            x = noise.astype(np.float64)
        elif t_start >= 1.0:
            x = x_end.astype(np.float64)
        else:
            x = (t_start * x_end + (1.0 - t_start) * noise).astype(np.float64)
    steps = max(int(steps), 1)
    dt = (1.0 - t_start) / steps
    for i in range(steps):
        t = np.full((B,), t_start + i * dt)
        x = x + toy_v_np(x, tsf * t) * dt
    return x


# ---------------------------------------------------------------------------
# DDPM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("steps,k_step", [(10, 1000), (27, 1000), (50, 400), (1000, 1000)])
def test_ddpm_dynamic_from_noise_matches_reference(sched, noise, steps, k_step):
    ours = np.asarray(ddpm.inference_dynamic(
        toy_eps_jax, sched, jnp.asarray(noise),
        depth=jnp.float32(1.0), steps=jnp.int32(steps), k_step=k_step,
    ))
    golden = ref_ddpm_dynamic_np(sched, noise, 1.0, steps, k_step)
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("depth,steps", [(1.0, 20), (0.6, 20), (0.2, 20), (0.35, 7), (0.0, 10)])
def test_ddpm_dynamic_shallow_matches_reference(sched, noise, x_start, depth, steps):
    ours = np.asarray(ddpm.inference_dynamic(
        toy_eps_jax, sched, jnp.asarray(noise),
        depth=jnp.float32(depth), steps=jnp.int32(steps), k_step=1000,
        x_start=jnp.asarray(x_start),
    ))
    golden = ref_ddpm_dynamic_np(sched, noise, depth, steps, 1000, x_start=x_start)
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=2e-4)


def test_ddpm_dynamic_matches_static_ddim(sched, noise):
    """steps=100 → speedup 10: must equal the static scan sampler exactly."""
    ours = np.asarray(ddpm.inference_dynamic(
        toy_eps_jax, sched, jnp.asarray(noise),
        depth=jnp.float32(1.0), steps=jnp.int32(100), k_step=1000,
    ))
    static = np.asarray(ddpm.sample_ddim(toy_eps_jax, sched, jnp.asarray(noise), 1000, 10))
    np.testing.assert_allclose(ours, static, rtol=1e-5, atol=1e-6)


def test_ddpm_dynamic_depth_zero_returns_x_start(sched, noise, x_start):
    out = np.asarray(ddpm.inference_dynamic(
        toy_eps_jax, sched, jnp.asarray(noise),
        depth=jnp.float32(0.0), steps=jnp.int32(10), k_step=1000,
        x_start=jnp.asarray(x_start),
    ))
    np.testing.assert_allclose(out, x_start, rtol=1e-6)


def test_ddpm_dynamic_one_compile_many_depths(sched, noise, x_start):
    """depth/steps are runtime tensors: one jit signature serves all values."""
    calls = {"n": 0}

    def counting_eps(x, t):
        calls["n"] += 1  # trace-time only
        return toy_eps_jax(x, t)

    fn = jax.jit(lambda d, s: ddpm.inference_dynamic(
        counting_eps, sched, jnp.asarray(noise),
        depth=d, steps=s, k_step=1000, x_start=jnp.asarray(x_start),
    ))
    outs = [np.asarray(fn(jnp.float32(d), jnp.int32(s)))
            for d, s in [(0.2, 5), (0.6, 20), (1.0, 50)]]
    assert calls["n"] == 1
    for (d, s), out in zip([(0.2, 5), (0.6, 20), (1.0, 50)], outs):
        golden = ref_ddpm_dynamic_np(sched, noise, d, s, 1000, x_start=x_start)
        np.testing.assert_allclose(out, golden, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Rectified flow
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("depth,steps", [(1.0, 10), (0.7, 10), (0.3, 4), (0.0, 8)])
def test_reflow_dynamic_shallow_matches_reference(noise, x_start, depth, steps):
    ours = np.asarray(reflow.inference_dynamic(
        toy_v_jax, jnp.asarray(noise),
        depth=jnp.float32(depth), steps=jnp.int32(steps),
        t_start_min=0.0, time_scale_factor=1000.0, x_end=jnp.asarray(x_start),
    ))
    golden = ref_reflow_dynamic_np(noise, depth, steps, 0.0, 1000.0, x_end=x_start)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_reflow_dynamic_depth_zero_is_exact_passthrough(noise, x_start):
    """depth<=0 must return x_end bitwise (and skip the Euler loop entirely —
    the exported Loop's trip count is clamped to zero, not run with dt=0)."""
    out = np.asarray(reflow.inference_dynamic(
        toy_v_jax, jnp.asarray(noise),
        depth=jnp.float32(0.0), steps=jnp.int32(16),
        t_start_min=0.0, time_scale_factor=1000.0, x_end=jnp.asarray(x_start),
    ))
    np.testing.assert_array_equal(out, x_start.astype(out.dtype))


def test_reflow_dynamic_honors_t_start_min(noise, x_start):
    """depth beyond 1 - t_start_min clamps to the trained shallow boundary."""
    ours = np.asarray(reflow.inference_dynamic(
        toy_v_jax, jnp.asarray(noise),
        depth=jnp.float32(0.9), steps=jnp.int32(6),
        t_start_min=0.4, time_scale_factor=1000.0, x_end=jnp.asarray(x_start),
    ))
    golden = ref_reflow_dynamic_np(noise, 0.9, 6, 0.4, 1000.0, x_end=x_start)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_reflow_dynamic_from_noise_matches_static_euler(noise):
    ours = np.asarray(reflow.inference_dynamic(
        toy_v_jax, jnp.asarray(noise),
        depth=jnp.float32(1.0), steps=jnp.int32(8),
        t_start_min=0.0, time_scale_factor=1000.0,
    ))
    static = np.asarray(reflow.sample_ode(
        toy_v_jax, jnp.asarray(noise), t_start=0.0, steps=8,
        algorithm="euler", time_scale_factor=1000.0,
    ))
    np.testing.assert_allclose(ours, static, rtol=1e-5, atol=1e-6)
