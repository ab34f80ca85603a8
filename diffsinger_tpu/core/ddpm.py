"""DDPM training targets and samplers as pure `lax.scan` programs.

Parity with reference modules/core/ddpm.py: q_sample / epsilon-prediction loss,
and the DDPM / DDIM / PLMS(PNDM) samplers. The step count is static per jit so
every sampler compiles into a single fused scan over the denoiser.

``denoise_fn(x, t) -> eps`` operates on flat [B, T, D] tensors with an int32
``t`` of shape [B] (the caller binds condition and params).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def q_sample(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
    """Forward-process sample x_t (ddpm.py:206-210). t: [B] int."""
    c1 = jnp.asarray(sched.sqrt_alphas_cumprod)[t][:, None, None]
    c2 = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)[t][:, None, None]
    return c1 * x_start + c2 * noise


def p_losses_inputs(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, rng: jax.Array):
    """Noise + noisy input for the epsilon-prediction loss (ddpm.py:212-219)."""
    noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
    return q_sample(sched, x_start, t, noise), noise


def predict_start_from_noise(sched: DiffusionSchedule, x_t, t, noise):
    c1 = jnp.asarray(sched.sqrt_recip_alphas_cumprod)[t][:, None, None]
    c2 = jnp.asarray(sched.sqrt_recipm1_alphas_cumprod)[t][:, None, None]
    return c1 * x_t - c2 * noise


def sample_ddpm(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t_max: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Ancestral sampling from t_max-1 down to 0 (ddpm.py:149-156)."""
    b = x.shape[0]
    c1 = jnp.asarray(sched.posterior_mean_coef1)
    c2 = jnp.asarray(sched.posterior_mean_coef2)
    log_var = jnp.asarray(sched.posterior_log_variance_clipped)

    def body(carry, t):
        x, rng = carry
        rng, sub = jax.random.split(rng)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = denoise_fn(x, tb)
        x0 = predict_start_from_noise(sched, x, tb, eps)
        mean = c1[t] * x0 + c2[t] * x
        noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * log_var[t]) * noise
        return (x, rng), None

    ts = jnp.arange(t_max - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x, rng), ts)
    return x


def sample_ddim(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t_max: int,
    interval: int,
) -> jnp.ndarray:
    """DDIM (eta=0) with fixed stride (ddpm.py:158-167)."""
    b = x.shape[0]
    acp = jnp.asarray(sched.alphas_cumprod)

    def body(x, t):
        tb = jnp.full((b,), t, dtype=jnp.int32)
        a_t = acp[t]
        a_prev = acp[jnp.maximum(t - interval, 0)]
        eps = denoise_fn(x, tb)
        x_prev = jnp.sqrt(a_prev) * (
            x / jnp.sqrt(a_t)
            + (jnp.sqrt((1 - a_prev) / a_prev) - jnp.sqrt((1 - a_t) / a_t)) * eps
        )
        return x_prev, None

    # reference iterates reversed(range(0, t_max, interval))
    ts = jnp.arange((t_max - 1) // interval, -1, -1) * interval
    x, _ = jax.lax.scan(body, x, ts)
    return x


def sample_plms(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t_max: int,
    interval: int,
) -> jnp.ndarray:
    """PLMS / PNDM sampling (ddpm.py:169-204): linear-multistep on the noise
    prediction with a 3-deep history; the warm-up step uses a midpoint second
    evaluation exactly as the reference does."""
    b = x.shape[0]
    acp = jnp.asarray(sched.alphas_cumprod)

    def get_x_pred(x, noise_t, t):
        a_t = acp[t]
        a_prev = acp[jnp.maximum(t - interval, 0)]
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1 / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t) + jnp.sqrt((1 - a_t) * a_prev))) * noise_t
        )
        return x + x_delta

    def body(carry, step):
        x, n1, n2, n3, count = carry
        i, t = step
        tb = jnp.full((b,), t, dtype=jnp.int32)
        # multistep history math runs in the carry dtype (fp32): a bf16
        # denoiser otherwise makes the cond branches disagree (warmup would
        # stay bf16 while the history blend promotes against fp32 zeros)
        noise_pred = denoise_fn(x, tb).astype(x.dtype)

        def warmup(_):
            x_pred = get_x_pred(x, noise_pred, t)
            t_prev = jnp.maximum(t - interval, 0)
            noise_prev = denoise_fn(x_pred, jnp.full((b,), t_prev, dtype=jnp.int32))
            return (noise_pred + noise_prev.astype(x.dtype)) / 2

        def multistep(_):
            prime1 = (3 * noise_pred - n1) / 2
            prime2 = (23 * noise_pred - 16 * n1 + 5 * n2) / 12
            prime3 = (55 * noise_pred - 59 * n1 + 37 * n2 - 9 * n3) / 24
            return jnp.where(count == 1, prime1, jnp.where(count == 2, prime2, prime3))

        noise_prime = jax.lax.cond(count == 0, warmup, multistep, None)
        x_prev = get_x_pred(x, noise_prime, t)
        return (x_prev, noise_pred, n1, n2, jnp.minimum(count + 1, 3)), None

    n_steps = (t_max + interval - 1) // interval
    ts = jnp.arange(n_steps - 1, -1, -1) * interval
    zeros = jnp.zeros_like(x)
    (x, *_), _ = jax.lax.scan(
        body, (x, zeros, zeros, zeros, jnp.int32(0)), (jnp.arange(n_steps), ts)
    )
    return x


def inference_dynamic(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    noise: jnp.ndarray,
    *,
    depth: jnp.ndarray,
    steps: jnp.ndarray,
    k_step: int,
    x_start: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Deployment-contract DDPM sampler with *runtime* ``depth`` (f32 scalar)
    and ``steps`` (i32 scalar) — reference deployment/modules/diffusion.py:107-155.
    Without a shallow source the speedup is snapped down to the largest divisor
    of ``timesteps`` (the reference's ``timestep_factors`` buffer, ddpm.py:114-115);
    with one, the requested depth is rounded down to a multiple of the raw
    speedup instead (diffusion.py:116-120).

    DDIM stepping throughout. The reference's stochastic ``p_sample`` branch
    (taken only when speedup == 1, i.e. steps >= timesteps) is approximated by
    DDIM at interval 1 so the exported loop body stays RNG-free — a documented
    divergence on that pathological setting (the reference itself notes
    loudness issues there, deployment/modules/diffusion.py:41-43).
    """
    timesteps = sched.timesteps
    steps = jnp.maximum(jnp.asarray(steps, jnp.int32), 1)
    if x_start is None:
        factors = jnp.asarray(
            [i for i in range(1, timesteps + 1) if timesteps % i == 0], jnp.int32
        )
        raw = jnp.maximum(1, jnp.int32(timesteps) // steps)
        speedup = factors[jnp.sum((factors <= raw).astype(jnp.int32)) - 1]
        # reference iterates arange(0, k_step, speedup).flip
        t_top = (jnp.int32(k_step) - 1) // speedup * speedup
        x = noise
    else:
        depth_int = jnp.minimum(
            jnp.round(jnp.asarray(depth, jnp.float32) * timesteps).astype(jnp.int32),
            jnp.int32(k_step),
        )
        speedup = jnp.maximum(1, depth_int // steps)
        depth_int = depth_int // speedup * speedup
        b = x_start.shape[0]
        x_noised = q_sample(
            sched, x_start, jnp.maximum(depth_int - 1, 0) * jnp.ones((b,), jnp.int32), noise
        )
        x = jnp.where(
            depth_int >= timesteps, noise,
            jnp.where(depth_int > 0, x_noised, x_start),
        )
        t_top = depth_int - speedup

    acp = jnp.asarray(sched.alphas_cumprod)
    b = noise.shape[0]

    def cond_fn(carry):
        return carry[0] >= 0

    def body_fn(carry):
        t, x = carry
        tb = jnp.full((b,), t, dtype=jnp.int32)
        a_t = acp[t]
        a_prev = acp[jnp.maximum(t - speedup, 0)]
        eps = denoise_fn(x, tb)
        x_prev = jnp.sqrt(a_prev) * (
            x / jnp.sqrt(a_t)
            + (jnp.sqrt((1 - a_prev) / a_prev) - jnp.sqrt((1 - a_t) / a_t)) * eps
        )
        return t - speedup, x_prev

    _, x = jax.lax.while_loop(cond_fn, body_fn, (t_top, x))
    return x


def inference(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cond_shape_x: jnp.ndarray,
    *,
    k_step: int,
    depth: int | None,
    speedup: int,
    algorithm: str,
    rng: jax.Array,
    x_start: jnp.ndarray | None = None,
    use_shallow_diffusion: bool = False,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full DDPM inference driver (ddpm.py:221-351) on flat [B, T, D] tensors.

    ``cond_shape_x`` is a [B, T, D] template giving the noise shape. ``noise``
    overrides the PRNG draw (injected-noise regression / RNG-free export).
    """
    timesteps = sched.timesteps
    depth = k_step if depth is None else depth
    t_max = min(depth, k_step) if use_shallow_diffusion else k_step

    if noise is None:
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, cond_shape_x.shape, dtype=jnp.float32)

    if t_max >= timesteps:
        x = noise
    elif t_max > 0:
        assert x_start is not None, "Missing shallow diffusion source."
        b = x_start.shape[0]
        x = q_sample(sched, x_start, jnp.full((b,), t_max - 1, dtype=jnp.int32), noise)
    else:
        assert x_start is not None, "Missing shallow diffusion source."
        return x_start

    if speedup > 1 and t_max > 0:
        if algorithm == "ddim":
            x = sample_ddim(denoise_fn, sched, x, t_max, speedup)
        elif algorithm in ("pndm", "plms"):  # the schema documents both spellings
            x = sample_plms(denoise_fn, sched, x, t_max, speedup)
        elif algorithm in ("dpm-solver", "unipc"):
            from .fast_solvers import sample_dpmpp_2m, sample_unipc_2

            steps = t_max // speedup
            fn = sample_dpmpp_2m if algorithm == "dpm-solver" else sample_unipc_2
            x = fn(denoise_fn, sched, x, t_max, steps)
        else:
            raise ValueError(f"Unsupported acceleration algorithm for DDPM: {algorithm}.")
    else:
        x = sample_ddpm(denoise_fn, sched, x, t_max, rng)
    return x
