"""Generative-core parity tests.

The fast-solver tests run the reference's vendored torch DPM-Solver++/UniPC
(loaded from /root/reference at test time, never vendored here) against our
scan-based JAX ports using an identical toy analytic denoiser.
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.core import ddpm, reflow
from diffsinger_tpu.core.schedule import DiffusionSchedule
from diffsinger_tpu.core.spec_transform import (
    MultiVarianceTransform,
    PitchTransform,
    SpecTransform,
)

torch = pytest.importorskip("torch")

B, T, D = 2, 8, 4


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def toy_eps_np(x, t):
    """Analytic 'denoiser': eps = 0.3*x + sin(t/100) (broadcast over [B,T,D])."""
    return 0.3 * x + np.sin(np.asarray(t, dtype=np.float32).reshape(-1, 1, 1) / 100.0)


def toy_eps_jax(x, t):
    return 0.3 * x + jnp.sin(t.astype(jnp.float32).reshape(-1, 1, 1) / 100.0)


class ToyTorchDenoiser:
    def __call__(self, x, t, cond=None, **kw):
        shape = (-1,) + (1,) * (x.dim() - 1)
        return 0.3 * x + torch.sin(t.float().reshape(shape) / 100.0)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create("linear", 1000, max_beta=0.02)


@pytest.fixture(scope="module")
def x0():
    return np.random.default_rng(7).standard_normal((B, T, D)).astype(np.float32)


def _torch_schedule_refs(sched, t_max):
    betas = torch.from_numpy(np.asarray(sched.betas[:t_max], dtype=np.float32))
    return betas


def test_q_sample_matches_formula(sched, x0):
    t = jnp.array([10, 500])
    noise = jnp.ones((B, T, D))
    out = np.asarray(ddpm.q_sample(sched, jnp.asarray(x0), t, noise))
    for i, ti in enumerate([10, 500]):
        expected = sched.sqrt_alphas_cumprod[ti] * x0[i] + sched.sqrt_one_minus_alphas_cumprod[ti]
        np.testing.assert_allclose(out[i], expected, rtol=1e-5)


def test_ddim_matches_reference_formula(sched, x0):
    """Step-by-step DDIM vs a numpy transliteration of ddpm.py:158-167."""
    t_max, interval = 100, 10
    x_jax = ddpm.sample_ddim(lambda x, t: toy_eps_jax(x, t), sched, jnp.asarray(x0), t_max, interval)

    x = x0.copy()
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float32)
    for t in reversed(range(0, t_max, interval)):
        a_t = acp[t]
        a_prev = acp[max(t - interval, 0)]
        eps = toy_eps_np(x, np.full((B,), t))
        x = np.sqrt(a_prev) * (
            x / np.sqrt(a_t) + (np.sqrt((1 - a_prev) / a_prev) - np.sqrt((1 - a_t) / a_t)) * eps
        )
    np.testing.assert_allclose(np.asarray(x_jax), x, rtol=2e-4, atol=1e-5)


def test_plms_matches_reference_formula(sched, x0):
    """PLMS vs a numpy transliteration of ddpm.py:169-204 (incl. warm-up)."""
    t_max, interval = 100, 10
    x_jax = ddpm.sample_plms(lambda x, t: toy_eps_jax(x, t), sched, jnp.asarray(x0), t_max, interval)

    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    x = x0.astype(np.float64)

    def get_x_pred(x, noise_t, t):
        a_t, a_prev = acp[t], acp[max(t - interval, 0)]
        a_t_sq, a_prev_sq = np.sqrt(a_t), np.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1 / (a_t_sq * (np.sqrt((1 - a_prev) * a_t) + np.sqrt((1 - a_t) * a_prev))) * noise_t
        )
        return x + x_delta

    noise_list = []
    for t in reversed(range(0, t_max, interval)):
        noise_pred = toy_eps_np(x, np.full((B,), t))
        if len(noise_list) == 0:
            x_pred = get_x_pred(x, noise_pred, t)
            noise_prev = toy_eps_np(x_pred, np.full((B,), max(t - interval, 0)))
            noise_prime = (noise_pred + noise_prev) / 2
        elif len(noise_list) == 1:
            noise_prime = (3 * noise_pred - noise_list[-1]) / 2
        elif len(noise_list) == 2:
            noise_prime = (23 * noise_pred - 16 * noise_list[-1] + 5 * noise_list[-2]) / 12
        else:
            noise_prime = (
                55 * noise_pred - 59 * noise_list[-1] + 37 * noise_list[-2] - 9 * noise_list[-3]
            ) / 24
        x = get_x_pred(x, noise_prime, t)
        noise_list.append(noise_pred)
    np.testing.assert_allclose(np.asarray(x_jax), x, rtol=1e-3, atol=2e-5)


@pytest.mark.parametrize("t_max,steps", [(400, 40), (1000, 50), (100, 5)])
def test_dpmpp_2m_matches_torch_reference(sched, x0, t_max, steps):
    ref = _load_ref_module("ref_dpm_solver", "/root/reference/inference/dpm_solver_pytorch.py")
    ns = ref.NoiseScheduleVP(schedule="discrete", betas=_torch_schedule_refs(sched, t_max))
    model_fn = ref.model_wrapper(ToyTorchDenoiser(), ns, model_type="noise", model_kwargs={})
    solver = ref.DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        golden = solver.sample(
            torch.from_numpy(x0), steps=steps, order=2,
            skip_type="time_uniform", method="multistep",
        ).numpy()

    from diffsinger_tpu.core.fast_solvers import sample_dpmpp_2m

    ours = np.asarray(
        sample_dpmpp_2m(lambda x, t: toy_eps_jax(x, t), sched, jnp.asarray(x0), t_max, steps)
    )
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("t_max,steps", [(400, 40), (1000, 50), (100, 5)])
def test_unipc_matches_torch_reference(sched, x0, t_max, steps):
    ref = _load_ref_module("ref_uni_pc", "/root/reference/inference/uni_pc.py")
    ns = ref.NoiseScheduleVP(schedule="discrete", betas=_torch_schedule_refs(sched, t_max))
    model_fn = ref.model_wrapper(ToyTorchDenoiser(), ns, model_type="noise", model_kwargs={})
    solver = ref.UniPC(model_fn, ns, variant="bh2")
    with torch.no_grad():
        # the vendored UniPC hardcodes 4D 'bkchw' einsums; feed [B,1,T,D]
        golden = solver.sample(
            torch.from_numpy(x0)[:, None], steps=steps, order=2,
            skip_type="time_uniform", method="multistep",
        ).numpy()[:, 0]

    from diffsinger_tpu.core.fast_solvers import sample_unipc_2

    ours = np.asarray(
        sample_unipc_2(lambda x, t: toy_eps_jax(x, t), sched, jnp.asarray(x0), t_max, steps)
    )
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=2e-4)


def test_reflow_samplers_match_formula(x0):
    """RK integrators vs numpy transliteration of reflow.py:66-102."""

    def v_np(x, t_scaled):
        return -0.5 * x + np.cos(np.asarray(t_scaled, dtype=np.float64).reshape(-1, 1, 1) / 1000.0)

    def v_jax(x, t_scaled):
        return -0.5 * x + jnp.cos(t_scaled.astype(jnp.float32).reshape(-1, 1, 1) / 1000.0)

    for algo in ["euler", "rk2", "rk4", "rk5"]:
        steps, t_start, tsf = 8, 0.4, 1000.0
        out = np.asarray(
            reflow.sample_ode(v_jax, jnp.asarray(x0), t_start=t_start, steps=steps,
                              algorithm=algo, time_scale_factor=tsf)
        )
        x = x0.astype(np.float64)
        dt = (1.0 - t_start) / steps
        for i in range(steps):
            t = np.full((B,), t_start + i * dt)
            if algo == "euler":
                x = x + v_np(x, tsf * t) * dt
            elif algo == "rk2":
                k1 = v_np(x, tsf * t)
                k2 = v_np(x + 0.5 * k1 * dt, tsf * (t + 0.5 * dt))
                x = x + k2 * dt
            elif algo == "rk4":
                k1 = v_np(x, tsf * t)
                k2 = v_np(x + 0.5 * k1 * dt, tsf * (t + 0.5 * dt))
                k3 = v_np(x + 0.5 * k2 * dt, tsf * (t + 0.5 * dt))
                k4 = v_np(x + k3 * dt, tsf * (t + dt))
                x = x + (k1 + 2 * k2 + 2 * k3 + k4) * dt / 6
            else:
                k1 = v_np(x, tsf * t)
                k2 = v_np(x + 0.25 * k1 * dt, tsf * (t + 0.25 * dt))
                k3 = v_np(x + 0.125 * (k2 + k1) * dt, tsf * (t + 0.25 * dt))
                k4 = v_np(x + 0.5 * (-k2 + 2 * k3) * dt, tsf * (t + 0.5 * dt))
                k5 = v_np(x + 0.0625 * (3 * k1 + 9 * k4) * dt, tsf * (t + 0.75 * dt))
                k6 = v_np(x + (-3 * k1 + 2 * k2 + 12 * k3 - 12 * k4 + 8 * k5) * dt / 7, tsf * (t + dt))
                x = x + (7 * k1 + 32 * k3 + 12 * k4 + 32 * k5 + 7 * k6) * dt / 90
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5, err_msg=algo)


def test_spec_transform_roundtrip():
    st = SpecTransform(spec_min=[-12.0], spec_max=[0.0], out_dims=4, num_feats=1)
    x = jnp.asarray(np.random.default_rng(0).uniform(-12, 0, (2, 5, 4)).astype(np.float32))
    normed = st.norm(x)
    assert float(jnp.max(jnp.abs(normed))) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.asarray(st.denorm(normed)), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_pitch_transform_clip_and_repeat():
    pt = PitchTransform(vmin=-8.0, vmax=8.0, cmin=-12.0, cmax=12.0, repeat_bins=16)
    x = jnp.asarray(np.array([[0.0, 20.0, -20.0]], dtype=np.float32))
    normed = pt.norm(x)
    assert normed.shape == (1, 3, 16)
    out = np.asarray(pt.denorm(normed))
    np.testing.assert_allclose(out[0], [0.0, 12.0, -12.0], atol=1e-5)


def test_multi_variance_transform():
    mv = MultiVarianceTransform(
        ranges=[(-96.0, -12.0), (-10.0, 10.0)],
        clamps=[(-96.0, 0.0), (-10.0, 10.0)],
        repeat_bins=8,
    )
    a = jnp.asarray(np.full((1, 4), -50.0, dtype=np.float32))
    b = jnp.asarray(np.full((1, 4), 3.0, dtype=np.float32))
    normed = mv.norm([a, b])
    assert normed.shape == (1, 2, 4, 8)
    outs = mv.denorm(normed)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(b), atol=1e-4)
    flat = mv.flatten(normed)
    assert flat.shape == (1, 4, 16)
    np.testing.assert_allclose(np.asarray(mv.unflatten(flat)), np.asarray(normed))
