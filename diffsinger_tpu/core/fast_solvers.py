"""Fast ODE solvers for DDPM sampling: DPM-Solver++ (2M) and UniPC (bh2).

Ports of the exact paths the reference uses (modules/core/ddpm.py:246-322):
multistep order-2, ``time_uniform`` grids, ``dpmsolver++``/``bh2`` variants,
``lower_order_final`` handling — from the vendored
inference/dpm_solver_pytorch.py and inference/uni_pc.py.

TPU-first design: the sampling time grid is static per jit, so every schedule
quantity (alpha_t, sigma_t, lambda_t, the UniPC rho coefficients) is
precomputed on host with numpy and baked into the compiled program; the device
only runs the denoiser inside one `lax.scan` plus two boundary steps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import DenoiseFn
from .schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class _Grid:
    """Per-gridpoint schedule values along the sampling trajectory."""

    t_input: np.ndarray  # model input times (discrete labels), [steps+1]
    lam: np.ndarray  # half-logSNR, [steps+1]
    alpha: np.ndarray  # [steps+1]
    sigma: np.ndarray  # [steps+1]


def _discrete_grid(sched: DiffusionSchedule, t_max: int, steps: int) -> _Grid:
    """NoiseScheduleVP('discrete', betas=betas[:t_max]) + time_uniform grid
    (dpm_solver_pytorch.py:96-126, 453-480), in float64 numpy."""
    betas = np.asarray(sched.betas[:t_max], dtype=np.float64)
    log_alphas = 0.5 * np.cumsum(np.log(1 - betas))
    # numerical_clip_alpha: drop the tail where lambda < -5.1
    log_sigmas = 0.5 * np.log(1 - np.exp(2 * log_alphas))
    lambdas = log_alphas - log_sigmas
    idx = np.searchsorted(lambdas[::-1], -5.1)
    if idx > 0:
        log_alphas = log_alphas[:-idx]
    n = len(log_alphas)
    t_array = np.linspace(0.0, 1.0, n + 1)[1:]

    t_0, t_t = 1.0 / n, 1.0
    grid = np.linspace(t_t, t_0, steps + 1)

    # piecewise-linear interpolation of log_alpha over t (with endpoint clamping,
    # matching interpolate_fn's behavior inside the sampled range)
    la = np.interp(grid, t_array, log_alphas)
    sigma = np.sqrt(1.0 - np.exp(2.0 * la))
    lam = la - 0.5 * np.log(1.0 - np.exp(2.0 * la))
    t_input = (grid - 1.0 / n) * n
    return _Grid(
        t_input=t_input.astype(np.float32),
        lam=lam,
        alpha=np.exp(la).astype(np.float64),
        sigma=sigma,
    )


def _data_pred(denoise_fn: DenoiseFn, x: jnp.ndarray, t_in: float, alpha: float, sigma: float):
    """x0-prediction from a noise-prediction model (dpm_solver_pytorch.py:433-442)."""
    b = x.shape[0]
    eps = denoise_fn(x, jnp.full((b,), t_in, dtype=jnp.float32))
    return (x - sigma * eps) / alpha


def sample_dpmpp_2m(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t_max: int,
    steps: int,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """Multistep DPM-Solver++ order 2 ('dpmsolver' update type), the exact
    configuration invoked at ddpm.py:277-283."""
    g = _discrete_grid(sched, t_max, steps)
    if steps == 1:
        m0 = _data_pred(denoise_fn, x, g.t_input[0], g.alpha[0], g.sigma[0])
        h = g.lam[1] - g.lam[0]
        return (g.sigma[1] / g.sigma[0]) * x - g.alpha[1] * float(np.expm1(-h)) * m0

    # step 0: model eval at the start
    m_prev0 = _data_pred(denoise_fn, x, g.t_input[0], g.alpha[0], g.sigma[0])

    # step 1: first-order (DPM-Solver-1) update, then eval
    h = g.lam[1] - g.lam[0]
    x = (g.sigma[1] / g.sigma[0]) * x - g.alpha[1] * float(np.expm1(-h)) * m_prev0
    m_prev1, m_prev0 = m_prev0, _data_pred(denoise_fn, x, g.t_input[1], g.alpha[1], g.sigma[1])

    def second_order(x, m_prev1, m_prev0, i):
        """Update from grid[i-1] to grid[i] (multistep_dpm_solver_second_update)."""
        h0 = g.lam[i - 1] - g.lam[i - 2]
        h = g.lam[i] - g.lam[i - 1]
        r0 = h0 / h
        phi_1 = float(np.expm1(-h))
        d1 = (m_prev0 - m_prev1) / r0
        return (
            (g.sigma[i] / g.sigma[i - 1]) * x
            - g.alpha[i] * phi_1 * m_prev0
            - 0.5 * g.alpha[i] * phi_1 * d1
        )

    # middle steps 2..steps-1: second-order update + model eval.
    # Per-step scalars are stacked so the denoiser compiles once inside scan.
    mids = list(range(2, steps))
    if mids:
        h0s = np.array([g.lam[i - 1] - g.lam[i - 2] for i in mids])
        hs = np.array([g.lam[i] - g.lam[i - 1] for i in mids])
        coef = np.stack(
            [
                np.array([g.sigma[i] / g.sigma[i - 1] for i in mids]),
                np.array([g.alpha[i] * np.expm1(-h) for i, h in zip(mids, hs)]),
                h0s / hs,
            ],
            axis=1,
        ).astype(np.float32)
        t_ins = np.array([g.t_input[i] for i in mids], dtype=np.float32)
        alphas = np.array([g.alpha[i] for i in mids], dtype=np.float32)
        sigmas = np.array([g.sigma[i] for i in mids], dtype=np.float32)
        b = x.shape[0]

        def body(carry, per_step):
            x, m_prev1, m_prev0 = carry
            (ratio, aphi, r0), t_in, alpha_i, sigma_i = per_step
            d1 = (m_prev0 - m_prev1) / r0
            x = ratio * x - aphi * m_prev0 - 0.5 * aphi * d1
            eps = denoise_fn(x, jnp.full((b,), t_in, dtype=jnp.float32))
            m_new = (x - sigma_i * eps) / alpha_i
            return (x, m_prev0, m_new), None

        (x, m_prev1, m_prev0), _ = jax.lax.scan(
            body,
            (x, m_prev1, m_prev0),
            (jnp.asarray(coef), jnp.asarray(t_ins), jnp.asarray(alphas), jnp.asarray(sigmas)),
        )

    # final step: lower order when steps < 10 (dpm_solver sample(): lower_order_final
    # only kicks in for steps < 10)
    i = steps
    if lower_order_final and steps < 10:
        h = g.lam[i] - g.lam[i - 1]
        x = (g.sigma[i] / g.sigma[i - 1]) * x - g.alpha[i] * float(np.expm1(-h)) * m_prev0
    else:
        x = second_order(x, m_prev1, m_prev0, i)
    return x


def _unipc_rhos_c2(h: float, rk0: float) -> tuple[float, float]:
    """Order-2 corrector coefficients rhos_c = solve(R, b) for bh2
    (uni_pc.py:509-536) with R = [[1, 1], [rk0, 1]], computed in float64 on host."""
    hh = -h  # predict_x0
    h_phi_1 = np.expm1(hh)
    b_h = np.expm1(hh)
    # i = 1
    h_phi_k = h_phi_1 / hh - 1
    b1 = h_phi_k * 1 / b_h
    # i = 2
    factorial_i = 2
    h_phi_k = h_phi_k / hh - 1 / factorial_i
    b2 = h_phi_k * factorial_i / b_h
    rho0 = (b1 - b2) / (1.0 - rk0)
    rho1 = b1 - rho0
    return rho0, rho1


def sample_unipc_2(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    t_max: int,
    steps: int,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """Multistep UniPC order 2, variant bh2, predict_x0 — the configuration
    invoked at ddpm.py:285-322."""
    g = _discrete_grid(sched, t_max, steps)
    bsz = x.shape[0]

    def model(xv, i):
        return _data_pred(denoise_fn, xv, g.t_input[i], g.alpha[i], g.sigma[i])

    def order1_update(x, m_prev0, i, use_corrector):
        """multistep_uni_pc_bh_update with order=1."""
        h = g.lam[i] - g.lam[i - 1]
        hh = -h
        h_phi_1 = float(np.expm1(hh))
        b_h = float(np.expm1(hh))
        ratio = g.sigma[i] / g.sigma[i - 1]
        x_t_ = ratio * x - g.alpha[i] * h_phi_1 * m_prev0
        x_t = x_t_
        if not use_corrector:
            return x_t, None
        m_t = model(x_t, i)
        x_t = x_t_ - g.alpha[i] * b_h * (0.5 * (m_t - m_prev0))
        return x_t, m_t

    if steps == 1:
        m0 = model(x, 0)
        x, _ = order1_update(x, m0, 1, use_corrector=False)
        return x

    m_prev0 = model(x, 0)
    # init step (order 1 with corrector); corrector's model eval is reused
    x, m_t = order1_update(x, m_prev0, 1, use_corrector=True)
    m_prev1, m_prev0 = m_prev0, m_t

    # middle steps 2..steps-1: order-2 predictor + corrector
    mids = list(range(2, steps))
    if mids:
        rows = []
        for i in mids:
            h = g.lam[i] - g.lam[i - 1]
            rk0 = (g.lam[i - 2] - g.lam[i - 1]) / h
            hh = -h
            h_phi_1 = np.expm1(hh)
            b_h = np.expm1(hh)
            c1, c2 = _unipc_rhos_c2(h, rk0)
            rows.append(
                [
                    g.sigma[i] / g.sigma[i - 1],  # ratio
                    g.alpha[i] * h_phi_1,  # aphi
                    rk0,
                    g.alpha[i] * b_h,  # aB
                    c1,
                    c2,
                    g.t_input[i],
                    g.alpha[i],
                    g.sigma[i],
                ]
            )
        coefs = jnp.asarray(np.asarray(rows, dtype=np.float32))

        def body(carry, row):
            x, m_prev1, m_prev0 = carry
            ratio, aphi, rk0, a_bh, c1, c2, t_in, alpha_i, sigma_i = row
            d1_0 = (m_prev1 - m_prev0) / rk0
            x_t_ = ratio * x - aphi * m_prev0
            # predictor (rhos_p = [0.5] for order 2)
            x_t = x_t_ - a_bh * 0.5 * d1_0
            # corrector
            eps = denoise_fn(x_t, jnp.full((bsz,), t_in, dtype=jnp.float32))
            m_t = (x_t - sigma_i * eps) / alpha_i
            x_t = x_t_ - a_bh * (c1 * d1_0 + c2 * (m_t - m_prev0))
            return (x_t, m_prev0, m_t), None

        (x, m_prev1, m_prev0), _ = jax.lax.scan(body, (x, m_prev1, m_prev0), coefs)

    # final step: order 1 (lower_order_final), no corrector
    if lower_order_final:
        x, _ = order1_update(x, m_prev0, steps, use_corrector=False)
    else:
        i = steps
        h = g.lam[i] - g.lam[i - 1]
        rk0 = (g.lam[i - 2] - g.lam[i - 1]) / h
        hh = -h
        h_phi_1 = float(np.expm1(hh))
        b_h = float(np.expm1(hh))
        d1_0 = (m_prev1 - m_prev0) / rk0
        x = (g.sigma[i] / g.sigma[i - 1]) * x - g.alpha[i] * h_phi_1 * m_prev0 - g.alpha[i] * b_h * 0.5 * d1_0
    return x
