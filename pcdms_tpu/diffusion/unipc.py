"""UniPC multistep predictor-corrector sampler (order <= 2, bh2,
predict-x0), as a single ``lax.scan`` with per-step closed-form
coefficients.

Matches diffusers ``UniPCMultistepScheduler`` defaults, the sampler the
reference batch tests swap in for stage-2/3 inference
(/root/reference/stage2_batchtest_inpaint_model.py:132;
 /root/reference/stage3_batchtest_refined_model.py:126):
solver_order=2, predict_x0=True, solver_type='bh2', corrector enabled,
lower_order_final=True, 'linspace' timestep spacing, final sigma zero.

The torch scheduler is a stateful object holding model-output history; here
the order-dependent history lives in the scan carry
(m_prev, m_prev2, last_sample), per SURVEY.md §7.3. Order ramp-up
(1, 2, 2, ..., 2) and the final order-1 step are realized by computing both
order variants and selecting — no data-dependent control flow under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.diffusion.schedules import NoiseSchedule

_LAMBDA_FINAL_BUMP = 50.0   # lambda at sigma=0 is +inf; +50 saturates expm1


def unipc_timesteps(num_train_timesteps: int, num_inference_steps: int,
                    spacing: str = "linspace") -> np.ndarray:
    T, N = num_train_timesteps, num_inference_steps
    if spacing == "linspace":
        return np.linspace(0, T - 1, N + 1).round()[::-1][:-1].astype(np.int64)
    if spacing == "leading":
        # diffusers UniPCMultistepScheduler 'leading': ratio over N+1
        # points with steps_offset 1 (NOT the single-step DDIM formula;
        # diffusers is absent here, so this follows its published
        # set_timesteps algorithm rather than a numeric cross-check)
        ratio = T // (N + 1)
        return ((np.arange(N + 1) * ratio).round()[::-1][:-1]
                + 1).astype(np.int64)
    raise ValueError(spacing)


@dataclasses.dataclass(frozen=True)
class UniPCCoeffs:
    """Per-step host (numpy) arrays, all of length N (step index i goes
    t_i -> t_{i+1}; the final target is sigma=0). Kept numpy so coefficient
    construction inside a jitted pipeline stays a trace-time constant."""
    timesteps: np.ndarray        # (N,) int32 — model eval times t_i
    # predictor: from t_i to t_{i+1}
    p_h: np.ndarray              # lambda(t_{i+1}) - lambda(t_i)
    p_r0: np.ndarray             # (lambda(t_{i-1}) - lambda(t_i)) / p_h
    p_sigma_ratio: np.ndarray    # sigma(t_{i+1}) / sigma(t_i)
    p_alpha: np.ndarray          # alpha(t_{i+1})
    p_order2: np.ndarray         # bool: use order-2 predictor
    # corrector: refines x at t_i using last_sample at t_{i-1}
    c_h: np.ndarray              # lambda(t_i) - lambda(t_{i-1})
    c_r0: np.ndarray             # (lambda(t_{i-2}) - lambda(t_{i-1})) / c_h
    c_sigma_ratio: np.ndarray    # sigma(t_i) / sigma(t_{i-1})
    c_alpha: np.ndarray          # alpha(t_i)
    c_order2: np.ndarray         # bool: use order-2 corrector
    c_enabled: np.ndarray        # bool: corrector active (i > 0)


def unipc_coeffs(schedule: NoiseSchedule, num_inference_steps: int,
                 spacing: str = "linspace") -> UniPCCoeffs:
    N = num_inference_steps
    ts = unipc_timesteps(schedule.num_train_timesteps, N, spacing)
    ac = np.asarray(schedule.alphas_cumprod, np.float64)

    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    lam = np.log(alpha / sigma)

    # final target: sigma = 0 (alpha = 1)
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    lam_next = np.concatenate([lam[1:], [lam[-1] + _LAMBDA_FINAL_BUMP]])

    lam_older = np.concatenate([[lam[0]], lam[:-1]])      # lambda(t_{i-1})
    lam_older2 = np.concatenate([[lam[0]], lam_older[:-1]])  # lambda(t_{i-2})

    p_h = lam_next - lam
    p_r0 = np.where(p_h != 0, (lam_older - lam) / np.where(p_h == 0, 1, p_h),
                    1.0)
    p_sigma_ratio = np.where(sigma > 0, sigma_next / np.where(sigma == 0, 1,
                                                              sigma), 0.0)

    c_h = lam - lam_older
    c_h_safe = np.where(c_h == 0, 1.0, c_h)
    c_r0 = (lam_older2 - lam_older) / c_h_safe
    sigma_older = np.concatenate([[sigma[0]], sigma[:-1]])
    c_sigma_ratio = sigma / sigma_older

    idx = np.arange(N)
    # predictor order at step i: min(2, i+1) with lower_order_final
    p_order = np.minimum(np.minimum(2, idx + 1), N - idx)
    # corrector order at step i = predictor order at step i-1
    c_order = np.concatenate([[1], p_order[:-1]])

    return UniPCCoeffs(
        timesteps=np.asarray(ts, np.int32),
        p_h=np.asarray(p_h, np.float32),
        p_r0=np.asarray(p_r0, np.float32),
        p_sigma_ratio=np.asarray(p_sigma_ratio, np.float32),
        p_alpha=np.asarray(alpha_next, np.float32),
        p_order2=np.asarray(p_order >= 2),
        c_h=np.asarray(c_h, np.float32),
        c_r0=np.asarray(c_r0, np.float32),
        c_sigma_ratio=np.asarray(c_sigma_ratio, np.float32),
        c_alpha=np.asarray(alpha[np.arange(N)], np.float32),
        c_order2=np.asarray(c_order >= 2),
        c_enabled=np.asarray(idx > 0),
    )


def _bh2_b(h):
    """b1, b2 of the bh2 variant (B_h = expm1(hh), hh = -h, predict_x0)."""
    hh = -h
    h_phi_1 = jnp.expm1(hh)
    B_h = h_phi_1
    b1 = (h_phi_1 / hh - 1.0) / B_h
    b2 = ((h_phi_1 / hh - 1.0) / hh - 0.5) * 2.0 / B_h
    return h_phi_1, B_h, b1, b2


def _predictor(x, m0, m1, h, r0, sigma_ratio, alpha_t, order2):
    h_phi_1, B_h, _, _ = _bh2_b(h)
    x_t = sigma_ratio * x - alpha_t * h_phi_1 * m0
    d1 = (m1 - m0) / jnp.where(r0 == 0, 1.0, r0)
    res2 = alpha_t * B_h * 0.5 * d1
    return jnp.where(order2, x_t - res2, x_t)


def _corrector(last_x, m0, m1, m_t, h, r0, sigma_ratio, alpha_t, order2):
    h_phi_1, B_h, b1, b2 = _bh2_b(h)
    x_t_ = sigma_ratio * last_x - alpha_t * h_phi_1 * m0
    d1_t = m_t - m0
    # order 1: rhos_c = [0.5]
    x1 = x_t_ - alpha_t * B_h * (0.5 * d1_t)
    # order 2: solve [[1,1],[r0,1]] rhos = [b1,b2]
    denom = jnp.where(r0 == 1.0, 1e-8, r0 - 1.0)
    rho0 = (b2 - b1) / denom
    rho1 = b1 - rho0
    d1 = (m1 - m0) / jnp.where(r0 == 0, 1.0, r0)
    x2 = x_t_ - alpha_t * B_h * (rho0 * d1 + rho1 * d1_t)
    return jnp.where(order2, x2, x1)


def unipc_sample(schedule: NoiseSchedule, model_x0_fn: Callable,
                 x_init, num_inference_steps: int,
                 spacing: str = "linspace", unroll: int = 1,
                 model_carry=None):
    """Run the full UniPC sampling loop under one scan.

    model_x0_fn(x, t) -> x0 prediction at integer timestep t (the caller
    folds CFG and epsilon->x0 conversion into this closure). When
    ``model_carry`` is given the contract is
    ``model_x0_fn(x, t, carry) -> (x0, carry)`` and the carry is threaded
    through the scan (used for encoder-feature caching).
    Returns the final sample (x0-domain).
    """
    co = unipc_coeffs(schedule, num_inference_steps, spacing)
    carried = model_carry is not None

    def step(carry, per_step):
        if carried:
            x, m_prev, m_prev2, last_x, mc = carry
        else:
            x, m_prev, m_prev2, last_x = carry
        (t, p_h, p_r0, p_sr, p_a, p_o2,
         c_h, c_r0, c_sr, c_a, c_o2, c_en) = per_step

        if carried:
            m_t, mc = model_x0_fn(x, t, mc)
        else:
            m_t = model_x0_fn(x, t)

        corrected = _corrector(last_x, m_prev, m_prev2, m_t,
                               c_h, c_r0, c_sr, c_a, c_o2)
        x = jnp.where(c_en, corrected, x)

        x_next = _predictor(x, m_t, m_prev, p_h, p_r0, p_sr, p_a, p_o2)
        if carried:
            return (x_next, m_t, m_prev, x, mc), None
        return (x_next, m_t, m_prev, x), None

    init = (x_init, jnp.zeros_like(x_init), jnp.zeros_like(x_init),
            jnp.zeros_like(x_init))
    if carried:
        init = init + (model_carry,)
    per_step = (co.timesteps, co.p_h, co.p_r0, co.p_sigma_ratio, co.p_alpha,
                co.p_order2, co.c_h, co.c_r0, co.c_sigma_ratio, co.c_alpha,
                co.c_order2, co.c_enabled)
    out, _ = jax.lax.scan(step, init, per_step, unroll=unroll)
    return out[0]
