"""Order-of-accuracy and distributional property tests for the samplers.

The golden-value suite (tests/test_sampler_golden.py) pins every sampler
against fp64 oracles — but those oracles were written by the same hands
from the same papers, so a shared misreading of UniPC/DDIM/UnCLIP
semantics would pass both sides. These tests break that circularity with
*mathematical properties no coefficient misreading can fake*:

* On an analytic probability-flow ODE (two-component Gaussian-mixture
  data, so the exact posterior mean E[x0 | x_t] is closed-form and the
  ODE is genuinely nonlinear), the global integration error of each
  sampler must decay at its theoretical order as steps double: DDIM is
  a 1st-order exponential integrator; UniPC(bh2, order 2) with the
  corrector is a 3rd-order one *when probed on a grid that refines in
  lambda* (the production linspace-in-t grid's lambda steps saturate
  near t=0, so the order test uses an analytic lambda-smooth schedule
  through the same unipc_coeffs + scan path). A wrong b2/r0/h
  coefficient drops UniPC to order <= 1 (or blows the error up); no
  rescaled oracle can mask that.
* On linear-Gaussian data with the exact posterior-mean model, the
  *stochastic* samplers (UnCLIP ancestral, DDIM eta=1) must transport
  N(0,1) to the data distribution: the sample mean/std of the final
  particles must converge to the data's as steps grow. A sign or scale
  error in any variance/posterior coefficient moves the terminal std by
  O(1), not O(tolerance).

The exact reference solution integrates dx/dlambda = -alpha(lambda)^2 x
+ alpha(lambda) * D(x, lambda) (the VP probability-flow ODE in
half-log-SNR form, where alpha^2 = sigmoid(2*lambda) identically) with
scipy RK45 at rtol 1e-11 in float64 — independent of every table in
pcdms_tpu/diffusion/.
"""

import numpy as np
import pytest

from pcdms_tpu.diffusion.ddim import ddim_step_tables
from pcdms_tpu.diffusion.schedules import (
    NoiseSchedule, sd21_schedule, prior_schedule,
)
from pcdms_tpu.diffusion.unclip import unclip_step_tables
from pcdms_tpu.diffusion.unipc import unipc_sample

# ---------------------------------------------------------------------------
# analytic world: Gaussian-mixture data, exact posterior-mean model
# ---------------------------------------------------------------------------

MIX_MU = np.array([-1.2, 0.8])
MIX_S = 0.35


def _alpha_sigma_of_lambda(lam):
    """VP diffusion: alpha^2 + sigma^2 = 1 and lambda = log(alpha/sigma)
    imply alpha^2 = sigmoid(2 lambda) — pure functions of lambda."""
    a2 = 1.0 / (1.0 + np.exp(-2.0 * lam))
    return np.sqrt(a2), np.sqrt(1.0 - a2)


def _posterior_mean_np(x, alpha, sigma, mu=MIX_MU, s=MIX_S):
    """E[x0 | x_t] for x0 ~ equal-weight GMM(mu_k, s^2), x scalar/array.
    p_t(x) = sum_k N(x; alpha mu_k, alpha^2 s^2 + sigma^2)."""
    x = np.asarray(x, np.float64)[..., None]
    var = alpha ** 2 * s ** 2 + sigma ** 2
    log_w = -((x - alpha * mu) ** 2) / (2 * var)
    log_w -= log_w.max(axis=-1, keepdims=True)
    w = np.exp(log_w)
    w /= w.sum(axis=-1, keepdims=True)
    post_k = (s ** 2 * alpha * x + sigma ** 2 * mu) / var
    return (w * post_k).sum(axis=-1)


def _lambda_of_t(schedule_fp64_ac, t):
    ac = schedule_fp64_ac[int(t)]
    return 0.5 * np.log(ac / (1.0 - ac))


def _fp64_ac(kind):
    from pcdms_tpu.diffusion.schedules import (
        scaled_linear_betas, squaredcos_cap_v2_betas,
    )
    betas = (scaled_linear_betas() if kind == "scaled_linear"
             else squaredcos_cap_v2_betas())
    return np.cumprod(1.0 - betas)


def _exact_trajectory(lam_start, x_start):
    """Dense fp64 solution of the probability-flow ODE from lam_start
    forward (lambda increasing = noise decreasing). Returns a callable
    x(lam) valid on [lam_start, lam_start + 40]."""
    from scipy.integrate import solve_ivp

    def rhs(lam, x):
        a, s = _alpha_sigma_of_lambda(lam)
        return -a * a * x + a * _posterior_mean_np(x, a, s)

    sol = solve_ivp(rhs, (lam_start, lam_start + 40.0),
                    np.atleast_1d(np.float64(x_start)),
                    method="RK45", rtol=1e-11, atol=1e-13,
                    dense_output=True)
    assert sol.success
    return lambda lam: float(sol.sol(min(lam, lam_start + 40.0))[0])


@pytest.fixture(scope="module")
def exact():
    """One exact trajectory on the sd21 schedule's lambda range, started
    at the highest-noise grid point t=999."""
    ac64 = _fp64_ac("scaled_linear")
    lam0 = _lambda_of_t(ac64, 999)
    x0 = 1.3
    return {"ac64": ac64, "lam0": lam0, "x_of_lam": _exact_trajectory(
        lam0, x0)}


# ---------------------------------------------------------------------------
# DDIM: 1st-order convergence on the PF ODE
# ---------------------------------------------------------------------------

def _run_ddim(schedule, exact, n_steps):
    """Drive the shipped DDIM tables (fp64 application, exact model),
    initialized ON the exact trajectory at the tables' start time."""
    ts, cx0, ceps, _ = ddim_step_tables(schedule, n_steps)
    ac64 = exact["ac64"]
    lam_start = _lambda_of_t(ac64, ts[0])
    x = exact["x_of_lam"](lam_start)
    for i in range(n_steps):
        a_t = np.sqrt(ac64[ts[i]])
        s_t = np.sqrt(1.0 - ac64[ts[i]])
        x0_hat = _posterior_mean_np(x, a_t, s_t)
        eps_hat = (x - a_t * x0_hat) / s_t
        x = float(cx0[i]) * x0_hat + float(ceps[i]) * eps_hat
    # final step targets alphas_cumprod[0] (set_alpha_to_one=False)
    lam_end = _lambda_of_t(ac64, 0)
    return abs(x - exact["x_of_lam"](lam_end))


def test_ddim_first_order_convergence(exact):
    sched = sd21_schedule()
    errs = [_run_ddim(sched, exact, n) for n in (25, 50, 100)]
    # errors must decay ...
    assert errs[0] > errs[1] > errs[2] > 0
    # ... at first order: halving the step size halves the error
    r1, r2 = errs[0] / errs[1], errs[1] / errs[2]
    assert 1.5 < r1 < 3.0, (errs, r1)
    assert 1.5 < r2 < 3.0, (errs, r2)


# ---------------------------------------------------------------------------
# UniPC: high-order convergence on the PF ODE
# ---------------------------------------------------------------------------

def _gmm_model_x0(ac64):
    """Exact E[x0|x_t] closure for unipc_sample (jnp, fp32)."""
    import jax
    import jax.numpy as jnp

    def model_x0(x, t):
        ac_t = jnp.asarray(ac64, jnp.float32)[t]
        a_t = jnp.sqrt(ac_t)
        s_t = jnp.sqrt(1.0 - ac_t)
        var = a_t ** 2 * MIX_S ** 2 + s_t ** 2
        mu = jnp.asarray(MIX_MU, jnp.float32)
        logw = -((x[..., None] - a_t * mu) ** 2) / (2 * var)
        w = jax.nn.softmax(logw, axis=-1)
        post = (MIX_S ** 2 * a_t * x[..., None] + s_t ** 2 * mu) / var
        return (w * post).sum(-1)

    return model_x0


def _run_unipc(schedule, exact, n_steps):
    """Drive the shipped unipc_sample (fp32 kernel, exact model)."""
    import jax.numpy as jnp

    ac64 = exact["ac64"]
    # linspace spacing: every N starts at t=999 — same initial condition
    x_init = exact["x_of_lam"](_lambda_of_t(ac64, 999))
    out = unipc_sample(schedule, _gmm_model_x0(
        np.asarray(schedule.alphas_cumprod, np.float64)),
        jnp.asarray([x_init], jnp.float32), n_steps)
    # UniPC's final target is sigma=0: the ODE's lambda -> +inf limit
    ref = exact["x_of_lam"](exact["lam0"] + 40.0)
    return abs(float(out[0]) - ref)


def _lambda_smooth_schedule(T=10_000, lam_lo=-2.7, lam_hi=6.0):
    """A schedule whose linspace-in-t grid is smooth (and mildly
    non-uniform, so r0 != 1 exactly) in half-log-SNR lambda. On the
    production scaled_linear schedule, linspace-in-t lambda steps near
    t=0 approach a CONSTANT 0.5*ln(2) as N grows (lam ~ -0.5 log(t
    beta_0)), so the observable global order saturates at ~1 regardless
    of the integrator — the order must be probed on a grid where
    h_max -> 0 in the integration variable."""
    u = np.linspace(0, 1, T)
    warp = u + 0.08 * np.sin(2 * np.pi * u)          # monotone, non-uniform
    lam = lam_hi - (lam_hi - lam_lo) * warp          # t=0 high-lam (clean)
    ac = 1.0 / (1.0 + np.exp(-2.0 * lam))            # alpha^2 = sigm(2 lam)
    alphas = np.concatenate([[ac[0]], ac[1:] / ac[:-1]])
    f32 = lambda a: np.asarray(a, np.float32)
    return NoiseSchedule(
        betas=f32(1.0 - alphas), alphas=f32(alphas),
        alphas_cumprod=f32(ac), sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - ac)),
        num_train_timesteps=T, prediction_type="sample"), ac, lam


def test_unipc_high_order_convergence():
    """End-to-end through unipc_coeffs + the scan on an analytic
    lambda-smooth schedule: UniPC-2 with corrector is a 3rd-order
    integrator (UniC-p lifts UniP-p by one order), so doubling steps
    must cut the error by far more than a 1st-order method's 2x — any
    b1/b2/r0/h coefficient misreading collapses this to <= 2x. The
    final sigma=0 jump's own error is O(sigma(t_last)^2) ~ e^{-2*6},
    well below the measured errors."""
    import jax.numpy as jnp

    sched, ac64, lam = _lambda_smooth_schedule()
    x_exact = _exact_trajectory(lam[-1], 1.3)
    x_init = x_exact(lam[-1])
    ref = x_exact(lam[-1] + 40.0)
    model = _gmm_model_x0(ac64)

    def err(n):
        out = unipc_sample(sched, model, jnp.asarray([x_init], jnp.float32),
                           n)
        return abs(float(out[0]) - ref)

    errs = [err(n) for n in (6, 12, 24, 48)]
    assert errs[0] > errs[1] > errs[2] > errs[3] > 0, errs
    # asymptotic ratios (past the order ramp-up): > 4x per doubling
    assert errs[1] / errs[2] > 4.0, errs
    assert errs[2] / errs[3] > 3.5, errs
    assert errs[0] / errs[3] > 50.0, errs       # cumulative >> first order


def test_unipc_error_decays_on_production_grid(exact):
    """On the real sd21 linspace-in-t grid the lambda steps near t=0
    saturate (see _lambda_smooth_schedule docstring), so only monotone
    decay — not an order — is asserted here."""
    sched = sd21_schedule()
    errs = [_run_unipc(sched, exact, n) for n in (4, 8, 16)]
    assert errs[0] > errs[1] > errs[2] > 0, errs
    assert errs[0] / errs[2] > 2.0, errs


def test_unipc_beats_ddim_at_equal_steps():
    """The higher-order method must be far more accurate at the same
    budget (coefficient misreadings typically destroy exactly this).
    Probed on the lambda-smooth schedule — on the production grid both
    samplers' error is dominated by the shared saturated-lambda tail,
    so the gap there is small and says nothing about coefficients."""
    import jax.numpy as jnp

    sched, ac64, lam = _lambda_smooth_schedule()
    x_exact = _exact_trajectory(lam[-1], 1.3)
    x_init = x_exact(lam[-1])
    e_unipc = abs(float(unipc_sample(
        sched, _gmm_model_x0(ac64), jnp.asarray([x_init], jnp.float32),
        25)[0]) - x_exact(lam[-1] + 40.0))

    ts, cx0, ceps, _ = ddim_step_tables(sched, 25)
    x = x_exact(float(lam[ts[0]]))
    for i in range(25):
        a_t = np.sqrt(ac64[ts[i]])
        s_t = np.sqrt(1.0 - ac64[ts[i]])
        x0_hat = _posterior_mean_np(x, a_t, s_t)
        eps_hat = (x - a_t * x0_hat) / s_t
        x = float(cx0[i]) * x0_hat + float(ceps[i]) * eps_hat
    e_ddim = abs(x - x_exact(float(lam[0])))
    assert e_unipc < e_ddim / 20.0, (e_unipc, e_ddim)


# ---------------------------------------------------------------------------
# stochastic samplers: transport N(0,1) to the data distribution
# ---------------------------------------------------------------------------

DATA_MU, DATA_S = 0.7, 0.25


def _linear_posterior_mean(x, ac_t):
    """E[x0|x_t] for x0 ~ N(DATA_MU, DATA_S^2) (fp64, vectorized)."""
    a = np.sqrt(ac_t)
    s2 = 1.0 - ac_t
    var = ac_t * DATA_S ** 2 + s2
    return (DATA_S ** 2 * a * x + s2 * DATA_MU) / var


def _unclip_terminal_moments(n_steps, n_particles=200_000, seed=0):
    sched = prior_schedule()
    ts, coef_x0, coef_xt, std = unclip_step_tables(sched, n_steps)
    ac = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n_particles)
    for i in range(n_steps):
        x0_hat = _linear_posterior_mean(x, ac[ts[i]])
        x = (float(coef_x0[i]) * x0_hat + float(coef_xt[i]) * x
             + float(std[i]) * rng.standard_normal(n_particles))
    return float(x.mean()), float(x.std())


def test_unclip_transports_to_data_distribution():
    """UnCLIP ancestral sampling with the exact posterior-mean model
    must (approximately) sample the data distribution, and the terminal
    std must converge toward the data std as steps grow — wrong
    'fixed_small_log' variance or a swapped posterior coefficient moves
    the terminal std by O(1)."""
    devs, means = {}, {}
    for n in (10, 40, 250):
        m, s = _unclip_terminal_moments(n)
        means[n], devs[n] = m, abs(s - DATA_S)
    assert abs(means[250] - DATA_MU) < 0.01, means
    assert devs[250] < 0.01, devs
    # the point-estimate posterior variance deficit decays as O(1/N);
    # a sign/scale coefficient error is an O(1) std shift that doesn't
    assert devs[10] > devs[40] > devs[250], devs
    assert devs[250] < devs[10] / 8.0, devs


def test_ddim_eta1_transports_to_data_distribution():
    """DDIM with eta=1 is the ancestral sampler; its terminal sample
    moments must match the data distribution too (exercises the
    eta-sigma formula ddim.py:50-53 end to end)."""
    sched = sd21_schedule()
    n_particles = 200_000
    ac = _fp64_ac("scaled_linear")

    def terminal(n_steps):
        ts, cx0, ceps, sig = ddim_step_tables(sched, n_steps, eta=1.0)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(n_particles)
        for i in range(n_steps):
            a_t = np.sqrt(ac[ts[i]])
            s_t = np.sqrt(1.0 - ac[ts[i]])
            x0_hat = _linear_posterior_mean(x, ac[ts[i]])
            eps_hat = (x - a_t * x0_hat) / s_t
            x = (float(cx0[i]) * x0_hat + float(ceps[i]) * eps_hat
                 + float(sig[i]) * rng.standard_normal(n_particles))
        return float(x.mean()), abs(float(x.std()) - DATA_S)

    m50, d50 = terminal(50)
    m250, d250 = terminal(250)
    assert abs(m250 - DATA_MU) < 0.01, (m50, m250)
    assert d250 < 0.015, (d50, d250)
    # O(1/N) point-estimate variance deficit (see the unclip test)
    assert d250 < d50 / 2.5, (d50, d250)
