"""Golden-trajectory anchors for the UniPC and UnCLIP samplers.

The expected values below were computed by the independent fp64 oracle
implementations in tests/_golden_oracles.py (stateful-history +
np.linalg.solve, written from the published diffusers algorithms — NOT
from pcdms_tpu.diffusion's scan/closed-form code) and committed as
constants. They pin exactly the spots the analytic tests can't see: the
final-step sigma->0 handling (_LAMBDA_FINAL_BUMP), the corrector's
rho solve at r0==1, and the order ramp/lower_order_final schedule
(/root/reference/stage2_batchtest_inpaint_model.py:132,
 /root/reference/src/pipelines/stage1_prior_pipeline.py:453-483).
"""

import jax.numpy as jnp
import numpy as np

from pcdms_tpu.diffusion.schedules import prior_schedule, sd21_schedule
from pcdms_tpu.diffusion.unclip import unclip_clip_x0, unclip_step_tables
from pcdms_tpu.diffusion.unipc import unipc_sample

from _golden_oracles import (
    PublishedUniPC, published_unclip_sample, published_unclip_timesteps,
)

X0 = np.array([[0.5, -1.2, 2.0, -0.3],
               [1.5, 0.1, -2.5, 0.8]], np.float64)

# committed goldens (fp64 oracle output; see module docstring)
UNIPC_N5 = np.array([
    [0.31527401, -0.48464944, 0.55083137, -0.21359943],
    [0.51717241, 0.07688992, -0.57030935, 0.41255679]])
UNIPC_N20 = np.array([
    [0.19805622, -0.32438010, 0.39226216, -0.13213449],
    [0.35478528, 0.04714939, -0.41981945, 0.26642423]])
UNCLIP_N5 = np.array([
    [0.00395840, -0.18870199, 0.15853146, -0.13976517],
    [0.03252807, 0.09106837, 0.14337438, 0.20402947]])
# 'leading' spacing (+ steps_offset 1), same oracle
UNIPC_LEAD_N5 = np.array([
    [0.27926681, -0.44850996, 0.52128119, -0.18589659],
    [0.48360211, 0.06606147, -0.54409731, 0.37398864]])
UNIPC_LEAD_N20 = np.array([
    [0.19257542, -0.31867691, 0.38724009, -0.12787717],
    [0.34933699, 0.04546203, -0.41519813, 0.26051733]])


def _model_np(x, t):
    return np.tanh(x) * (0.5 + t / 2000.0)


def _model_jnp(x, t):
    return jnp.tanh(x) * (0.5 + t / 2000.0)


class TestUniPCGolden:
    def test_oracle_reproduces_committed_constants(self):
        ac = np.cumprod(1.0 - np.asarray(
            sd21_schedule().betas, np.float64))
        out5 = PublishedUniPC(ac, 5).sample(_model_np, X0)
        out20 = PublishedUniPC(ac, 20).sample(_model_np, X0)
        np.testing.assert_allclose(out5, UNIPC_N5, atol=1e-7)
        np.testing.assert_allclose(out20, UNIPC_N20, atol=1e-7)

    def test_unipc_sample_matches_golden_5_steps(self):
        out = unipc_sample(sd21_schedule(), _model_jnp,
                           jnp.asarray(X0, jnp.float32), 5)
        np.testing.assert_allclose(np.asarray(out), UNIPC_N5, atol=5e-5)

    def test_unipc_sample_matches_golden_20_steps(self):
        """20 steps: full order ramp, corrector on every step, and the
        lower_order_final order-1 final step at realistic step count."""
        out = unipc_sample(sd21_schedule(), _model_jnp,
                           jnp.asarray(X0, jnp.float32), 20)
        np.testing.assert_allclose(np.asarray(out), UNIPC_N20, atol=5e-5)

    def test_leading_spacing_timesteps_match_oracle(self):
        from pcdms_tpu.diffusion.unipc import unipc_timesteps
        ac = np.cumprod(1.0 - np.asarray(
            sd21_schedule().betas, np.float64))
        for n in (5, 20, 50):
            oracle = PublishedUniPC(ac, n, spacing="leading")
            np.testing.assert_array_equal(
                unipc_timesteps(1000, n, "leading"), oracle.timesteps)

    def test_unipc_leading_matches_golden(self):
        """'leading' + steps_offset=1 spacing, previously the one
        numerically-unanchored sampler branch (VERDICT r2 weak #2)."""
        ac = np.cumprod(1.0 - np.asarray(
            sd21_schedule().betas, np.float64))
        out5o = PublishedUniPC(ac, 5, spacing="leading").sample(
            _model_np, X0)
        out20o = PublishedUniPC(ac, 20, spacing="leading").sample(
            _model_np, X0)
        np.testing.assert_allclose(out5o, UNIPC_LEAD_N5, atol=1e-7)
        np.testing.assert_allclose(out20o, UNIPC_LEAD_N20, atol=1e-7)

        out5 = unipc_sample(sd21_schedule(), _model_jnp,
                            jnp.asarray(X0, jnp.float32), 5,
                            spacing="leading")
        out20 = unipc_sample(sd21_schedule(), _model_jnp,
                             jnp.asarray(X0, jnp.float32), 20,
                             spacing="leading")
        np.testing.assert_allclose(np.asarray(out5), UNIPC_LEAD_N5,
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out20), UNIPC_LEAD_N20,
                                   atol=5e-5)


class TestUnCLIPGolden:
    def test_tables_match_published_step_equations(self):
        sched = prior_schedule()
        ac = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
        N = 20
        ts, cx0, cxt, std = unclip_step_tables(sched, N)
        ref_ts = published_unclip_timesteps(len(ac), N)
        np.testing.assert_array_equal(ts, ref_ts)
        for i in range(N):
            t = int(ref_ts[i])
            prev_t = int(ref_ts[i + 1]) if i + 1 < N else -1
            ap_t = ac[t]
            ap_prev = ac[prev_t] if prev_t >= 0 else 1.0
            cur_alpha = ap_t / ap_prev
            cur_beta = 1.0 - cur_alpha
            ref_cx0 = (ap_prev ** 0.5 * cur_beta) / (1.0 - ap_t)
            ref_cxt = cur_alpha ** 0.5 * (1.0 - ap_prev) / (1.0 - ap_t)
            ref_std = np.exp(0.5 * np.log(np.maximum(
                (1.0 - ap_prev) / (1.0 - ap_t) * cur_beta, 1e-20)))
            if t == 0:
                ref_std = 0.0
            # rtol bounded by the f32 storage of schedule.alphas_cumprod
            # (the oracle recomputes the cumprod in fp64)
            np.testing.assert_allclose(cx0[i], ref_cx0, rtol=1e-3,
                                       atol=1e-7)
            np.testing.assert_allclose(cxt[i], ref_cxt, rtol=1e-3,
                                       atol=1e-7)
            np.testing.assert_allclose(std[i], ref_std, rtol=1e-3,
                                       atol=1e-7)

    def test_trajectory_matches_golden(self):
        sched = prior_schedule()
        ac = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
        rng = np.random.default_rng(123)
        noises = rng.standard_normal((5, 2, 4))

        ref = published_unclip_sample(ac, _model_np, X0, 5, noises)
        np.testing.assert_allclose(ref, UNCLIP_N5, atol=1e-7)

        ts, cx0, cxt, std = unclip_step_tables(sched, 5)
        x = jnp.asarray(X0, jnp.float32)
        for i in range(5):
            x0 = unclip_clip_x0(_model_jnp(x, float(ts[i])))
            x = cx0[i] * x0 + cxt[i] * x + std[i] * jnp.asarray(
                noises[i], jnp.float32)
        np.testing.assert_allclose(np.asarray(x), UNCLIP_N5, atol=5e-5)
