"""Scheduler parity tests against analytic values (diffusers is not
installed in this image, so semantics are checked against closed forms
and cross-sampler consistency on an exactly-solvable toy problem)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcdms_tpu.diffusion import (
    apply_cfg, ddim_step_tables, ddim_timesteps, ddpm_add_noise,
    ddpm_velocity, make_schedule, pred_to_eps, pred_to_x0, prior_schedule,
    sd21_schedule, unclip_step_tables, unclip_timesteps, unipc_sample,
    unipc_timesteps,
)
from pcdms_tpu.diffusion.unclip import unclip_clip_x0


class TestBetaSchedules:
    def test_scaled_linear_endpoints(self):
        s = sd21_schedule()
        np.testing.assert_allclose(float(s.betas[0]), 0.00085, rtol=1e-5)
        np.testing.assert_allclose(float(s.betas[-1]), 0.012, rtol=1e-5)
        assert np.all(np.diff(np.asarray(s.betas)) > 0)

    def test_squaredcos_formula(self):
        s = prior_schedule()
        # beta_i = 1 - alpha_bar((i+1)/T) / alpha_bar(i/T)
        def ab(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        for i in [0, 1, 500, 998]:
            expected = min(1 - ab((i + 1) / 1000) / ab(i / 1000), 0.999)
            np.testing.assert_allclose(float(s.betas[i]), expected, rtol=1e-5)
        np.testing.assert_allclose(float(s.betas[-1]), 0.999, rtol=1e-6)

    def test_alphas_cumprod_consistency(self):
        s = sd21_schedule()
        ac = np.asarray(s.alphas_cumprod)
        np.testing.assert_allclose(ac, np.cumprod(1 - np.asarray(s.betas)),
                                   rtol=1e-5)


class TestQSample:
    def test_add_noise_formula(self):
        s = sd21_schedule()
        x0 = jnp.ones((2, 4, 4, 3))
        noise = jnp.full((2, 4, 4, 3), 2.0)
        t = jnp.array([0, 500])
        xt = ddpm_add_noise(s, x0, noise, t)
        ac = np.asarray(s.alphas_cumprod)
        for b, ti in enumerate([0, 500]):
            expected = np.sqrt(ac[ti]) * 1.0 + np.sqrt(1 - ac[ti]) * 2.0
            np.testing.assert_allclose(np.asarray(xt[b]), expected, rtol=1e-5)

    def test_velocity_identity(self):
        # v = sqrt(ac) eps - sqrt(1-ac) x0 and x_t relations: reconstruct x0
        s = sd21_schedule()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 8))
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        t = jnp.array([100, 900])
        xt = ddpm_add_noise(s, x0, noise, t)
        v = ddpm_velocity(s, x0, noise, t)
        a = np.sqrt(np.asarray(s.alphas_cumprod))[np.asarray(t)][:, None]
        sg = np.sqrt(1 - np.asarray(s.alphas_cumprod))[np.asarray(t)][:, None]
        x0_rec = a * np.asarray(xt) - sg * np.asarray(v)
        np.testing.assert_allclose(x0_rec, np.asarray(x0), atol=1e-5)

    def test_pred_conversions_roundtrip(self):
        s = sd21_schedule()
        x0 = jnp.array([[1.0, -2.0]])
        eps = jnp.array([[0.5, 0.3]])
        t = jnp.array([400])
        xt = ddpm_add_noise(s, x0, eps, t)
        a = s.sqrt_alphas_cumprod[t][:, None]
        sg = s.sqrt_one_minus_alphas_cumprod[t][:, None]
        np.testing.assert_allclose(
            np.asarray(pred_to_x0(eps, xt, a, sg, "epsilon")),
            np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pred_to_eps(x0, xt, a, sg, "sample")),
            np.asarray(eps), atol=1e-4)
        v = ddpm_velocity(s, x0, eps, t)
        np.testing.assert_allclose(
            np.asarray(pred_to_x0(v, xt, a, sg, "v_prediction")),
            np.asarray(x0), atol=1e-5)


class TestDDIM:
    def test_timesteps_leading_offset1(self):
        ts = ddim_timesteps(1000, 50)
        assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
        assert np.all(np.diff(ts) == -20)

    def test_perfect_model_recovers_x0(self):
        s = sd21_schedule()
        ts, cx0, ceps, _ = ddim_step_tables(s, 50)
        x0_true = jnp.array([[0.7, -1.3, 0.2, 0.9]])
        ac = s.alphas_cumprod

        x = jax.random.normal(jax.random.PRNGKey(0), x0_true.shape)
        for i in range(50):
            t = ts[i]
            a, sg = jnp.sqrt(ac[t]), jnp.sqrt(1 - ac[t])
            eps = (x - a * x0_true) / sg     # oracle epsilon
            x = cx0[i] * x0_true + ceps[i] * eps
        # final alpha_cumprod[0] ~ 0.99915 -> small residual noise remains
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true),
                                   atol=0.12)

    def test_one_step_values(self):
        s = sd21_schedule()
        ts, cx0, ceps, _ = ddim_step_tables(s, 50)
        ac = np.asarray(s.alphas_cumprod)
        # step 0: t=981 -> prev=961
        np.testing.assert_allclose(float(cx0[0]), np.sqrt(ac[961]), rtol=1e-5)
        np.testing.assert_allclose(float(ceps[0]), np.sqrt(1 - ac[961]),
                                   rtol=1e-5)
        # last step: prev < 0 -> ac[0]
        np.testing.assert_allclose(float(cx0[-1]), np.sqrt(ac[0]), rtol=1e-5)


class TestUnCLIP:
    def test_timesteps(self):
        ts = unclip_timesteps(1000, 20)
        assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 20

    def test_perfect_sample_model_recovers_x0_exactly(self):
        s = prior_schedule()
        ts, cx0, cxt, std = unclip_step_tables(s, 20)
        x0_true = jnp.array([[0.4, -0.8]])
        x = jax.random.normal(jax.random.PRNGKey(1), x0_true.shape)
        rng = jax.random.PRNGKey(2)
        for i in range(20):
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x.shape)
            x = (cx0[i] * unclip_clip_x0(x0_true) + cxt[i] * x
                 + std[i] * noise)
        # final step: coef_x0 == 1, coef_xt == 0, std == 0 -> exact
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true),
                                   atol=1e-5)

    def test_final_step_coefficients(self):
        s = prior_schedule()
        ts, cx0, cxt, std = unclip_step_tables(s, 20)
        np.testing.assert_allclose(float(cx0[-1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(cxt[-1]), 0.0, atol=1e-6)
        assert float(std[-1]) == 0.0

    def test_posterior_mean_matches_analytic(self):
        s = prior_schedule()
        ts, cx0, cxt, std = unclip_step_tables(s, 10)
        ac = np.asarray(s.alphas_cumprod, np.float64)
        t, tp = int(ts[0]), int(ts[1])
        a_eff = ac[t] / ac[tp]
        exp_cx0 = np.sqrt(ac[tp]) * (1 - a_eff) / (1 - ac[t])
        exp_cxt = np.sqrt(a_eff) * (1 - ac[tp]) / (1 - ac[t])
        np.testing.assert_allclose(float(cx0[0]), exp_cx0, rtol=1e-5)
        np.testing.assert_allclose(float(cxt[0]), exp_cxt, rtol=1e-5)


class TestUniPC:
    def test_timesteps_linspace(self):
        ts = unipc_timesteps(1000, 20)
        assert ts[0] == 999 and len(ts) == 20
        assert ts[-1] == 50

    def test_perfect_x0_model_exact(self):
        s = sd21_schedule()
        x0_true = jnp.array([[0.3, -0.9, 1.4, 0.0]])
        x_init = jax.random.normal(jax.random.PRNGKey(0), x0_true.shape)
        out = unipc_sample(s, lambda x, t: x0_true, x_init, 10)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true),
                                   atol=1e-4)

    def test_matches_fine_ddim_on_gaussian_toy(self):
        """UniPC@20 should land near DDIM@1000 on an analytically-known
        posterior (data ~ N(mu, s^2)): both approximate the same
        probability-flow ODE."""
        s = sd21_schedule()
        mu, sd_ = 0.5, 2.0
        ac = jnp.asarray(s.alphas_cumprod)   # device table: indexed by traced t

        def x0_post(x, t):
            a2 = ac[t]
            return (jnp.sqrt(a2) * sd_ ** 2 * x + (1 - a2) * mu) / (
                a2 * sd_ ** 2 + (1 - a2))

        x_init = jnp.array([[1.7, -0.6, 0.25, 3.0]])

        out_unipc = unipc_sample(s, x0_post, x_init, 20)

        ts, cx0, ceps, _ = ddim_step_tables(s, 1000, steps_offset=0)
        x = x_init
        for i in range(1000):
            t = ts[i]
            a, sg = jnp.sqrt(ac[t]), jnp.sqrt(1 - ac[t])
            x0 = x0_post(x, t)
            eps = (x - a * x0) / sg
            x = cx0[i] * x0 + ceps[i] * eps
        np.testing.assert_allclose(np.asarray(out_unipc), np.asarray(x),
                                   atol=0.02, rtol=0.02)


class TestCFG:
    def test_mixing(self):
        uncond = jnp.zeros((1, 4))
        cond = jnp.ones((1, 4))
        out = apply_cfg(jnp.concatenate([uncond, cond]), 3.0)
        np.testing.assert_allclose(np.asarray(out), 3.0)

    def test_scale_one_is_cond(self):
        u = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
        out = apply_cfg(jnp.concatenate([u, c]), 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-6)

    def test_rescale_restores_std(self):
        u = jax.random.normal(jax.random.PRNGKey(0), (1, 1000))
        c = jax.random.normal(jax.random.PRNGKey(1), (1, 1000))
        out = apply_cfg(jnp.concatenate([u, c]), 7.5, guidance_rescale=1.0)
        np.testing.assert_allclose(float(jnp.std(out)), float(jnp.std(c)),
                                   rtol=1e-4)


class TestDDIMEta:
    def test_sigma_tables(self):
        from pcdms_tpu.diffusion.schedules import sd21_schedule
        s = sd21_schedule()
        ts, cx0, ceps, sig = ddim_step_tables(s, 20, eta=1.0)
        assert (np.asarray(sig)[:-1] > 0).all()   # noisy except final step
        ts0, cx00, ceps0, sig0 = ddim_step_tables(s, 20, eta=0.0)
        np.testing.assert_array_equal(np.asarray(sig0), 0.0)
        # eta=0 epsilon coeff >= eta=1 coeff (variance moved to noise)
        assert (np.asarray(ceps0) >= np.asarray(ceps) - 1e-7).all()

    def test_eta_loop_runs_and_differs(self):
        import jax
        import jax.numpy as jnp
        from pcdms_tpu.diffusion.schedules import sd21_schedule
        from pcdms_tpu.pipelines.sampling import ddim_sample_loop
        s = sd21_schedule()
        x0 = jnp.ones((1, 4, 4, 4))

        def eps_fn(x, t):
            return 0.1 * x

        det = ddim_sample_loop(s, eps_fn, x0, 5)
        sto = ddim_sample_loop(s, eps_fn, x0, 5, eta=1.0,
                               rng=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(sto)).all()
        assert np.abs(np.asarray(sto) - np.asarray(det)).max() > 1e-4
