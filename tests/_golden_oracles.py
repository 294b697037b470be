"""Independent fp64 oracle implementations of the published sampler
algorithms (diffusers UniPCMultistepScheduler / UnCLIPScheduler semantics),
written from the published algorithm descriptions — deliberately NOT
imports of pcdms_tpu.diffusion. Used by tests/test_sampler_golden.py to
derive committed golden trajectories; a shared bug between these and the
repo samplers would require misreading the algorithm twice in different
idioms (stateful-history/linalg.solve here vs scan/closed-form there).
"""

import numpy as np


# ---------------------------------------------------------------- UniPC ---
class PublishedUniPC:
    """UniPC (order<=2, bh2, predict_x0, corrector on, lower_order_final,
    'linspace' spacing, final sigma zero). Model outputs are x0
    predictions. Stateful history + np.linalg.solve, as published."""

    def __init__(self, alphas_cumprod, num_inference_steps, order=2,
                 spacing="linspace", steps_offset=1):
        ac = np.asarray(alphas_cumprod, np.float64)
        T = len(ac)
        self.N = int(num_inference_steps)
        self.order = order
        if spacing == "linspace":
            self.timesteps = (np.linspace(0, T - 1, self.N + 1).round()
                              [::-1][:-1].astype(np.int64))
        elif spacing == "leading":
            # published set_timesteps 'leading' rule: integer step ratio
            # over N+1 points, reversed, drop the last, add steps_offset
            step_ratio = T // (self.N + 1)
            self.timesteps = ((np.arange(self.N + 1) * step_ratio)
                              .round()[::-1][:-1].astype(np.int64)
                              + steps_offset)
        else:
            raise ValueError(spacing)
        alpha = np.sqrt(ac[self.timesteps])
        sigma = np.sqrt(1.0 - ac[self.timesteps])
        # karras-style sigma grid with an exact zero appended
        self.sigmas = np.concatenate([sigma / alpha, [0.0]])

    @staticmethod
    def _alpha_sigma(sig):
        alpha = 1.0 / np.sqrt(sig * sig + 1.0)
        return alpha, sig * alpha

    def _lambda(self, sig):
        alpha, sigma = self._alpha_sigma(sig)
        if sigma == 0.0:
            return np.inf
        return np.log(alpha) - np.log(sigma)

    def _coeff_system(self, h, rks, order):
        hh = -h                      # predict_x0
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        B_h = h_phi_1                # bh2
        R, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        return np.array(R), np.array(b), h_phi_1, B_h

    def _uni_p(self, x, m_hist, i, order):
        sigma_t, sigma_s0 = self.sigmas[i + 1], self.sigmas[i]
        alpha_t, sigma_t_c = self._alpha_sigma(sigma_t)
        _, sigma_s0_c = self._alpha_sigma(sigma_s0)
        lam_t, lam_s0 = self._lambda(sigma_t), self._lambda(sigma_s0)
        m0 = m_hist[-1]
        h = lam_t - lam_s0
        rks, D1s = [], []
        for j in range(1, order):
            lam_sj = self._lambda(self.sigmas[i - j])
            rk = (lam_sj - lam_s0) / h
            rks.append(rk)
            D1s.append((m_hist[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._coeff_system(h, np.array(rks), order)
        x_t_ = (sigma_t_c / sigma_s0_c) * x - (alpha_t * h_phi_1) * m0
        if D1s:
            if order == 2:
                rhos_p = np.array([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = sum(r * d for r, d in zip(rhos_p, D1s))
        else:
            pred_res = 0.0
        return x_t_ - alpha_t * B_h * pred_res

    def _uni_c(self, last_x, m_hist, m_t, i, order):
        sigma_t, sigma_s0 = self.sigmas[i], self.sigmas[i - 1]
        alpha_t, sigma_t_c = self._alpha_sigma(sigma_t)
        _, sigma_s0_c = self._alpha_sigma(sigma_s0)
        lam_t, lam_s0 = self._lambda(sigma_t), self._lambda(sigma_s0)
        m0 = m_hist[-1]
        h = lam_t - lam_s0
        rks, D1s = [], []
        for j in range(1, order):
            lam_sj = self._lambda(self.sigmas[i - 1 - j])
            rk = (lam_sj - lam_s0) / h
            rks.append(rk)
            D1s.append((m_hist[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._coeff_system(h, np.array(rks), order)
        if order == 1:
            rhos_c = np.array([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        x_t_ = (sigma_t_c / sigma_s0_c) * last_x - (alpha_t * h_phi_1) * m0
        corr_res = sum(r * d for r, d in zip(rhos_c[:-1], D1s))
        D1_t = m_t - m0
        return x_t_ - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t)

    def sample(self, model_x0, x):
        x = np.asarray(x, np.float64)
        m_hist, last_sample, this_order = [], None, None
        lower_order_nums = 0
        for i in range(self.N):
            t = int(self.timesteps[i])
            m_t = model_x0(x, t)
            if i > 0:
                x = self._uni_c(last_sample, m_hist, m_t, i, this_order)
            m_hist.append(m_t)
            if len(m_hist) > self.order:
                m_hist.pop(0)
            this_order = min(self.order, self.N - i, lower_order_nums + 1)
            last_sample = x
            x = self._uni_p(x, m_hist, i, this_order)
            lower_order_nums = min(lower_order_nums + 1, self.order)
        return x


# --------------------------------------------------------------- UnCLIP ---
def published_unclip_timesteps(T, N):
    ratio = (T - 1) / (N - 1)
    return (np.arange(N) * ratio).round()[::-1].astype(np.int64)


def published_unclip_sample(alphas_cumprod, model_sample, x, N, noises,
                            clip_range=10.0):
    """Ancestral UnCLIP sampling with explicit prev_timestep stepping,
    'sample' prediction, fixed_small_log variance, x0 clipping."""
    ac = np.asarray(alphas_cumprod, np.float64)
    T = len(ac)
    ts = published_unclip_timesteps(T, N)
    x = np.asarray(x, np.float64)
    for i in range(N):
        t = int(ts[i])
        prev_t = int(ts[i + 1]) if i + 1 < N else -1
        alpha_prod_t = ac[t]
        alpha_prod_prev = ac[prev_t] if prev_t >= 0 else 1.0
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1.0 - current_alpha

        x0 = np.clip(model_sample(x, t), -clip_range, clip_range)
        coef_x0 = (alpha_prod_prev ** 0.5 * current_beta) / beta_prod_t
        coef_xt = current_alpha ** 0.5 * beta_prod_prev / beta_prod_t
        prev = coef_x0 * x0 + coef_xt * x
        if t > 0:
            var = beta_prod_prev / beta_prod_t * current_beta
            std = np.exp(0.5 * np.log(np.maximum(var, 1e-20)))
            prev = prev + std * noises[i]
        x = prev
    return x
