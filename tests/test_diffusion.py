"""Diffusion math: schedules, DDPM coefficients, DPM-Solver++(2M,SDE).

Golden/analytic tests: for a point-mass data distribution the exact
epsilon-predictor is known in closed form, so both the ancestral DDPM chain
and the DPM solver must converge to the data point.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.diffusion import ddpm, dpm_solver, schedules


def test_linear_schedule_values():
    b = schedules.make_betas("linear", 1000, 3.5e-5, 0.007)
    assert b.shape == (1000,)
    np.testing.assert_allclose(b[0], 3.5e-5, rtol=1e-6)
    np.testing.assert_allclose(b[-1], 0.007, rtol=1e-6)
    assert np.all(np.diff(b) > 0)


def test_cosine_schedule_clip():
    b = schedules.make_betas("cosine", 100)
    assert b.min() >= 0.0001 - 1e-9 and b.max() <= 0.9999 + 1e-9


def test_quadratic_sigmoid_shapes():
    for name in ["quadratic", "sigmoid"]:
        b = schedules.make_betas(name, 50, 1e-4, 0.02)
        assert b.shape == (50,)
        assert np.all(b > 0) and np.all(b < 1)


def test_ddpm_coeff_identities():
    c = ddpm.make_ddpm("linear", 1000, 3.5e-5, 0.007)
    ac = np.asarray(c.alphas_cumprod, np.float64)
    np.testing.assert_allclose(np.asarray(c.sqrt_alphas_cumprod) ** 2, ac,
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(c.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac,
        rtol=1e-3, atol=1e-7)
    # posterior mean coefficients sum: mu(x_t, x0=x_t) with eps=0 keeps x
    co1 = np.asarray(c.posterior_mean_coef1, np.float64)
    co2 = np.asarray(c.posterior_mean_coef2, np.float64)
    # identity: coef1 * sqrt(abar_t)/sqrt(abar_prev)/.. classic consistency:
    # coef1 + coef2 * sqrt(abar_t)/sqrt(abar_{t-1})  ~= 1/sqrt(alpha) * ...
    # check against direct formula instead
    betas = np.asarray(c.betas, np.float64)
    acp = np.asarray(c.alphas_cumprod_prev, np.float64)
    np.testing.assert_allclose(co1, betas * np.sqrt(acp) / (1 - ac),
                               rtol=1e-3)


def test_q_sample_offset_formulation():
    c = ddpm.make_ddpm("linear", 1000, 3.5e-5, 0.007)
    x0 = jnp.zeros((2, 16, 3))
    noise = jnp.ones((2, 16, 3))
    t = jnp.asarray([0, 999])
    out = ddpm.q_sample(c, x0, t, noise)
    s = np.asarray(c.sqrt_one_minus_alphas_cumprod)
    np.testing.assert_allclose(np.asarray(out[0]), s[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), s[999], rtol=1e-5)


def _exact_eps(c_alpha, c_sigma, target):
    """Exact epsilon-predictor for x0 ~ delta(target):
    eps*(x_t, t) = (x_t - alpha_t * target) / sigma_t."""
    def eps_fn(x, t):
        return (x - c_alpha[t] * target) / c_sigma[t]
    return eps_fn


def test_dpm_solver_converges_to_point_mass():
    T, S = 1000, 50
    sol = dpm_solver.make_dpm_solver("linear", T, S, 3.5e-5, 0.007)
    target = jnp.asarray([1.7, -0.3, 0.9])
    eps_fn = _exact_eps(sol.alpha_t, sol.sigma_t, target)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (256, 3))
    out = dpm_solver.sample_loop(sol, x0, eps_fn, jax.random.PRNGKey(1))
    err = np.abs(np.asarray(out) - np.asarray(target)).mean()
    assert err < 0.05, err


def test_dpm_solver_short_schedule_lower_order_final():
    # T=8 steps also converges (exercises the first-order final step)
    sol = dpm_solver.make_dpm_solver("linear", 1000, 8, 3.5e-5, 0.007)
    target = jnp.asarray([0.5])
    eps_fn = _exact_eps(sol.alpha_t, sol.sigma_t, target)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (512, 1))
    out = dpm_solver.sample_loop(sol, x0, eps_fn, jax.random.PRNGKey(3))
    assert abs(float(out.mean()) - 0.5) < 0.1


def test_dpm_timesteps_match_diffusers_rule():
    sol = dpm_solver.make_dpm_solver("linear", 1000, 50, 3.5e-5, 0.007)
    ref = np.linspace(0, 999, 51).round()[::-1][:-1].astype(np.int32)
    np.testing.assert_array_equal(np.asarray(sol.timesteps), ref)
    assert int(sol.timesteps[0]) == 999


def test_ddpm_ancestral_converges():
    T = 200
    c = ddpm.make_ddpm("linear", T, 1e-4, 0.02)
    target = jnp.asarray([0.8, -1.2])
    alpha = c.sqrt_alphas_cumprod
    sigma = c.sqrt_one_minus_alphas_cumprod
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 512, 2))

    def body(carry, t):
        x, k = carry
        k, k1 = jax.random.split(k)
        eps = (x - alpha[t] * target) / sigma[t]
        z = jax.random.normal(k1, x.shape)
        x = ddpm.p_step(c, x, eps, jnp.asarray([t]), z)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, key), jnp.arange(T - 1, -1, -1))
    err = np.abs(np.asarray(x).mean((0, 1)) - np.asarray(target)).max()
    assert err < 0.05, err


def test_solver_variance_matches_posterior():
    """With the exact eps-predictor for x0~N(0,I): samples stay unit-ish
    normal through the SDE solver (stationarity check)."""
    sol = dpm_solver.make_dpm_solver("linear", 1000, 50, 3.5e-5, 0.007)

    def eps_fn(x, t):
        # for x0 ~ N(0, I): posterior eps* = sigma_t * x / (alpha^2+sigma^2)=
        # sigma_t * x (alpha^2 + sigma^2 = 1)
        return sol.sigma_t[t] * x

    x0 = jax.random.normal(jax.random.PRNGKey(5), (4096, 1))
    out = dpm_solver.sample_loop(sol, x0, eps_fn, jax.random.PRNGKey(6))
    std = float(np.asarray(out).std())
    assert 0.85 < std < 1.15, std
