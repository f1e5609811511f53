"""Golden-trajectory parity for DPM-Solver++(2M, SDE).

The reference drives diffusers 0.18.0's DPMSolverMultistepScheduler
(algorithm_type='sde-dpmsolver++', solver_order=2, solver_type='midpoint',
prediction_type='epsilon', lower_order_final=True) — see
/root/reference/lidiff/models/models.py:65-73,141.

The oracle below is a standalone numpy transcription of that scheduler's
update rules (diffusers 0.18.0, src/diffusers/schedulers/
scheduling_dpmsolver_multistep.py):

  * table setup (__init__): betas = linspace(b0, b1, T) for
    beta_schedule='linear'; alphas_cumprod = cumprod(1-betas);
    alpha_t = sqrt(alphas_cumprod); sigma_t = sqrt(1-alphas_cumprod);
    lambda_t = log(alpha_t) - log(sigma_t).
  * set_timesteps: linspace(0, T-1, S+1).round()[::-1][:-1].
  * convert_model_output (prediction_type='epsilon', algorithm '++'):
      x0 = (sample - sigma_t[t] * eps) / alpha_t[t].
  * dpm_solver_first_order_update (sde-dpmsolver++):
      h = lambda[t_prev] - lambda[t]
      x <- (sigma[t_prev]/sigma[t]) * exp(-h) * x
           + alpha[t_prev] * (1 - exp(-2h)) * x0
           + sigma[t_prev] * sqrt(1 - exp(-2h)) * z
  * multistep_dpm_solver_second_order_update (sde-dpmsolver++, midpoint):
      h = lambda[t_prev] - lambda[s0];  h_0 = lambda[s0] - lambda[s1]
      r0 = h_0 / h;  D0 = m0;  D1 = (m0 - m1) / r0
      x <- (sigma[t_prev]/sigma[s0]) * exp(-h) * x
           + alpha[t_prev] * (1 - exp(-2h)) * D0
           + 0.5 * alpha[t_prev] * (1 - exp(-2h)) * D1
           + sigma[t_prev] * sqrt(1 - exp(-2h)) * z
  * step(): first-order while lower_order_nums < 1 (i.e. the first call);
    first-order at the FINAL step when lower_order_final and S < 15;
    prev_timestep = 0 on the final step.

Both the oracle and the JAX solver consume the same scripted eps function
and the same pre-drawn noise sequence; the test asserts stepwise agreement
of the full state trajectory, pinning every branch: the first-order first
step, the 2M midpoint update, and the lower_order_final drop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.diffusion.dpm_solver import (init_state, make_dpm_solver,
                                             solver_step)


def oracle_tables(T, b0, b1):
    betas = np.linspace(b0, b1, T, dtype=np.float64)
    ac = np.cumprod(1.0 - betas)
    alpha_t = np.sqrt(ac)
    sigma_t = np.sqrt(1.0 - ac)
    lam = np.log(alpha_t) - np.log(sigma_t)
    return alpha_t, sigma_t, lam


def oracle_trajectory(x0_sample, eps_fn, noises, T, S, b0, b1):
    """Full diffusers-0.18.0 sde-dpmsolver++ order-2 trajectory in numpy."""
    alpha_t, sigma_t, lam = oracle_tables(T, b0, b1)
    timesteps = (np.linspace(0, T - 1, S + 1).round()[::-1][:-1]
                 .astype(np.int64))
    x = x0_sample.astype(np.float64).copy()
    model_outputs = [None, None]     # ring buffer of x0 predictions
    lower_order_nums = 0
    traj = []
    for i, t in enumerate(timesteps):
        prev_t = 0 if i == len(timesteps) - 1 else int(timesteps[i + 1])
        eps = eps_fn(x, int(t))
        x0_pred = (x - sigma_t[t] * eps) / alpha_t[t]
        model_outputs[0] = model_outputs[1]
        model_outputs[1] = x0_pred
        z = noises[i]
        lower_order_final = (i == len(timesteps) - 1) and S < 15
        h = lam[prev_t] - lam[t]
        if lower_order_nums < 1 or lower_order_final:
            x = ((sigma_t[prev_t] / sigma_t[t]) * np.exp(-h) * x
                 + alpha_t[prev_t] * (1 - np.exp(-2.0 * h)) * x0_pred
                 + sigma_t[prev_t] * np.sqrt(1 - np.exp(-2.0 * h)) * z)
        else:
            s0, s1 = int(t), int(timesteps[i - 1])
            m0, m1 = model_outputs[1], model_outputs[0]
            h = lam[prev_t] - lam[s0]
            h_0 = lam[s0] - lam[s1]
            r0 = h_0 / h
            d0, d1 = m0, (m0 - m1) / r0
            x = ((sigma_t[prev_t] / sigma_t[s0]) * np.exp(-h) * x
                 + alpha_t[prev_t] * (1 - np.exp(-2.0 * h)) * d0
                 + 0.5 * alpha_t[prev_t] * (1 - np.exp(-2.0 * h)) * d1
                 + sigma_t[prev_t] * np.sqrt(1 - np.exp(-2.0 * h)) * z)
        if lower_order_nums < 2:
            lower_order_nums += 1
        traj.append(x.copy())
    return timesteps, np.stack(traj)


def scripted_eps(x, t):
    """Deterministic, state-dependent fake denoiser. Kept Lipschitz-small
    (|d eps/dx| < 1) so f32-vs-f64 rounding does not amplify exponentially
    over long trajectories — the comparison isolates the solver update
    rules, not float error growth."""
    return 0.7 * np.sin(0.5 * x + 0.01 * t) + 0.1 * x


T, B0, B1 = 1000, 3.5e-5, 0.007    # reference config.yaml:30-33


@pytest.mark.parametrize("S", [1, 2, 8, 50])
def test_sde_dpmsolver_2m_matches_diffusers_oracle(S):
    rng = np.random.default_rng(0)
    shape = (64, 3)
    x_init = rng.standard_normal(shape)
    noises = rng.standard_normal((S,) + shape)

    solver = make_dpm_solver("linear", T, S, B0, B1)
    ts_oracle, traj_oracle = oracle_trajectory(
        x_init, scripted_eps, noises, T, S, B0, B1)
    np.testing.assert_array_equal(np.asarray(solver.timesteps), ts_oracle,
                                  "timestep schedule must match diffusers' "
                                  "set_timesteps rule")

    state = init_state(jnp.asarray(x_init, jnp.float32))
    for i in range(S):
        t = int(ts_oracle[i])
        eps = scripted_eps(np.asarray(state.sample, np.float64), t)
        state = solver_step(solver, state,
                            jnp.asarray(eps, jnp.float32),
                            jnp.asarray(noises[i], jnp.float32))
        got = np.asarray(state.sample, np.float64)
        np.testing.assert_allclose(
            got, traj_oracle[i], rtol=2e-5, atol=2e-5,
            err_msg=f"S={S} step {i} (t={t}) diverged from the "
                    f"diffusers-0.18.0 oracle")


def oracle_trajectory_ode(x0_sample, eps_fn, T, S, b0, b1):
    """diffusers-0.18.0 'dpmsolver++' (deterministic) order-2 trajectory:
      1st order:  x <- (sig[p]/sig[t]) x - alpha[p] (exp(-h) - 1) x0
      2nd order:  x <- (sig[p]/sig[s0]) x - alpha[p] (exp(-h) - 1) D0
                       - 0.5 alpha[p] (exp(-h) - 1) D1
    (multistep_dpm_solver_second_order_update, algorithm 'dpmsolver++',
    solver_type 'midpoint')."""
    alpha_t, sigma_t, lam = oracle_tables(T, b0, b1)
    timesteps = (np.linspace(0, T - 1, S + 1).round()[::-1][:-1]
                 .astype(np.int64))
    x = x0_sample.astype(np.float64).copy()
    model_outputs = [None, None]
    lower_order_nums = 0
    traj = []
    for i, t in enumerate(timesteps):
        prev_t = 0 if i == len(timesteps) - 1 else int(timesteps[i + 1])
        eps = eps_fn(x, int(t))
        x0_pred = (x - sigma_t[t] * eps) / alpha_t[t]
        model_outputs[0] = model_outputs[1]
        model_outputs[1] = x0_pred
        lower_order_final = (i == len(timesteps) - 1) and S < 15
        h = lam[prev_t] - lam[t]
        if lower_order_nums < 1 or lower_order_final:
            x = ((sigma_t[prev_t] / sigma_t[t]) * x
                 - alpha_t[prev_t] * (np.exp(-h) - 1.0) * x0_pred)
        else:
            s0, s1 = int(t), int(timesteps[i - 1])
            m0, m1 = model_outputs[1], model_outputs[0]
            h = lam[prev_t] - lam[s0]
            h_0 = lam[s0] - lam[s1]
            r0 = h_0 / h
            d0, d1 = m0, (m0 - m1) / r0
            x = ((sigma_t[prev_t] / sigma_t[s0]) * x
                 - alpha_t[prev_t] * (np.exp(-h) - 1.0) * d0
                 - 0.5 * alpha_t[prev_t] * (np.exp(-h) - 1.0) * d1)
        if lower_order_nums < 2:
            lower_order_nums += 1
        traj.append(x.copy())
    return timesteps, np.stack(traj)


@pytest.mark.parametrize("S", [2, 8, 50])
def test_ode_dpmsolver_2m_matches_diffusers_oracle(S):
    rng = np.random.default_rng(2)
    shape = (64, 3)
    x_init = rng.standard_normal(shape)

    solver = make_dpm_solver("linear", T, S, B0, B1,
                             algorithm="dpmsolver++")
    assert not solver.sde
    ts_oracle, traj_oracle = oracle_trajectory_ode(
        x_init, scripted_eps, T, S, B0, B1)
    np.testing.assert_array_equal(np.asarray(solver.timesteps), ts_oracle)

    zeros = jnp.zeros(shape, jnp.float32)
    state = init_state(jnp.asarray(x_init, jnp.float32))
    for i in range(S):
        t = int(ts_oracle[i])
        eps = scripted_eps(np.asarray(state.sample, np.float64), t)
        state = solver_step(solver, state,
                            jnp.asarray(eps, jnp.float32), zeros)
        np.testing.assert_allclose(
            np.asarray(state.sample, np.float64), traj_oracle[i],
            rtol=2e-5, atol=2e-5,
            err_msg=f"ODE S={S} step {i} (t={t}) diverged from the "
                    f"diffusers-0.18.0 oracle")


@pytest.mark.parametrize("algorithm", ["sde-dpmsolver++", "dpmsolver++"])
def test_solver_converges_to_x0_with_true_eps(algorithm):
    """With the exact eps for a known x0 (VP parametrization), both
    algorithms must drive the sample to x0 as t -> 0 (sigma_0 ~ 6e-3)."""
    rng = np.random.default_rng(3)
    alpha_t, sigma_t, _ = oracle_tables(T, B0, B1)
    x0 = rng.standard_normal((32, 3))
    S = 50
    solver = make_dpm_solver("linear", T, S, B0, B1, algorithm=algorithm)
    t_hi = int(np.asarray(solver.timesteps)[0])
    z0 = rng.standard_normal((32, 3))
    x_init = alpha_t[t_hi] * x0 + sigma_t[t_hi] * z0

    state = init_state(jnp.asarray(x_init, jnp.float32))
    key = jax.random.PRNGKey(0)
    for i in range(S):
        t = int(np.asarray(solver.timesteps)[i])
        eps = (np.asarray(state.sample, np.float64)
               - alpha_t[t] * x0) / sigma_t[t]
        key, k = jax.random.split(key)
        z = (jax.random.normal(k, x0.shape) if algorithm.startswith("sde")
             else jnp.zeros(x0.shape, jnp.float32))
        state = solver_step(solver, state,
                            jnp.asarray(eps, jnp.float32), z)
    got = np.asarray(state.sample, np.float64)
    err = np.abs(got - x0).max()
    assert err < 0.05, f"{algorithm}: final sample off x0 by {err}"


def test_branches_are_exercised():
    """Pin the branch structure: S=8 must use 1st order at steps 0 and S-1
    (lower_order_final), 2nd order in between; S=50 must use 2nd order at
    the final step. Verified by comparing against oracles with the branch
    forced the other way."""
    rng = np.random.default_rng(1)
    shape = (16, 3)
    x_init = rng.standard_normal(shape)

    for S, final_first in [(8, True), (50, False)]:
        noises = rng.standard_normal((S,) + shape)
        solver = make_dpm_solver("linear", T, S, B0, B1)
        state = init_state(jnp.asarray(x_init, jnp.float32))
        ts = np.asarray(solver.timesteps)
        for i in range(S):
            eps = scripted_eps(np.asarray(state.sample, np.float64),
                               int(ts[i]))
            prev = state
            state = solver_step(solver, state,
                                jnp.asarray(eps, jnp.float32),
                                jnp.asarray(noises[i], jnp.float32))
        # recompute final step by hand both ways
        alpha_t, sigma_t, lam = oracle_tables(T, B0, B1)
        t = int(ts[-1])
        x = np.asarray(prev.sample, np.float64)
        m0 = (x - sigma_t[t] * eps) / alpha_t[t]
        h = lam[0] - lam[t]
        first = ((sigma_t[0] / sigma_t[t]) * np.exp(-h) * x
                 + alpha_t[0] * (1 - np.exp(-2 * h)) * m0
                 + sigma_t[0] * np.sqrt(1 - np.exp(-2 * h)) * noises[-1])
        m1 = np.asarray(prev.prev_m, np.float64)
        h0 = float(lam[t] - np.asarray(prev.prev_lambda, np.float64))
        d1 = (m0 - m1) / (h0 / h)
        second = first + 0.5 * alpha_t[0] * (1 - np.exp(-2 * h)) * d1
        got = np.asarray(state.sample, np.float64)
        want, other = (first, second) if final_first else (second, first)
        assert np.allclose(got, want, rtol=2e-5, atol=2e-5)
        assert not np.allclose(got, other, rtol=2e-5, atol=2e-5)
