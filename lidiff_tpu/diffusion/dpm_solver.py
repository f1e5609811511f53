"""DPM-Solver++(2M, SDE) as a pure-JAX multistep state machine.

Re-derivation of the fast sampler the reference drives through
diffusers.DPMSolverMultistepScheduler(algorithm_type='sde-dpmsolver++',
solver_order=2) (/root/reference/lidiff/models/models.py:65-73,141).
Formulas follow DPM-Solver++ (Lu et al., 2022, arXiv:2211.01095) with the
SDE variant's noise injection; the data-prediction ("++") parametrization
converts the epsilon prediction to x0 first.

Update rules (h = lam_next - lam_cur, lam = log(alpha/sigma)):

  1st order:
    x <- (sig_n / sig_c) * exp(-h) * x
         + alpha_n * (1 - exp(-2h)) * x0
         + sig_n * sqrt(1 - exp(-2h)) * z
  2nd order multistep (midpoint), with r = h_prev / h and
  D1 = (m0 - m1) / r:
    x <- ... same leading terms with x0 -> m0 ... + 0.5 * alpha_n *
         (1 - exp(-2h)) * D1 + noise term

Step-index schedule matches diffusers' set_timesteps: linspace over the
train range, rounded, descending.  The first step (no history) and — for
short schedules (< 15 steps) — the final step drop to first order
(lower_order_final behavior).

Everything is shaped for `lax.scan`: the carry holds (sample, previous model
output, previous lambda, step counter), so the whole sampling loop jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from lidiff_tpu.diffusion.schedules import make_betas


@struct.dataclass
class DPMSolver:
    """Static tables for a fixed (t_steps, s_steps) schedule."""
    timesteps: jnp.ndarray       # [S] int32, descending
    alpha_t: jnp.ndarray         # [T] sqrt(alphas_cumprod)
    sigma_t: jnp.ndarray         # [T] sqrt(1 - alphas_cumprod)
    lambda_t: jnp.ndarray        # [T]
    lower_order_final: bool = struct.field(pytree_node=False, default=True)
    #: True = 'sde-dpmsolver++' (the reference's algorithm_type,
    #: models.py:65-73); False = deterministic 'dpmsolver++' (the other
    #: algorithm the diffusers scheduler exposes) — same multistep
    #: machinery, no noise injection, ODE probability-flow update
    sde: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def value_key(self):
        """Hashable identity of the schedule VALUE (used to cache compiled
        sampling closures — `id()` of a dead solver can be recycled and
        would silently reuse stale coefficient tables)."""
        import numpy as _np
        return (self.num_steps, self.lower_order_final, self.sde,
                bytes(_np.asarray(self.timesteps).tobytes()),
                bytes(_np.asarray(self.lambda_t).tobytes()))


def make_dpm_solver(name: str, t_steps: int, s_steps: int,
                    beta_start: float | None = None,
                    beta_end: float | None = None,
                    algorithm: str = "sde-dpmsolver++") -> DPMSolver:
    assert algorithm in ("sde-dpmsolver++", "dpmsolver++"), algorithm
    betas = make_betas(name, t_steps, beta_start, beta_end).astype(np.float64)
    ac = np.cumprod(1.0 - betas)
    alpha_t = np.sqrt(ac)
    sigma_t = np.sqrt(1.0 - ac)
    lam = np.log(alpha_t) - np.log(sigma_t)
    ts = (np.linspace(0, t_steps - 1, s_steps + 1).round()[::-1][:-1]
          .astype(np.int32))
    return DPMSolver(
        timesteps=jnp.asarray(ts),
        alpha_t=jnp.asarray(alpha_t, jnp.float32),
        sigma_t=jnp.asarray(sigma_t, jnp.float32),
        lambda_t=jnp.asarray(lam, jnp.float32),
        sde=(algorithm == "sde-dpmsolver++"),
    )


@struct.dataclass
class SolverState:
    sample: jnp.ndarray      # current x (offset space in LiDiff)
    prev_m: jnp.ndarray      # model output (x0 prediction) at previous step
    prev_lambda: jnp.ndarray  # [] lambda at previous step
    step: jnp.ndarray        # [] int32 — index into solver.timesteps


def init_state(sample: jnp.ndarray) -> SolverState:
    return SolverState(sample=sample, prev_m=jnp.zeros_like(sample),
                       prev_lambda=jnp.float32(0.0),
                       step=jnp.int32(0))


def _coeffs_at(solver: DPMSolver, t: jnp.ndarray):
    return solver.alpha_t[t], solver.sigma_t[t], solver.lambda_t[t]


def solver_step(solver: DPMSolver, state: SolverState,
                eps_pred: jnp.ndarray, noise: jnp.ndarray) -> SolverState:
    """Advance one step of DPM-Solver++(2M, SDE).

    Args:
      eps_pred: the model's noise prediction at timestep
        solver.timesteps[state.step], same shape as sample.
      noise: standard normal, same shape as sample.
    """
    S = solver.num_steps
    i = state.step
    t_cur = solver.timesteps[i]
    # prev_timestep = 0 on the last step
    t_next = jnp.where(i == S - 1, 0, solver.timesteps[
        jnp.minimum(i + 1, S - 1)])

    a_c, s_c, l_c = _coeffs_at(solver, t_cur)
    a_n, s_n, l_n = _coeffs_at(solver, t_next)

    # epsilon -> x0 ("++" data prediction)
    m0 = (state.sample - s_c * eps_pred) / a_c

    h = l_n - l_c
    if solver.sde:
        exp_h = jnp.exp(-h)
        one_m = 1.0 - jnp.exp(-2.0 * h)
        lead = (s_n / s_c) * exp_h * state.sample
        noise_term = s_n * jnp.sqrt(jnp.maximum(one_m, 0.0)) * noise
        first = lead + a_n * one_m * m0 + noise_term
        corr = 0.5 * a_n * one_m
    else:
        # deterministic 'dpmsolver++' (probability-flow ODE):
        #   x <- (sig_n / sig_c) x - alpha_n (exp(-h) - 1) D0
        #        - 0.5 alpha_n (exp(-h) - 1) D1
        one_m = 1.0 - jnp.exp(-h)                  # = -(exp(-h) - 1)
        first = (s_n / s_c) * state.sample + a_n * one_m * m0
        corr = 0.5 * a_n * one_m

    # 2nd order correction using the previous model output
    h_prev = l_c - state.prev_lambda
    r = h_prev / jnp.where(h == 0, 1.0, h)
    d1 = (m0 - state.prev_m) / jnp.where(r == 0, 1.0, r)
    second = first + corr * d1

    use_first = (i == 0)
    if solver.lower_order_final and S < 15:
        use_first = use_first | (i == S - 1)
    new_sample = jnp.where(use_first, first, second)

    return SolverState(sample=new_sample, prev_m=m0, prev_lambda=l_c,
                       step=i + 1)


def sample_loop(solver: DPMSolver, x_init: jnp.ndarray,
                eps_fn, key: jax.Array) -> jnp.ndarray:
    """Run the full solver loop as `lax.scan`.

    Args:
      x_init: initial sample (offset space), any shape.
      eps_fn: (sample, t_scalar_int32) -> eps prediction (same shape).
      key: PRNG key for the SDE noise injections.
    Returns: final sample.
    """
    S = solver.num_steps

    def body(carry, i):
        state, k = carry
        k, k1 = jax.random.split(k)
        t = solver.timesteps[i]
        eps = eps_fn(state.sample, t)
        z = jax.random.normal(k1, state.sample.shape, state.sample.dtype)
        state = solver_step(solver, state, eps, z)
        return (state, k), None

    (state, _), _ = jax.lax.scan(body, (init_state(x_init), key),
                                 jnp.arange(S))
    return state.sample
