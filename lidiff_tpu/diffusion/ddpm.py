"""DDPM coefficient tables, q-sampling and ancestral sampling steps.

Reference: /root/reference/lidiff/models/models.py:24-62 (coefficients),
:94-96 (q_sample — LiDiff's point-local offset formulation adds noise AROUND
each anchor point: x_t = x_0 + sqrt(1 - a_bar_t) * eps; the sqrt(a_bar_t)*x
term is applied to zeros, models.py:189).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from lidiff_tpu.diffusion.schedules import make_betas


@struct.dataclass
class DDPMCoeffs:
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_var: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def t_steps(self) -> int:
        return self.betas.shape[0]


def make_ddpm(name: str, t_steps: int, beta_start: float | None = None,
              beta_end: float | None = None) -> DDPMCoeffs:
    betas = make_betas(name, t_steps, beta_start, beta_end).astype(np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DDPMCoeffs(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas=f32(np.sqrt(1.0 / alphas)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
        posterior_variance=f32(post_var),
        posterior_log_var=f32(np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas)
                                 / (1.0 - ac)),
    )


def q_sample(coeffs: DDPMCoeffs, x: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0): standard DDPM form. In LiDiff's
    offset formulation the caller passes x = zeros and adds the result to the
    anchor points (reference models.py:189)."""
    sa = coeffs.sqrt_alphas_cumprod[t][:, None, None]
    so = coeffs.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    return sa * x + so * noise


def p_step(coeffs: DDPMCoeffs, x_t: jnp.ndarray, eps_pred: jnp.ndarray,
           t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """One ancestral (posterior) DDPM step in offset space:
    mu = 1/sqrt(a_t) (x_t - beta_t / sqrt(1-abar_t) eps) + sigma_t * z."""
    b = coeffs.betas[t][:, None, None]
    sra = coeffs.sqrt_recip_alphas[t][:, None, None]
    so = coeffs.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    mean = sra * (x_t - b / so * eps_pred)
    sig = jnp.sqrt(coeffs.posterior_variance[t])[:, None, None]
    keep = (t > 0).astype(x_t.dtype)[:, None, None]
    return mean + keep * sig * noise
