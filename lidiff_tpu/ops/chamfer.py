"""Differentiable Chamfer distance on TPU.

Replaces pytorch3d.loss.chamfer_distance (reference
/root/reference/lidiff/models/models_refine.py:11,72): squared-L2, mean over
points, summed over both directions, mean over batch.

Strategy: a non-differentiable blocked 1-NN *index* pass (running argmin over
target tiles, MXU cross terms), then a differentiable gather + distance —
the same structure pytorch3d uses (knn_points + gather), so gradients flow
to both clouds without differentiating through the argmin scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


def _nn_idx_block(q, tgt, tile: int):
    """q: [Bq, 3]; tgt: [M, 3] (padded with inf-distance rows handled by
    caller via mask); returns argmin indices [Bq]."""
    M = tgt.shape[0]
    nt = M // tile

    def body(carry, j):
        best_d, best_i = carry
        t = jax.lax.dynamic_slice_in_dim(tgt, j * tile, tile, 0)
        cross = jnp.dot(q, t.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d = jnp.sum(t * t, -1)[None, :] - 2.0 * cross
        d_min = jnp.min(d, axis=1)
        i_min = jnp.argmin(d, axis=1).astype(jnp.int32) + j * tile
        upd = d_min < best_d
        return (jnp.where(upd, d_min, best_d),
                jnp.where(upd, i_min, best_i)), None

    init = (jnp.full((q.shape[0],), _BIG), jnp.zeros((q.shape[0],), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nt))
    return best_i


def nn_indices(query: jnp.ndarray, target: jnp.ndarray,
               target_mask: jnp.ndarray | None = None,
               q_block: int = 4096, t_tile: int = 8192) -> jnp.ndarray:
    """[N,3] x [M,3] -> [N] nearest-target indices (non-differentiable)."""
    N = query.shape[0]
    M = target.shape[0]
    t_tile = min(t_tile, M)
    pad_m = (-M) % t_tile
    tgt = jnp.pad(target, ((0, pad_m), (0, 0)), constant_values=1e15)
    if target_mask is not None:
        bad = jnp.pad(~target_mask, (0, pad_m), constant_values=True)
        tgt = jnp.where(bad[:, None], 1e15, tgt)
    q_block = min(q_block, N)
    pad_n = (-N) % q_block
    q = jnp.pad(query, ((0, pad_n), (0, 0)))
    q = q.reshape(-1, q_block, 3)
    idx = jax.lax.map(functools.partial(_nn_idx_block, tgt=tgt, tile=t_tile),
                      q)
    return jax.lax.stop_gradient(idx.reshape(-1)[:N])


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_mask: jnp.ndarray | None = None,
                     y_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched symmetric squared-L2 chamfer, pytorch3d semantics
    (mean over points each direction, sum of directions, mean over batch).

    x: [B, N, 3], y: [B, M, 3].
    """
    def one(args):
        xi, yi, mx, my = args
        ix = nn_indices(xi, yi, my)
        iy = nn_indices(yi, xi, mx)
        d_xy = jnp.sum((xi - yi[ix]) ** 2, -1)
        d_yx = jnp.sum((yi - xi[iy]) ** 2, -1)
        if mx is not None:
            d_xy = jnp.where(mx, d_xy, 0)
            nx = jnp.maximum(jnp.sum(mx), 1)
        else:
            nx = xi.shape[0]
        if my is not None:
            d_yx = jnp.where(my, d_yx, 0)
            ny = jnp.maximum(jnp.sum(my), 1)
        else:
            ny = yi.shape[0]
        return jnp.sum(d_xy) / nx + jnp.sum(d_yx) / ny

    B = x.shape[0]
    ones = lambda m, n: (jnp.ones((B, n), bool) if m is None else m)
    vals = jax.vmap(lambda xi, yi, mx, my: one((xi, yi, mx, my)))(
        x, y, ones(x_mask, x.shape[1]), ones(y_mask, y.shape[1]))
    return jnp.mean(vals)
