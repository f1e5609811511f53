"""Differentiable Chamfer distance on TPU.

Replaces pytorch3d.loss.chamfer_distance (reference
/root/reference/lidiff/models/models_refine.py:11,72): squared-L2, mean over
points, summed over both directions, mean over batch.

Strategy: a non-differentiable blocked 1-NN *index* pass, then a
differentiable gather + distance — the same structure pytorch3d uses
(knn_points + gather), so gradients flow to both clouds without
differentiating through the argmin scan.

Two index passes are available:

* "exact": running argmin over target tiles (MXU cross terms). O(N*M) —
  at the refine training operating point (360k x 360k) this is seconds
  per direction on a v5e because the K=3 GEMM wastes 125/128 of every
  MXU pass and every tile pair is visited.
* "grid": quantize both clouds to a fine integer grid and reuse the
  production block-pruned 1-NN voxel matcher
  (ops/knn.nn_match_idx -> Pallas on TPU). The *index* is the argmin of
  voxel-center distances, so a pick can differ from the true NN only
  among targets within 2*sqrt(3)*res of it; the loss then gathers TRUE
  float coordinates, bounding the loss error by O(res * d). Measured on
  real-scale scan clouds the loss delta is <1e-3 relative (see
  tests/test_chamfer.py::test_grid_matches_exact_loss).

  The grid resolution is ADAPTIVE by default: the joint bounding box of
  both (masked) clouds is scaled to fill the matcher's exact-arithmetic
  coordinate range, so the relative error bound is scale-free —
  res_eff = extent / 1279 (≈ 3.9 cm for 50 m crops, ≈ 0.8 mm for
  unit-normalized clouds). This matters because dataset_norm /
  std_axis_norm configs feed unit-scale coordinates to the refine loss;
  an absolute metric grid would silently degrade their NN picks.
  LIDIFF_CHAMFER_RES overrides with an absolute resolution.

`method="auto"` (default) uses "grid" when N*M is large enough for the
quantized pick to pay for its sorts, "exact" otherwise — training flips
to the grid path, unit-scale tests keep brute force. Override globally
with LIDIFF_CHAMFER=exact|grid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)

#: quantization for the grid index pass. None (default) = adaptive: scale
#: the joint cloud extent to fill the usable integer range. The binding
#: range is NOT the 12-bit packed-coordinate span (+-2047) but the Pallas
#: matcher's f32-exactness bound |c| <= pallas_knn.COORD_LIM = 1280
#: (beyond it the kernel's packed argmin silently corrupts indices).
#: LIDIFF_CHAMFER_RES sets an absolute resolution instead.
_env_res = os.environ.get("LIDIFF_CHAMFER_RES")
GRID_RES: float | None = float(_env_res) if _env_res else None
#: auto threshold: N*M distance pairs above which the grid path wins
_AUTO_GRID_PAIRS = 1 << 26


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


def _grid_lim() -> int:
    """Usable integer coordinate range of the matcher: the tighter of the
    12-bit pack span and the Pallas kernel's f32-exactness bound (beyond
    pallas_knn.COORD_LIM the packed argmin is silently wrong, not just
    approximate)."""
    from lidiff_tpu.ops import keys as K
    from lidiff_tpu.ops.pallas_knn import COORD_LIM
    return min(COORD_LIM - 1, int(K.COORD_MAX))


def _adaptive_res(clouds_and_masks) -> jnp.ndarray:
    """Grid step that scales the joint (masked) cloud extent to fill the
    usable integer range — the quantization error is then relative to
    extent, not absolute, so unit-normalized coordinates (dataset_norm /
    std_axis_norm) quantize as finely as metric ones."""
    m = jnp.float32(0)
    for pts, mask in clouds_and_masks:
        a = jnp.max(jnp.abs(pts), axis=-1)
        if mask is not None:
            a = jnp.where(mask, a, 0.0)
        m = jnp.maximum(m, jnp.max(a))
    return jnp.maximum(m, 1e-9) / _grid_lim()


def nn_indices_grid(query: jnp.ndarray, target: jnp.ndarray,
                    target_mask: jnp.ndarray | None = None,
                    query_mask: jnp.ndarray | None = None,
                    res: float | jnp.ndarray | None = GRID_RES,
                    n_batch: int = 1) -> jnp.ndarray:
    """Batched near-NN indices via the block-pruned voxel matcher.

    query: [B*N, 3] float, target: [B*M, 3] float, both flattened
    batch-major; batch membership is encoded as the packed batch
    coordinate (rows i belong to batch i // per_batch). Returns [B*N]
    int32 GLOBAL indices into the flattened target array (same-batch by
    construction when the batch has any valid target).

    `res`: grid step — a static float, a traced scalar, or None for
    adaptive (extent-scaled, see _adaptive_res; both clouds share it).

    Coordinates outside the packable range are CLAMPED to it: the pick
    for such a point degrades gracefully (a near-boundary candidate)
    instead of being dropped; the caller gathers true coordinates so the
    loss stays finite and meaningful.
    """
    from lidiff_tpu.ops import keys as K
    from lidiff_tpu.ops.knn import nn_match_idx

    Nq = query.shape[0]
    Mt = target.shape[0]
    qb = (jnp.arange(Nq, dtype=jnp.int32) * n_batch) // Nq
    tb = (jnp.arange(Mt, dtype=jnp.int32) * n_batch) // Mt
    lim = _grid_lim()
    if res is None:
        res = _adaptive_res([(query, query_mask), (target, target_mask)])
    qi = jnp.clip(jnp.round(query / res).astype(jnp.int32), -lim, lim)
    ti = jnp.clip(jnp.round(target / res).astype(jnp.int32), -lim, lim)
    qm = (jnp.ones((Nq,), bool) if query_mask is None else query_mask)
    tm = (jnp.ones((Mt,), bool) if target_mask is None else target_mask)

    # lex-sort both sides by packed key: the matcher's block pruning
    # anchors on sorted refs and tile-coherent queries
    th, tl, _ = K.pack(tb, ti)
    th, tl, t_perm, ti_s0, ti_s1, ti_s2, tb_s, tm_s = K.lexsort(
        th, tl, jnp.arange(Mt, dtype=jnp.int32),
        ti[:, 0], ti[:, 1], ti[:, 2], tb, tm)
    t_sorted = jnp.stack([tb_s, ti_s0, ti_s1, ti_s2], axis=1)

    qh, ql, _ = K.pack(qb, qi)
    qh, ql, q_perm, qi_s0, qi_s1, qi_s2, qb_s, qm_s = K.lexsort(
        qh, ql, jnp.arange(Nq, dtype=jnp.int32),
        qi[:, 0], qi[:, 1], qi[:, 2], qb, qm)
    q_sorted = jnp.stack([qb_s, qi_s0, qi_s1, qi_s2], axis=1)

    idx_sorted = nn_match_idx(q_sorted, qm_s, t_sorted, tm_s,
                              n_batch=n_batch)
    # back to original orders: result[q_perm[k]] = t_perm[idx_sorted[k]]
    out = jnp.zeros((Nq,), jnp.int32).at[q_perm].set(t_perm[idx_sorted])
    return jax.lax.stop_gradient(out)


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_mask: jnp.ndarray | None = None,
                     y_mask: jnp.ndarray | None = None,
                     method: str | None = None,
                     grid_res: float | None = GRID_RES) -> jnp.ndarray:
    """Batched symmetric squared-L2 chamfer, pytorch3d semantics
    (mean over points each direction, sum of directions, mean over batch).

    x: [B, N, 3], y: [B, M, 3]. `method`: "exact" | "grid" | "auto"
    (None reads LIDIFF_CHAMFER, default "auto" — see module docstring).
    `grid_res`: None = adaptive (extent-scaled; scale-free error bound).
    """
    if method is None:
        method = os.environ.get("LIDIFF_CHAMFER", "auto")
    if method == "auto":
        method = ("grid" if x.shape[1] * y.shape[1] >= _AUTO_GRID_PAIRS
                  else "exact")
    if method == "grid":
        return _chamfer_grid(x, y, x_mask, y_mask, grid_res)

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


def _chamfer_grid(x, y, x_mask, y_mask, res):
    """Grid-index chamfer: one flattened-batch matcher call per direction
    (the matcher separates batches via the packed batch coordinate)."""
    B, N = x.shape[:2]
    M = y.shape[1]
    xf = x.reshape(B * N, 3)
    yf = y.reshape(B * M, 3)
    mx = None if x_mask is None else x_mask.reshape(B * N)
    my = None if y_mask is None else y_mask.reshape(B * M)
    if res is None:
        # one shared adaptive step for both directions: the two matcher
        # calls must quantize identically or the symmetric loss would mix
        # two different grids
        res = _adaptive_res([(xf, mx), (yf, my)])
    ix = nn_indices_grid(xf, yf, my, mx, res, n_batch=B)
    iy = nn_indices_grid(yf, xf, mx, my, res, n_batch=B)
    d_xy = jnp.sum((xf - yf[ix]) ** 2, -1).reshape(B, N)
    d_yx = jnp.sum((yf - xf[iy]) ** 2, -1).reshape(B, M)
    if x_mask is not None:
        d_xy = jnp.where(x_mask, d_xy, 0)
        nx = jnp.maximum(jnp.sum(x_mask, axis=1), 1)
    else:
        nx = N
    if y_mask is not None:
        d_yx = jnp.where(y_mask, d_yx, 0)
        ny = jnp.maximum(jnp.sum(y_mask, axis=1), 1)
    else:
        ny = M
    vals = jnp.sum(d_xy, axis=1) / nx + jnp.sum(d_yx, axis=1) / ny
    return jnp.mean(vals)
