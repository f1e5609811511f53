"""Diagnose the chamfer-scale prune quality: per-tile survivor-interval
counts for both matcher directions at the refine bench operating point.

CPU-only (the prolog is plain XLA); prints the cnt histogram and the
fraction of tiles whose interval exceeds MAXB (the compact-grid budget) —
if ANY tile exceeds it, nn_match_idx_pallas falls back to the full
(nq, nr) grid for the WHOLE call (ops/pallas_knn.py:407).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import keys as K
from lidiff_tpu.ops.pallas_knn import (MAXB, QTILE, RBLK, UWND, _prune_mask)
from lidiff_tpu.ops.chamfer import _adaptive_res

N = int(os.environ.get("DIAG_N", 180_000))
UP = 6
rng = np.random.default_rng(0)
az = rng.uniform(0, 2 * np.pi, N)
r = rng.uniform(3, 48, N)
pts = np.stack([r * np.cos(az), r * np.sin(az),
                rng.uniform(-2.5, 2.5, N)], -1).astype(np.float32)
# up cloud: point + small random offsets (fresh-init refiner regime)
off = rng.normal(0, 0.05, (N, UP, 3)).astype(np.float32)
up = (pts[:, None, :] + off).reshape(-1, 3)
gt = np.concatenate([pts, pts], 0)


def prep(q, t):
    q = jnp.asarray(q); t = jnp.asarray(t)
    res = _adaptive_res([(q, None), (t, None)])
    lim = 1279
    qi = jnp.clip(jnp.round(q / res).astype(jnp.int32), -lim, lim)
    ti = jnp.clip(jnp.round(t / res).astype(jnp.int32), -lim, lim)
    zb = lambda n: jnp.zeros((n,), jnp.int32)
    th, tl, _ = K.pack(zb(ti.shape[0]), ti)
    th, tl, ti0, ti1, ti2 = K.lexsort(th, tl, ti[:, 0], ti[:, 1], ti[:, 2])
    t_sorted = jnp.stack([zb(ti.shape[0]), ti0, ti1, ti2], 1)
    qh, ql, qi0, qi1, qi2 = K.lexsort(*K.pack(zb(qi.shape[0]), qi)[:2],
                                      qi[:, 0], qi[:, 1], qi[:, 2])
    q_sorted = jnp.stack([zb(qi.shape[0]), qi0, qi1, qi2], 1)
    return q_sorted, t_sorted


def diag(tag, qs, ts):
    Vq, Vr = qs.shape[0], ts.shape[0]
    T = QTILE
    nq = -(-Vq // T)
    R = min(RBLK, -(-Vr // 128) * 128)
    nr = -(-Vr // R)
    qc = jnp.pad(qs.astype(jnp.float32), ((0, nq * T - Vq), (0, 4)))
    q3 = qc.reshape(nq, T, 8)
    qm = jnp.pad(jnp.ones((Vq,), bool), (0, nq * T - Vq))
    rsq = jnp.sum(ts[:, 1:] * ts[:, 1:], axis=-1)
    _, start, cnt = _prune_mask(q3, qm, ts, rsq, nq, T, R, nr, Vr, False)
    cnt = np.asarray(cnt)
    print(f"[{tag}] Vq={Vq} Vr={Vr} nq={nq} nr={nr} "
          f"cnt: max={cnt.max()} mean={cnt.mean():.1f} p50={np.median(cnt):.0f} "
          f"p95={np.percentile(cnt, 95):.0f} p99={np.percentile(cnt, 99):.0f} "
          f">MAXB({MAXB}): {(cnt > MAXB).sum()}/{nq} tiles")
    return cnt


qs, ts = prep(up, gt)
diag("up->gt", qs, ts)
qs2, ts2 = prep(gt, up)
diag("gt->up", qs2, ts2)
