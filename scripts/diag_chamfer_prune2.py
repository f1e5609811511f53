"""Sweep prune-window geometries (anchor stride, window rows, anchor bias)
for the chamfer-scale matcher directions; prints resulting survivor-count
distributions. CPU-only prolog math, no Pallas.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import keys as K
from lidiff_tpu.ops.pallas_knn import QTILE, RBLK
from lidiff_tpu.ops.chamfer import _adaptive_res

N = int(os.environ.get("DIAG_N", 180_000))
UP = 6
rng = np.random.default_rng(0)
az = rng.uniform(0, 2 * np.pi, N)
r = rng.uniform(3, 48, N)
pts = np.stack([r * np.cos(az), r * np.sin(az),
                rng.uniform(-2.5, 2.5, N)], -1).astype(np.float32)
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
    qh, ql, _ = K.pack(zb(qi.shape[0]), qi)
    qh, ql, qi0, qi1, qi2 = K.lexsort(qh, ql, qi[:, 0], qi[:, 1], qi[:, 2])
    q_sorted = jnp.stack([zb(qi.shape[0]), qi0, qi1, qi2], 1)
    return q_sorted, t_sorted


import functools


@functools.partial(jax.jit, static_argnames=("U", "stride"))
def _u2_window(qs_pad, ts, rsq, anchors_pos, U: int, stride: int):
    """u^2 per query from a U-row ref window anchored per `stride` queries
    at (insertion point - U//2), block-aligned to 128."""
    Vr = ts.shape[0]
    na = anchors_pos.shape[0]
    a0 = jnp.clip(anchors_pos - U // 2, 0, max(Vr - U, 0))
    nb = Vr // 128
    tbl = jnp.concatenate([ts, rsq[:, None]], 1)[:nb * 128].reshape(nb, 128, 5)
    blk = jnp.clip(a0[:, None] // 128 + jnp.arange(U // 128)[None, :],
                   0, nb - 1)
    uw = tbl[blk].reshape(na, U, 5)
    uw_xyz = uw[:, :, 1:4].astype(jnp.float32)
    ursq = uw[:, :, 4].astype(jnp.float32)
    qt = qs_pad.reshape(na, stride, 4).astype(jnp.float32)
    cross = jnp.einsum("ntc,nuc->ntu", qt[:, :, 1:], uw_xyz,
                       preferred_element_type=jnp.float32)
    d = ursq[:, None, :] - 2.0 * cross
    qsq = jnp.sum(qt[:, :, 1:] * qt[:, :, 1:], axis=-1)
    return (jnp.min(d, axis=2) + qsq).reshape(-1)


def diag(tag, qs, ts, U, stride):
    Vq, Vr = qs.shape[0], ts.shape[0]
    T = QTILE
    nq = -(-Vq // T)
    R = min(RBLK, -(-Vr // 128) * 128)
    nr = -(-Vr // R)
    # pad queries to tile multiple with repeat of last (valid mask all true
    # for simplicity; padding duplicates an existing query so bounds stay
    # meaningful)
    pad = nq * T - Vq
    qs_pad = jnp.concatenate([qs, jnp.repeat(qs[-1:], pad, 0)], 0)
    rsq = jnp.sum(ts[:, 1:] * ts[:, 1:], axis=-1)
    r_hi, r_lo, _ = K.pack(ts[:, 0], ts[:, 1:])
    anchors = qs_pad[::stride]
    a_hi, a_lo, _ = K.pack(anchors[:, 0], anchors[:, 1:4])
    pos, _ = K.searchsorted_pair(r_hi, r_lo, a_hi, a_lo)
    u2 = _u2_window(qs_pad, ts, rsq, pos, U, stride)
    u2m = jnp.max(u2.reshape(nq, T), axis=1) + 8.0
    q_hi, _, _ = K.pack(qs_pad[:, 0], qs_pad[:, 1:4])
    q_hi = q_hi.reshape(nq, T)
    th0 = jnp.min(q_hi, axis=1)
    th1 = jnp.max(q_hi, axis=1)
    rh = jnp.pad(r_hi, (0, nr * R - Vr), constant_values=K.HI_PAD)
    rh = rh.reshape(nr, R)
    bh0 = jnp.min(rh, axis=1)
    bh1 = jnp.max(rh, axis=1)
    gap = jnp.maximum(bh0[None, :] - th1[:, None], th0[:, None] - bh1[None, :])
    gap = jnp.maximum(gap, 0).astype(jnp.float32)
    ok = (gap * gap <= u2m[:, None]).astype(jnp.int32)
    start = jnp.argmax(ok, axis=1)
    last = nr - 1 - jnp.argmax(ok[:, ::-1], axis=1)
    cnt = np.asarray(jnp.where(jnp.max(ok, axis=1) > 0, last - start + 1, 0))
    u2a = np.asarray(u2)
    print(f"[{tag}] U={U} stride={stride}: cnt max={cnt.max()} "
          f"mean={cnt.mean():.1f} p95={np.percentile(cnt,95):.0f} "
          f"p99={np.percentile(cnt,99):.0f} | u med={np.median(u2a)**0.5:.1f} "
          f"p99={np.percentile(u2a,99)**0.5:.1f} max={u2a.max()**0.5:.1f}")


qs1, ts1 = prep(up, gt)
qs2, ts2 = prep(gt, up)
for (U, stride) in [(512, 512), (512, 128), (1024, 128), (1024, 256),
                    (2048, 256), (2048, 128)]:
    diag("up->gt", qs1, ts1, U, stride)
    diag("gt->up", qs2, ts2, U, stride)
    print()
