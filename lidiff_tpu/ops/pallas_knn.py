"""Fused Pallas TPU kernel for the batched 1-NN conditioning match.

Replaces the XLA path of `ops.knn.nn_match_idx` (itself the TPU rebuild of
the reference's PyKeOps `argKmin(1)` match,
/root/reference/lidiff/models/minkunet.py:403-418). The XLA path
materializes each [block, V_ref] distance tile in HBM between the GEMM and
the argmin (~10+ GB per denoiser forward across the 5 level matches); here
the distance tile lives only in VMEM: the grid runs (query tiles, reference
blocks) with the reference dimension innermost, computing one [T, R] cross
GEMM on the MXU per step and folding it into a running (min, argmin)
carried in VMEM scratch — the flash-attention reduction pattern.

The reduction is VPU-bound, so the kernel minimizes full-[T, R] passes:

  * the invalid-reference penalty is folded into |r|^2 OUTSIDE the kernel
    (one prolog add on [Vr]), and the batch-id compare is skipped entirely
    when the caller declares a single-sample batch (`n_batch=1`, the
    sampling pipeline's case) — penalties cost zero in-kernel passes;
  * distances are exact integers (voxel coordinates are small ints, so
    the |r|^2 - 2 q.r + |q|^2 form is exact in f32 up to 2^24, far above
    the max in-crop distance^2), so ONE int32 pack `d * 16 + register_group`
    survives the cheap register-tree min reduction with its coarse index
    intact; the lane is recovered from the surviving [T, 128] tile.  The
    pack keeps first-index tie-breaking exact: candidates with minimal d
    resolve to the smallest register group (packed low bits), then the
    smallest lane (final masked-iota pass), i.e. the smallest in-block
    index — matching XLA argmin.

Batch/validity semantics and the selected indices match the XLA path
exactly (strictly-less updates across blocks keep the earliest block on
distance ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e18
QTILE = 512
RBLK = 2048
_PEN = float(2 ** 24)      # invalid-ref distance offset (> any valid d^2)
_PENB = float(2 ** 25)     # cross-batch distance (> any penalized d^2)


def _make_kernel(T: int, R: int, nr: int, batched: bool):
    ng = R // 128

    def kernel(q_ref, rx_ref, rsq_ref, o_ref, dbest, ibest):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dbest[:] = jnp.full((T, 1), jnp.int32(2 ** 30))
            ibest[:] = jnp.zeros((T, 1), jnp.int32)

        q = q_ref[0]                                 # [T, 8] f32
        q_xyz = q[:, 1:4]
        qsq = jnp.sum(q_xyz * q_xyz, axis=1, keepdims=True)  # [T, 1]
        rx = rx_ref[:]                               # [8, R]
        cross = jax.lax.dot_general(
            q_xyz, rx[1:4],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [T, R]
        # exact nonnegative int-valued distance^2; invalid refs carry +2^24
        # from the prolog fold
        d = (qsq + rsq_ref[0][None, :]) - 2.0 * cross
        if batched:
            q_b = q[:, 0:1]
            d = jnp.where(q_b != rx[4][None, :], jnp.float32(_PENB), d)
        gid = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1) // 128
        e = d.astype(jnp.int32) * 16 + gid           # packed (d, group)
        # register-tree min keeps the packed group; lexicographic
        # (d, group) order == first-index order at the group granularity
        r1 = jnp.min(e.reshape(T, ng, 128), axis=1)  # [T, 128]
        m = jnp.min(r1, axis=1, keepdims=True)       # [T, 1] packed
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        lane = jnp.min(jnp.where(r1 == m, lane_iota, jnp.int32(2 ** 30)),
                       axis=1, keepdims=True)        # [T, 1]
        dm = m // 16                                 # unpacked distance
        ib = (m - dm * 16) * 128 + lane              # in-block index
        better = dm < dbest[:]                       # strictly-less: ties
        dbest[:] = jnp.where(better, dm, dbest[:])   # keep earliest block
        ibest[:] = jnp.where(better, ib + j * R, ibest[:])

        @pl.when(j == nr - 1)
        def _fin():
            o_ref[0, 0] = ibest[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "n_batch"))
def nn_match_idx_pallas(q_coords: jnp.ndarray, q_mask: jnp.ndarray,
                        r_coords: jnp.ndarray, r_mask: jnp.ndarray,
                        *, interpret: bool = False,
                        n_batch: int = 0) -> jnp.ndarray:
    """For each query voxel, the index of the nearest reference voxel.

    Same contract as ops.knn.nn_match_idx (indices arbitrary for invalid
    queries; callers mask downstream).  `n_batch=1` statically removes the
    per-element batch compare (0 = unknown, keep it).
    """
    Vq = q_coords.shape[0]
    Vr = r_coords.shape[0]
    T = QTILE
    nq = -(-Vq // T)
    R = min(RBLK, -(-Vr // 128) * 128)
    nr = -(-Vr // R)
    Vrp = nr * R

    qc = jnp.pad(q_coords.astype(jnp.float32),
                 ((0, nq * T - Vq), (0, 4)))         # [nqT, 8]
    q3 = qc.reshape(nq, T, 8)

    rc = r_coords.astype(jnp.float32)
    r_xyz = rc[:, 1:]
    rsq = jnp.sum(r_xyz * r_xyz, axis=-1)
    rsq = rsq + (~r_mask).astype(jnp.float32) * _PEN
    # rx rows: 0 unused, 1..3 xyz^T, 4 batch id, 5-7 pad
    rx = jnp.stack([
        jnp.zeros((Vr,), jnp.float32), r_xyz[:, 0], r_xyz[:, 1],
        r_xyz[:, 2], rc[:, 0], jnp.zeros((Vr,), jnp.float32),
        jnp.zeros((Vr,), jnp.float32), jnp.zeros((Vr,), jnp.float32),
    ])                                               # [8, Vr]
    rx = jnp.pad(rx, ((0, 0), (0, Vrp - Vr)))
    rsq = jnp.pad(rsq, (0, Vrp - Vr),
                  constant_values=_PEN).reshape(1, Vrp)  # pad refs invalid

    kernel = _make_kernel(T, R, nr, n_batch != 1)
    out = pl.pallas_call(
        kernel,
        grid=(nq, nr),
        in_specs=[
            pl.BlockSpec((1, T, 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((8, R), lambda i, j: (0, j)),
            pl.BlockSpec((1, R), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, T), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nq, 1, T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((T, 1), jnp.int32),
                        pltpu.VMEM((T, 1), jnp.int32)],
        interpret=interpret,
    )(q3, rx, rsq)
    return out.reshape(-1)[:Vq]
