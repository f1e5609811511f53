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

Distances use the same |r|^2 - 2 q.r decomposition with exact f32
arithmetic (voxel coordinates are small ints, so products are exact in
f32) and the same tie-breaking (first minimum overall: strictly-less
updates across blocks, first-index ties within a block) and batch/validity
penalties as the XLA path, so the selected indices match it exactly.
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


def _make_kernel(T: int, R: int, nr: int):

    def kernel(q_ref, rx_ref, rsq_ref, o_ref, mbest, ibest):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            mbest[:] = jnp.full((T, 1), jnp.float32(_BIG * 2))
            ibest[:] = jnp.zeros((T, 1), jnp.int32)

        q = q_ref[0]                                 # [T, 8] f32
        q_xyz = q[:, 1:4]
        q_b = q[:, 0:1]
        rx = rx_ref[:]                               # [8, R]
        cross = jax.lax.dot_general(
            q_xyz, rx[1:4],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [T, R]
        d = rsq_ref[0][None, :] - 2.0 * cross
        r_b = rx[4]
        r_bad = rx[5]
        d = jnp.where((q_b != r_b[None, :]) | (r_bad[None, :] != 0),
                      jnp.float32(_BIG), d)
        m = jnp.min(d, axis=1, keepdims=True)        # [T, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
        li = jnp.min(jnp.where(d == m, iota, jnp.int32(2 ** 30)),
                     axis=1, keepdims=True)          # [T, 1]
        better = m < mbest[:]
        mbest[:] = jnp.where(better, m, mbest[:])
        ibest[:] = jnp.where(better, li + j * R, ibest[:])

        @pl.when(j == nr - 1)
        def _fin():
            o_ref[0, 0] = ibest[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_match_idx_pallas(q_coords: jnp.ndarray, q_mask: jnp.ndarray,
                        r_coords: jnp.ndarray, r_mask: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """For each query voxel, the index of the nearest reference voxel.

    Same contract as ops.knn.nn_match_idx (indices arbitrary for invalid
    queries; callers mask downstream).
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
    # rx rows: 0 unused, 1..3 xyz^T, 4 batch id, 5 invalid flag, 6-7 pad
    rx = jnp.stack([
        jnp.zeros((Vr,), jnp.float32), r_xyz[:, 0], r_xyz[:, 1],
        r_xyz[:, 2], rc[:, 0], (~r_mask).astype(jnp.float32),
        jnp.zeros((Vr,), jnp.float32), jnp.zeros((Vr,), jnp.float32),
    ])                                               # [8, Vr]
    rx = jnp.pad(rx, ((0, 0), (0, Vrp - Vr)))
    rx = rx.at[5, Vr:].set(1.0)                      # pad refs invalid
    rsq = jnp.pad(rsq, (0, Vrp - Vr)).reshape(1, Vrp)

    kernel = _make_kernel(T, R, nr)
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
        scratch_shapes=[pltpu.VMEM((T, 1), jnp.float32),
                        pltpu.VMEM((T, 1), jnp.int32)],
        interpret=interpret,
    )(q3, rx, rsq)
    return out.reshape(-1)[:Vq]
