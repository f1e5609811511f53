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

The reduction is VPU-bound, so the kernel drives the per-element op count
to its floor and then prunes whole blocks:

  * the XLA path ranks by d = |r|^2 - 2 q.r (the per-query |q|^2 shift
    never changes an argmin).  Voxel coordinates are small ints
    (|c| <= ~1100 in-crop; exactness headroom to |c| <= 1280), so
    -2 q.r is integer-exact in f32 (< 2^24) straight out of the GEMM.
    Everything else is precomputed per REFERENCE COLUMN into one int32
    row: rsqo16[r] = (|r|^2 + OFFS + invalid*PEN) * 16 + lane_group(r),
    so the in-kernel work per [T, R] element is exactly
        e = int(cross) * 16 + rsqo16   (cast, shift, add)
    plus one compare in the min tree — 4 VPU ops (the committed round-2
    kernel spent ~7 and a [T,R] -> [T,ng,128] relayout).  OFFS keeps the
    packed value nonnegative; the *16 + group pack preserves exact
    first-index tie-breaking (min e == lexicographic (d, group), then the
    earliest lane inside the surviving [T, 128] tile).
  * the min tree is an unrolled 128-lane-aligned slice chain (no in-kernel
    reshape/relayout of the [T, R] tile).
  * EXACT block pruning (`prune=True`, on by default for big ref sets):
    a cheap XLA prolog computes, per query tile, an upper bound u^2 on
    every query's true NN distance from a U-row window of refs around the
    tile's key anchor (refs and queries are both lex-sorted, so key
    neighbors are spatial neighbors in x); a [T, R] block whose packed-key
    gap to the tile satisfies gap^2 > max_q u^2(q) provably contains no
    query's argmin (d >= gap > u >= d_best, strictly), so the kernel skips
    its GEMM + reduction entirely via a prefetched ok-mask.  Cross-batch
    blocks prune automatically (key gap >= COORD_SPAN).  The result is
    bit-identical to the unpruned kernel.  The mask is BIT-PACKED (one
    int32 word per 32 ref blocks) because scalar-prefetch operands live in
    SMEM (~1 MB): unpacked, the chamfer grid path's operating point
    (1.08M queries x 360k refs -> [2110, 176] int32) blows that budget;
    packed it is ~50 KB at any realistic size.

Batch/validity semantics and the selected indices match the XLA path
exactly (strictly-less updates across blocks keep the earliest block on
distance ties; `n_batch=1` statically removes the per-element batch
compare — the sampling pipeline's case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidiff_tpu.ops import keys as K

QTILE = 512
RBLK = 2048
UWND = 512                  # upper-bound window rows (prune prolog)
MAXB = 32                   # compact-grid ref-block budget per query tile
COMPACT_MIN_NR = 16         # compact grid only when nr exceeds this
COORD_LIM = 1280            # |coord| bound for f32-exact -2 q.r (< 2^24);
                            # BEYOND it packed e goes negative and the
                            # in-block index reconstruction breaks —
                            # callers quantizing floats (ops/chamfer
                            # grid path) must clamp to +-(COORD_LIM-1)
_OFFS = 2 * 3 * COORD_LIM * COORD_LIM    # >= max |2 q.r|: keeps e >= 0
_PEN = 1 << 25              # invalid-ref shift (> any valid shifted d)
_BIG = 1e18                 # XLA-path penalty (prolog math only)


def _make_kernel(T: int, R: int, nr: int, batched: bool, prune: bool):
    ng = R // 128

    def kernel(*args):
        if prune:
            ok_ref, q_ref, rx_ref, rsqo_ref, o_ref, dbest, ibest = args
        else:
            q_ref, rx_ref, rsqo_ref, o_ref, dbest, ibest = args
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dbest[:] = jnp.full((T, 1), jnp.int32(2 ** 30))
            ibest[:] = jnp.zeros((T, 1), jnp.int32)

        def compute():
            q = q_ref[0]                             # [T, 8] f32
            rx = rx_ref[:]                           # [8, R] rows 1..3=-2xyz
            cross = jax.lax.dot_general(
                q[:, 1:4], rx[1:4],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # = -2 q.r, exact
            e = cross.astype(jnp.int32) * 16 + rsqo_ref[0][None, :]
            if batched:
                e = jnp.where(q[:, 0:1] != rx[4][None, :],
                              jnp.int32(2 ** 30), e)
            # unrolled lane-aligned min tree (slices are free; no relayout)
            r1 = e[:, 0:128]
            for k in range(1, ng):
                r1 = jnp.minimum(r1, e[:, k * 128:(k + 1) * 128])
            m = jnp.min(r1, axis=1, keepdims=True)   # [T, 1] packed
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
            lane = jnp.min(jnp.where(r1 == m, lane_iota,
                                     jnp.int32(2 ** 30)),
                           axis=1, keepdims=True)    # [T, 1]
            dm = m // 16                             # shifted distance
            ib = (m - dm * 16) * 128 + lane          # in-block index
            better = dm < dbest[:]                   # strictly-less: ties
            dbest[:] = jnp.where(better, dm, dbest[:])  # keep first block
            ibest[:] = jnp.where(better, ib + j * R, ibest[:])

        if prune:
            # ok is bit-packed and flattened: word i*nw + j // 32, bit
            # j % 32 (arithmetic >> of a possibly-negative word then & 1
            # still reads the bit)
            nw = -(-nr // 32)
            bit = (ok_ref[i * nw + j // 32] >> (j % 32)) & 1
            pl.when(bit != 0)(compute)
        else:
            compute()

        @pl.when(j == nr - 1)
        def _fin():
            o_ref[0, 0] = ibest[:, 0]

    return kernel


def _make_kernel_compact(T: int, R: int, maxb: int, batched: bool):
    """Compact-grid variant: grid is (nq, maxb) and the j-th step visits
    ref block `start[i] + j` (scalar-prefetched per-tile interval) instead
    of iterating every block and skipping in-kernel. The surviving blocks
    of the gap prune are a CONTIGUOUS id range per tile — block key
    ranges are monotone under the lexsort, so the low-side prune decision
    is monotone decreasing in j and the high-side monotone increasing —
    which is what makes a (start, count) interval exact. At chamfer-grid
    scale (1.08M x 360k: 2110 x 176 blocks) the full grid pays ~1.8 us of
    pipeline overhead per (i, j) step with ~90% of steps skipped; the
    compact grid visits only the interval (measured 1307 -> ~250 ms for
    the two refine-loss matches)."""
    ng = R // 128

    def kernel(start_ref, cnt_ref, q_ref, rx_ref, rsqo_ref, o_ref, dbest,
               ibest):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dbest[:] = jnp.full((T, 1), jnp.int32(2 ** 30))
            ibest[:] = jnp.zeros((T, 1), jnp.int32)

        def compute():
            jb = start_ref[i] + j                    # actual block id
            q = q_ref[0]                             # [T, 8] f32
            rx = rx_ref[:]                           # [8, R]
            cross = jax.lax.dot_general(
                q[:, 1:4], rx[1:4],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            e = cross.astype(jnp.int32) * 16 + rsqo_ref[0][None, :]
            if batched:
                e = jnp.where(q[:, 0:1] != rx[4][None, :],
                              jnp.int32(2 ** 30), e)
            r1 = e[:, 0:128]
            for k in range(1, ng):
                r1 = jnp.minimum(r1, e[:, k * 128:(k + 1) * 128])
            m = jnp.min(r1, axis=1, keepdims=True)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
            lane = jnp.min(jnp.where(r1 == m, lane_iota,
                                     jnp.int32(2 ** 30)),
                           axis=1, keepdims=True)
            dm = m // 16
            ib = (m - dm * 16) * 128 + lane
            better = dm < dbest[:]                   # ascending block order
            dbest[:] = jnp.where(better, dm, dbest[:])  # => first-block ties
            ibest[:] = jnp.where(better, ib + jb * R, ibest[:])

        pl.when(j < cnt_ref[i])(compute)

        @pl.when(j == maxb - 1)
        def _fin():
            o_ref[0, 0] = ibest[:, 0]

    return kernel


def _prune_mask(q3, q_mask, r_coords, rsq_shift, nq, T, R, nr, Vr,
                batched):
    """ok[i, j]: may ref block j contain some tile-i query's 1-NN?

    Upper bound u^2 per query from a UWND-row ref window anchored by
    key-order binary search; block gap from packed hi keys
    (batch * COORD_SPAN + x), which lower-bounds the geometric distance
    within a batch and auto-prunes cross-batch blocks.
    """
    U = UWND
    rc = r_coords
    r_hi, r_lo, _ = K.pack(rc[:, 0], rc[:, 1:])
    q_all = q3.reshape(nq * T, 8)
    qi = q_all[::T].astype(jnp.int32)                 # tile-first queries
    a_hi, a_lo, _ = K.pack(qi[:, 0], qi[:, 1:4])
    pos, _ = K.searchsorted_pair(r_hi, r_lo, a_hi, a_lo)   # [nq]
    a0 = jnp.clip(pos - U // 4, 0, max(Vr - U, 0))
    # Block-aligned window: the TPU gather is ROW-rate-bound, so picking
    # nq*U individual rows costs ~128x more than picking nq*(U/128)
    # 128-row blocks of a [nb, 128, 5] table (coords + rsq stacked so one
    # gather serves both). Flooring the anchor to a block edge only SHIFTS
    # the window (never shrinks it below U rows / past Vr); any in-range
    # window yields a valid upper bound, so the prune mask stays exact.
    # Guard the block-table geometry locally (ADVICE r4): in-range
    # indexing of tbl[blk] relies on Vr >= UWND — currently enforced by
    # the non-local `prune = nr >= 3 and Vr >= UWND` gate in
    # nn_match_idx_pallas; a future caller or UWND bump must not be able
    # to create out-of-range block ids here. Note tbl truncates to
    # nb*128 rows: the Vr%128 tail refs are excluded from every
    # upper-bound window (exactness preserved — any in-range window is a
    # valid upper bound — pruning merely slightly weaker).
    assert Vr >= U, (Vr, U)
    nb = Vr // 128                                    # Vr-U clip => in range
    tbl = jnp.concatenate([rc, rsq_shift[:, None]], 1)[:nb * 128]
    tbl = tbl.reshape(nb, 128, 5)
    blk = a0[:, None] // 128 + jnp.arange(U // 128)[None, :]  # [nq, U/128]
    uw = tbl[blk].reshape(nq, U, 5)                   # [nq, U, 5] int32
    uw_xyz = uw[:, :, 1:4].astype(jnp.float32)
    ursq = uw[:, :, 4].astype(jnp.float32)            # rsq (+PEN invalid)
    qt = q3[:, :, 0:4]                                # [nq, T, 4]
    cross = jnp.einsum("ntc,nuc->ntu", qt[:, :, 1:], uw_xyz,
                       preferred_element_type=jnp.float32)
    d = ursq[:, None, :] - 2.0 * cross                # [nq, T, U]
    if batched:
        d = jnp.where(qt[:, :, 0:1] != uw[:, None, :, 0].astype(
            jnp.float32), jnp.float32(_BIG), d)
    qsq = jnp.sum(qt[:, :, 1:] * qt[:, :, 1:], axis=-1)     # [nq, T]
    u2 = jnp.min(d, axis=2) + qsq                     # true u^2 (approx ok)
    u2 = jnp.where(q_mask.reshape(nq, T), u2, 0.0)
    u2m = jnp.max(u2, axis=1) + 8.0                   # [nq] (+ulp margin)

    # tile/block ranges in the hi key (batch, x): monotone under lexsort
    q_hi, _, _ = K.pack(q_all[:, 0].astype(jnp.int32),
                        q_all[:, 1:4].astype(jnp.int32))
    q_hi = q_hi.reshape(nq, T)
    qmk = q_mask.reshape(nq, T)
    th0 = jnp.min(jnp.where(qmk, q_hi, jnp.int32(2 ** 31 - 1)), axis=1)
    th1 = jnp.max(jnp.where(qmk, q_hi, jnp.int32(-2 ** 31)), axis=1)
    rh = jnp.pad(r_hi, (0, nr * R - Vr), constant_values=K.HI_PAD)
    rh = rh.reshape(nr, R)
    # min/max (not first/last): correct — merely less effective — if a
    # caller ever passes unsorted refs; identical for lex-sorted ones
    bh0 = jnp.min(rh, axis=1)
    bh1 = jnp.max(rh, axis=1)
    gap = jnp.maximum(bh0[None, :] - th1[:, None],
                      th0[:, None] - bh1[None, :])    # [nq, nr]
    gap = jnp.maximum(gap, 0).astype(jnp.float32)
    ok = (gap * gap <= u2m[:, None]).astype(jnp.int32)
    # the surviving blocks form a contiguous id interval per tile (bh0/bh1
    # are monotone under the lexsort): (start, cnt) drives the compact
    # grid; the bit mask drives the full-grid fallback
    start = jnp.argmax(ok, axis=1).astype(jnp.int32)
    last = (nr - 1 - jnp.argmax(ok[:, ::-1], axis=1)).astype(jnp.int32)
    any_ok = jnp.max(ok, axis=1) > 0
    cnt = jnp.where(any_ok, last - start + 1, 0).astype(jnp.int32)
    start = jnp.where(any_ok, start, 0)
    # bit-pack along the block axis, FLATTENED to 1-D: SMEM scalar-prefetch
    # budget (~1 MB) cannot hold [nq, nr] int32 at chamfer-scale query
    # counts, and SMEM pads a 2-D array's minor dim to 128 words — a 1-D
    # [nq * nw] layout pads only the total length
    nw = -(-nr // 32)
    ok = jnp.pad(ok, ((0, 0), (0, nw * 32 - nr))).reshape(nq, nw, 32)
    weights = jnp.left_shift(jnp.int32(1),
                             jnp.arange(32, dtype=jnp.int32))
    packed = jnp.sum(ok * weights[None, None, :], axis=2,
                     dtype=jnp.int32).reshape(nq * nw)
    return packed, start, cnt


@functools.partial(jax.jit, static_argnames=("interpret", "n_batch",
                                              "compact_min_nr", "maxb"))
def nn_match_idx_pallas(q_coords: jnp.ndarray, q_mask: jnp.ndarray,
                        r_coords: jnp.ndarray, r_mask: jnp.ndarray,
                        *, interpret: bool = False,
                        n_batch: int = 0,
                        compact_min_nr: int | None = None,
                        maxb: int | None = None) -> jnp.ndarray:
    """For each query voxel, the index of the nearest reference voxel.

    Same contract as ops.knn.nn_match_idx (indices arbitrary for invalid
    queries; callers mask downstream).  `n_batch=1` statically removes the
    per-element batch compare (0 = unknown, keep it).

    With many ref blocks (nr > compact_min_nr) the pruned kernel runs on a
    compact (nq, maxb) grid over per-tile survivor intervals; a traced
    `lax.cond` falls back to the full (nq, nr) bit-masked grid whenever
    any tile's interval exceeds maxb, so the result is always exact.
    `compact_min_nr`/`maxb` exist for tests; production uses the module
    constants.
    """
    Vq = q_coords.shape[0]
    Vr = r_coords.shape[0]
    T = QTILE
    nq = -(-Vq // T)
    R = min(RBLK, -(-Vr // 128) * 128)
    nr = -(-Vr // R)
    Vrp = nr * R
    batched = n_batch != 1
    prune = nr >= 3 and Vr >= UWND
    compact_min_nr = COMPACT_MIN_NR if compact_min_nr is None else \
        compact_min_nr
    maxb = MAXB if maxb is None else maxb
    compact = prune and nr > compact_min_nr

    qc = jnp.pad(q_coords.astype(jnp.float32),
                 ((0, nq * T - Vq), (0, 4)))         # [nqT, 8]
    q3 = qc.reshape(nq, T, 8)
    qm = jnp.pad(q_mask, (0, nq * T - Vq))

    rc = r_coords.astype(jnp.int32)
    rsq_i = jnp.sum(rc[:, 1:] * rc[:, 1:], axis=-1)  # exact int
    rsq_shift = rsq_i + (~r_mask).astype(jnp.int32) * _PEN
    gid = (jnp.arange(Vrp, dtype=jnp.int32) % R) // 128
    rsqo16 = (rsq_shift + _OFFS) * 16
    rsqo16 = jnp.pad(rsqo16, (0, Vrp - Vr),
                     constant_values=(_PEN + _OFFS) * 16) + gid
    rsqo16 = rsqo16.reshape(1, Vrp)

    rf = rc.astype(jnp.float32)
    # rx rows: 0 unused, 1..3 = -2 * xyz^T, 4 batch id, 5-7 pad
    zero = jnp.zeros((Vr,), jnp.float32)
    rx = jnp.stack([zero, -2.0 * rf[:, 1], -2.0 * rf[:, 2],
                    -2.0 * rf[:, 3], rf[:, 0], zero, zero, zero])
    rx = jnp.pad(rx, ((0, 0), (0, Vrp - Vr)))

    kernel = _make_kernel(T, R, nr, batched, prune)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((nq, 1, T), jnp.int32),
        interpret=interpret,
    )
    if prune:
        ok, start, cnt = _prune_mask(q3, qm, rc, rsq_shift, nq, T, R, nr,
                                     Vr, batched)

        def run_full(_):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nq, nr),
                in_specs=[
                    pl.BlockSpec((1, T, 8), lambda i, j, ok_ref: (i, 0, 0)),
                    pl.BlockSpec((8, R), lambda i, j, ok_ref: (0, j)),
                    pl.BlockSpec((1, R), lambda i, j, ok_ref: (0, j)),
                ],
                out_specs=pl.BlockSpec((1, 1, T),
                                       lambda i, j, ok_ref: (i, 0, 0)),
                scratch_shapes=[pltpu.VMEM((T, 1), jnp.int32),
                                pltpu.VMEM((T, 1), jnp.int32)],
            )
            return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
                ok, q3, rx, rsqo16)

        if not compact:
            out = run_full(0)
        else:
            mb = min(maxb, nr)

            def run_compact(_):
                def _blk(i, j, start_ref, cnt_ref):
                    # clamp so exhausted steps re-address the PREVIOUS
                    # block (the pipeline skips the re-fetch) and stay in
                    # range even for cnt == 0 tiles
                    jb = start_ref[i] + jnp.minimum(
                        j, jnp.maximum(cnt_ref[i] - 1, 0))
                    return (0, jnp.minimum(jb, nr - 1))

                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(nq, mb),
                    in_specs=[
                        pl.BlockSpec((1, T, 8),
                                     lambda i, j, s, c: (i, 0, 0)),
                        pl.BlockSpec((8, R), lambda i, j, s, c: _blk(
                            i, j, s, c)),
                        pl.BlockSpec((1, R), lambda i, j, s, c: _blk(
                            i, j, s, c)),
                    ],
                    out_specs=pl.BlockSpec((1, 1, T),
                                           lambda i, j, s, c: (i, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((T, 1), jnp.int32),
                                    pltpu.VMEM((T, 1), jnp.int32)],
                )
                kern_c = _make_kernel_compact(T, R, mb, batched)
                # cnt is clipped for the index maps only; the overflow
                # cond below guarantees cnt <= mb wherever this branch
                # actually runs
                return pl.pallas_call(kern_c, grid_spec=grid_spec,
                                      **common)(
                    start, jnp.minimum(cnt, mb), q3, rx, rsqo16)

            out = jax.lax.cond(jnp.max(cnt) > mb, run_full, run_compact, 0)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(nq, nr),
            in_specs=[
                pl.BlockSpec((1, T, 8), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((8, R), lambda i, j: (0, j)),
                pl.BlockSpec((1, R), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, 1, T), lambda i, j: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((T, 1), jnp.int32),
                            pltpu.VMEM((T, 1), jnp.int32)],
            **common,
        )(q3, rx, rsqo16)
    return out.reshape(-1)[:Vq]
