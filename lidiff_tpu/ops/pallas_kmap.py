"""Fused Pallas TPU kernel for building the 27-tap column kernel map.

Replaces the gather-based binary searches of
`ops.grid.build_kmap3_columns` on TPU.  Device traces of the sampling step
showed the searches dominating the whole pipeline: 45 searches x ~18
probe rounds x [V]-row gathers per re-voxelization = ~100M randomly
gathered rows per step, at the TPU's row-rate-bound gather throughput
(~2 s/step at the 180k-point operating point — more than both denoiser
forwards combined).

The kernel uses the same monotonicity property as the fused conv
(ops/pallas_conv.py): for a tile of T consecutive output voxels, each
column's lower bounds live in a narrow contiguous key window.  A cheap
XLA prolog finds each (tile, column) window anchor by binary search over
just the tile-FIRST queries (nt*9 rows instead of V*9); the kernel then
streams the key windows into VMEM and resolves all T queries of the tile
with vectorized lexicographic compares:

    lower_bound(q) = window_start + sum_s [ w[s] < q ]
    m0/m1/m2       = any_s [ w[s] == q_ztap ]

— counting and membership over a [W, T] compare tile (window rows on
sublanes so the reductions run on the cheap axis), zero gathers anywhere.

Exactness: identical outputs to build_kmap3_columns (same lower-bound
clamping, same conservative q_valid masking of all three z-taps, same
"no intermediate key between stride-aligned z neighbors" invariant).
Queries whose true lower bound falls outside the window produce hit=0
(never garbage) and are counted by the separate conv-window overflow
check; the windows here have the same spans as the conv's, covered by
nblk blocks with margin on all measured scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidiff_tpu.ops import keys as K
from lidiff_tpu.ops.grid import ColumnKernelMap, VoxelGeom
from lidiff_tpu.ops.pallas_conv import DEFAULT_NBLK as NBLK
from lidiff_tpu.ops.pallas_conv import TILE
_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _make_kernel(T: int, nblk: int, s: int):
    W = nblk * T
    SPAN = K.COORD_SPAN          # 4096 field span

    def kernel(blk_ref, nv_ref, keys_ref, mask_ref, *rest):
        wnd_refs = rest[:9 * nblk]
        col_ref = rest[9 * nblk]
        hit_ref = rest[9 * nblk + 1]
        i = pl.program_id(0)

        # tiles past the live-voxel count have only padding queries: skip
        # their compare loops entirely (same valid-rows-first invariant as
        # the conv's tile skipping, ops/pallas_conv.py)
        @pl.when(i * T >= nv_ref[0])
        def _dead():
            col_ref[:] = jnp.zeros_like(col_ref)
            hit_ref[:] = jnp.zeros_like(hit_ref)

        @pl.when(i * T < nv_ref[0])
        def _live():
            kh = keys_ref[0, 0, :]                    # [T]
            kl = keys_ref[0, 1, :]
            msk = mask_ref[0, 0, :].astype(jnp.int32)
            # coordinate fields (all non-negative by key construction)
            xf = kh % SPAN
            yf = kl // SPAN
            zf = kl % SPAN

            for j, (dx, dy) in enumerate(_OFFS):
                qh = kh + dx * s
                ql = kl + dy * s * SPAN - s
                okx = ((xf + dx * s) >= 0) & ((xf + dx * s) < SPAN)
                oky = ((yf + dy * s) >= 0) & ((yf + dy * s) < SPAN)
                okz = (zf - s) >= 0
                ok = (msk != 0) & okx & oky & okz      # [T] i1

                qhr = qh[None, :]                      # [1, T]
                qlr = ql[None, :]
                lb_rel = jnp.zeros((T,), jnp.int32)
                m0 = jnp.zeros((T,), jnp.int32)
                m1 = jnp.zeros((T,), jnp.int32)
                m2 = jnp.zeros((T,), jnp.int32)
                # per window block: [T_w, T] lexicographic compares,
                # reduced over the (cheap) sublane axis and accumulated
                # across blocks
                for b in range(nblk):
                    whc = wnd_refs[j * nblk + b][0, :, 0:1]      # [T_w, 1]
                    wlc = wnd_refs[j * nblk + b][0, :, 1:2]
                    less = (whc < qhr) | ((whc == qhr) & (wlc < qlr))
                    lb_rel = lb_rel + jnp.sum(less.astype(jnp.int32),
                                              axis=0)
                    same_h = whc == qhr
                    m0 = jnp.maximum(m0, jnp.max(
                        (same_h & (wlc == qlr)).astype(jnp.int32), axis=0))
                    m1 = jnp.maximum(m1, jnp.max(
                        (same_h & (wlc == qlr + s)).astype(jnp.int32),
                        axis=0))
                    m2 = jnp.maximum(m2, jnp.max(
                        (same_h & (wlc == qlr + 2 * s)).astype(jnp.int32),
                        axis=0))
                oki = ok.astype(jnp.int32)
                col_ref[0, j, :] = blk_ref[i, j] * T + lb_rel
                hit_ref[0, 3 * j + 0, :] = m0 * oki
                hit_ref[0, 3 * j + 1, :] = m1 * oki
                hit_ref[0, 3 * j + 2, :] = m2 * oki

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_kmap3_columns_pallas(geom: VoxelGeom,
                               *, interpret: bool = False
                               ) -> ColumnKernelMap:
    """Drop-in TPU replacement for ops.grid.build_kmap3_columns."""
    s = geom.stride
    V = geom.capacity
    T = TILE
    nblk = NBLK
    nt = max(pl.cdiv(V, T), nblk)
    Vp = nt * T

    hi = jnp.pad(geom.key_hi, (0, Vp - V), constant_values=K.HI_PAD)
    lo = jnp.pad(geom.key_lo, (0, Vp - V), constant_values=K.LO_PAD)
    mask = jnp.pad(geom.mask.astype(jnp.int8), (0, Vp - V))
    keys2 = jnp.stack([hi, lo], axis=0).reshape(2, nt, T).transpose(
        1, 0, 2)                                       # [nt, 2, T] (lanes)
    # windows use a sublane-major copy so the [T_w, T] compare tiles need
    # no in-kernel transposes
    keys_wnd = jnp.stack([hi, lo], axis=1).reshape(nt, T, 2)

    # prolog: anchor BLOCK ids without any binary search. Only
    # lower_bound(keys, q) // T is needed, and it equals
    # count(tile_LAST < q) EXACTLY: the tiles wholly below q are a prefix
    # (keys sorted), each contributes T to the lower bound, and the next
    # tile contributes < T — so the quotient is the prefix length, in
    # every case including a q absent from the level whose insertion
    # point lands exactly on a tile boundary (counting tile-FIRST keys is
    # one block early there — ADVICE r4: the far-end window block was
    # silently lost for such columns). The dense [9, nt, nt] pair compare
    # + reduce runs on the VPU in ~0.3 ms, replacing ~12 ms/step of
    # row-rate-bound probe gathers (each searchsorted probe round gathers
    # at its mid positions; 5 levels x ~19 rounds of 9*nt-row gathers).
    last_h = hi[T - 1::T]                              # [nt]
    last_l = lo[T - 1::T]
    dxs = jnp.array([dx for dx, _ in _OFFS], jnp.int32)
    dys = jnp.array([dy for _, dy in _OFFS], jnp.int32)
    qh = hi[::T][None, :] + dxs[:, None] * s           # [9, nt] tile-first
    ql = lo[::T][None, :] + dys[:, None] * (s * K.COORD_SPAN) - s
    less = K.pair_less(last_h[None, None, :], last_l[None, None, :],
                       qh[:, :, None], ql[:, :, None])   # [9, nt, nt]
    p = jnp.sum(less.astype(jnp.int32), axis=-1)       # [9, nt] block ids
    blk = jnp.clip(jnp.transpose(p), 0, nt - nblk).astype(
        jnp.int32)                                     # [nt, 9]

    kernel = _make_kernel(T, nblk, s)
    in_specs = [
        pl.BlockSpec((1, 2, T), lambda i, blk_ref, nv_ref: (i, 0, 0)),
        pl.BlockSpec((1, 1, T), lambda i, blk_ref, nv_ref: (i, 0, 0)),
    ]

    def _wnd_index_map(j, b):
        def index_map(i, blk_ref, nv_ref):
            return (blk_ref[i, j] + b, 0, 0)
        return index_map

    for j in range(9):
        for b in range(nblk):
            in_specs.append(pl.BlockSpec((1, T, 2), _wnd_index_map(j, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 9, T), lambda i, blk_ref, nv_ref: (i, 0, 0)),
            pl.BlockSpec((1, 27, T), lambda i, blk_ref, nv_ref: (i, 0, 0)),
        ],
    )
    mask3 = mask.reshape(nt, 1, T)
    nv = jnp.asarray(geom.num, jnp.int32).reshape(1)
    col_r, hit_r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt, 9, T), jnp.int32),
                   jax.ShapeDtypeStruct((nt, 27, T), jnp.int32)],
        interpret=interpret,
    )(blk, nv, keys2, mask3, *([keys_wnd] * (9 * nblk)))

    col_idx = jnp.clip(col_r.transpose(0, 2, 1).reshape(Vp, 9)[:V],
                       0, V - 1)
    hit = hit_r.transpose(0, 2, 1).reshape(Vp, 27)[:V] != 0

    # window-overflow count: for each of the three z-taps, count HITS whose
    # actual slab row (r0, r0+m0, r0+m0+m1 — the rows the conv reads) falls
    # outside the nblk window. Dropped taps are never garbage, but they are
    # silent quality loss, so every one is counted (including z/z+s taps
    # whose base tap missed). Surfaced per level via Pyramid.
    from lidiff_tpu.ops.pallas_conv import (DISPATCH_NARROW, DISPATCH_WIDE,
                                            _window_overflow,
                                            regroup_for_geometry)
    r0 = (col_r - blk[:, :, None] * T).transpose(0, 2, 1)   # [nt, T, 9]
    hit_z = hit_r.reshape(nt, 9, 3, T).transpose(0, 3, 1, 2)
    overflow = _window_overflow(r0, hit_z, nblk * T)
    # ...plus the drops each production conv geometry would incur on this
    # map (the per-call counters are discarded in sparse_conv; this single
    # per-level counter is the one Pyramid surfaces). Builder drops above
    # have hit=0, so they are not double counted here. The regrouped
    # layouts are attached (pre) so every conv sharing this map skips its
    # transpose/window/overflow prolog entirely.
    hit_r8 = hit_r.astype(jnp.int8)
    pre = {}
    for tile_w in (DISPATCH_NARROW, DISPATCH_WIDE):
        lo, col4, hit4, ov = regroup_for_geometry(col_r, hit_r8, *tile_w)
        pre[tile_w] = (lo, col4, hit4)
        overflow = overflow + ov

    return ColumnKernelMap(col_idx=col_idx, hit=hit, blk=blk,
                           col_r=col_r, hit_r=hit_r8,
                           overflow=overflow, pre=pre, nvalid=geom.num)
