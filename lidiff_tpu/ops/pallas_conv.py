"""Fused Pallas TPU kernel for the 27-tap column sparse convolution.

This is the hot op of the denoiser (the conv engine replacing
MinkowskiEngine's generalized sparse conv, reference
/root/reference/lidiff/models/minkunet.py:13-76).  The XLA path
(`ops.sparse_conv.sparse_conv_columns`) lowers to HBM row-gathers plus
separate select / GEMM passes; a device trace at the 180k-point operating
point shows that path moving ~270 GB of HBM traffic per denoiser forward
(gather fusions at ~29% of peak bandwidth, GEMMs re-reading gathered slabs).

The kernel exploits the column kernel map's key property: voxel keys are
lexicographically sorted, so each of the 9 (dx, dy) columns' slab base
indices are MONOTONE in the output index.  The grid is (output tiles,
9 columns), columns innermost; each step:

  1. streams `nblk` consecutive T-row blocks of `feats` for (tile, column)
     into VMEM (contiguous DMA at full HBM bandwidth, double-buffered by
     pallas; window start = per-tile-per-column block index from a cheap
     XLA prolog, fed through scalar prefetch into the index maps);
  2. "gathers" the column's three z-tap rows per output with ONE stacked
     one-hot matmul on the MXU: sel[3T, nblk*T] rows are one-hot at the
     z-tap target rows — an EXACT row pick (one-hot selection incurs no
     rounding in any dtype); misses aim at row -1 and contribute zero;
  3. accumulates slab [T, 3C] @ W[col] [3C, Co] into the output tile,
     which stays VMEM-resident across the 9 column steps (out block index
     depends only on the tile, and the column dimension is innermost).

Per-conv HBM traffic drops to 9*nblk*V*C window bytes + V*Co output bytes —
no gathered slab or select intermediate ever touches HBM.  The tap weights
[9, 3C, Co] are VMEM-resident for the whole call (constant index map).

Rows that would fall outside the nblk-block window fail the one-hot
comparison and contribute zero (a dropped tap, never garbage).  The prolog
counts such rows (`overflow`); with the default T=128 / nblk=4 the count is
zero with a wide margin on all measured real-scan pyramids (max window
offset < 2.8 T).  `bench.py` checks it like capacity overflow.

`groups` runs G independent feature sets [V, G*C] over the same geometry
with shared weights (the fused classifier-free execution of reference
models.py:98-103): the one-hot selectors are built ONCE per column and
reused by every group, so the marginal cost of the second stream is only
its window DMA and GEMM — cheaper than a second forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # output rows per grid step
DEFAULT_NBLK = 4    # window blocks per column (covers offsets < nblk*T)


def _window_overflow(r0, hit_z, W):
    """Exact dropped-tap count: for each z-tap, a HIT whose actual slab row
    (r0, r0+m0, r0+m0+m1 — the rows the selector matmul targets) falls
    outside the [0, W) window contributes zero and is counted here.

    Args:
      r0: [..., 9] int32 window-relative slab base rows.
      hit_z: [..., 9, 3] int8/bool z-tap hit masks.
      W: window rows.
    """
    m0 = hit_z[..., 0].astype(jnp.int32)
    m1 = hit_z[..., 1].astype(jnp.int32)
    m2 = hit_z[..., 2].astype(jnp.int32)
    r1 = r0 + m0
    r2 = r1 + m1

    def _oob(r):
        return (r < 0) | (r >= W)

    return (jnp.sum((m0 != 0) & _oob(r0))
            + jnp.sum((m1 != 0) & _oob(r1))
            + jnp.sum((m2 != 0) & _oob(r2))).astype(jnp.int32)


def regroup_for_geometry(col_r, hit_r, tile: int, wrows: int):
    """Per-(tile, wrows) conv-kernel inputs derived from the kernel-map
    builder's TILE-row layout: regrouped index/hit tiles, 32-row-aligned
    window starts, and the exact dropped-tap count that geometry incurs.

    Returns (lo [nt, 9] int32, col4 [nt, 9, 1, tile] int32,
             hit4 [nt, 9, 3, tile] int8, overflow [] int32).
    Computed ONCE per level by the builder (ColumnKernelMap.pre) so the
    ~40 convs sharing a map skip the transposes and overflow prolog.
    """
    nt0 = col_r.shape[0]
    Vp0 = nt0 * TILE
    r = tile // TILE
    nt = max(-(-Vp0 // tile), -(-wrows // tile))
    Vp = nt * tile
    ptiles = Vp // TILE - nt0
    cr = jnp.pad(col_r, ((0, ptiles), (0, 0), (0, 0)))
    hr = jnp.pad(hit_r, ((0, ptiles), (0, 0), (0, 0)))
    col = (cr.reshape(nt, r, 9, TILE).transpose(0, 2, 1, 3)
           .reshape(nt, 9, tile))
    hit = (hr.reshape(nt, r, 9, 3, TILE).transpose(0, 2, 3, 1, 4)
           .reshape(nt, 9, 3, tile))
    first = col[:, :, 0]
    lo = ((jnp.clip(first, 0, Vp - wrows) // 32) * 32).astype(jnp.int32)
    rel = col - lo[:, :, None]
    overflow = _window_overflow(rel.transpose(0, 2, 1),
                                hit.transpose(0, 3, 1, 2), wrows)
    return (lo, col.reshape(nt, 9, 1, tile),
            hit.astype(jnp.int8), overflow)


def window_overflow_for_geometry(col_r, hit_r, tile: int, wrows: int):
    """Dropped-tap count the v2 conv kernel would incur at (tile, wrows)
    on this kernel map (see regroup_for_geometry)."""
    return regroup_for_geometry(col_r, hit_r, tile, wrows)[3]


def _make_kernel(T: int, C: int, Co: int, G: int, nblk: int, relu: bool):
    """Kernel body for one output tile: all 9 columns unrolled."""

    def kernel(blk_ref, col_ref, hit_ref, w_ref, mask_ref, bias_ref, *rest):
        wnd_refs = rest[:9 * nblk]
        o_ref = rest[9 * nblk]
        i = pl.program_id(0)
        dt = wnd_refs[0].dtype
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, nblk * T), 1)
        accs = [jnp.zeros((T, Co), jnp.float32) for _ in range(G)]
        for j in range(9):
            lo = blk_ref[i, j] * T
            r0 = col_ref[0, j, 0, :] - lo                # [T]
            m0 = hit_ref[0, j, 0, :].astype(jnp.int32)
            m1 = hit_ref[0, j, 1, :].astype(jnp.int32)
            m2 = hit_ref[0, j, 2, :].astype(jnp.int32)
            r1 = r0 + m0
            r2 = r1 + m1
            # one one-hot selector per z-tap; misses aim at row -1 -> no
            # iota match -> exactly zero contribution. Built in f32
            # (layout-compatible with the 32-bit compare) then cast; 0/1
            # values cast exactly, so the row pick stays exact.
            sels = [jnp.where(iota == jnp.where(m != 0, r, -1)[:, None],
                              jnp.float32(1), jnp.float32(0)).astype(dt)
                    for m, r in ((m0, r0), (m1, r1), (m2, r2))]
            gz = []
            for sel in sels:
                g = jnp.zeros((T, G * C), jnp.float32)
                for b in range(nblk):
                    g = g + jnp.dot(sel[:, b * T:(b + 1) * T],
                                    wnd_refs[j * nblk + b][:],
                                    preferred_element_type=jnp.float32)
                gz.append(g)
            w3 = w_ref[j]                                # [3C, Co]
            for gi in range(G):
                sl = slice(gi * C, (gi + 1) * C)
                slab = jnp.concatenate(
                    [gz[0][:, sl], gz[1][:, sl], gz[2][:, sl]],
                    axis=1).astype(dt)                   # [T, 3C]
                accs[gi] = accs[gi] + jnp.dot(
                    slab, w3, preferred_element_type=jnp.float32)
        # folded eval-BN epilogue: per-channel bias (weights already carry
        # the scale), optional ReLU — saves the separate elementwise passes
        accs = [a + bias_ref[0][None, :] for a in accs]
        acc = accs[0] if G == 1 else jnp.concatenate(accs, axis=1)
        if relu:
            acc = jnp.maximum(acc, 0)
        keep = mask_ref[0, 0, :].astype(jnp.int32)[:, None] != 0
        o_ref[:] = jnp.where(keep, acc, 0).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "nblk", "interpret",
                                    "out_dtype", "tile", "relu"))
def conv_columns_pallas(feats: jnp.ndarray, col_idx: jnp.ndarray,
                        hit: jnp.ndarray, weights: jnp.ndarray,
                        out_mask: jnp.ndarray, *, groups: int = 1,
                        nblk: int = DEFAULT_NBLK, interpret: bool = False,
                        out_dtype=None, tile: int | None = None,
                        blk: jnp.ndarray | None = None,
                        col_r: jnp.ndarray | None = None,
                        hit_r: jnp.ndarray | None = None,
                        bias: jnp.ndarray | None = None,
                        relu: bool = False):
    """27-tap column conv, fused gather->GEMM in one Pallas kernel.

    Args:
      feats: [V, G*C] input voxel features (padding rows zero), group-major.
      col_idx: [V, 9] int32 monotone slab base indices (ColumnKernelMap).
      hit: [V, 27] bool tap hits.
      weights: [27, Cin, Cout] tap weights (cube_offsets order), shared
        across groups.
      out_mask: [V] bool output validity.
      groups: number of independent feature streams G.
      nblk: DMA window size in T-row blocks.
      interpret: run in pallas interpret mode (CPU testing).
      out_dtype: output dtype (default: feats.dtype). The accumulation
        across columns happens in this dtype's storage with f32 adds.

    Returns:
      (out [V, G*Cout] in out_dtype, overflow [] int32 — number of
       (output, tap) pairs whose row fell outside the DMA window; 0 on all
       measured real operating points, dropped taps otherwise.)
    """
    V, CG = feats.shape
    Kt, C, Co = weights.shape
    G = groups
    assert Kt == 27 and CG == G * C

    # big input widths: split C into even <=128-wide parts (the conv is
    # linear in its input channels, so the parts sum exactly) — keeps the
    # resident weight tensor and in-kernel temporaries inside the 16 MB
    # VMEM budget. Even one-level split: the C-independent per-call costs
    # (selector build, window DMA issue) scale with the part count.
    if C > 128:
        n_parts = -(-C // 128)
        h = (-(-C // n_parts) + 7) & ~7
        f3 = feats.reshape(V, G, C)
        acc = None
        ov1 = None
        for p in range(n_parts):
            a, b = p * h, min((p + 1) * h, C)
            # bias/relu apply once on the summed parts, not per part
            out_p, ov_p = conv_columns_pallas(
                f3[:, :, a:b].reshape(V, G * (b - a)), col_idx, hit,
                weights[:, a:b, :], out_mask, groups=G, nblk=nblk,
                interpret=interpret, out_dtype=jnp.float32, tile=tile,
                blk=blk, col_r=col_r, hit_r=hit_r)
            acc = out_p if acc is None else acc + out_p
            ov1 = ov_p if ov1 is None else ov1
        if bias is not None:
            acc = acc + jnp.tile(bias.astype(acc.dtype), G)
        if relu:
            acc = jnp.maximum(acc, 0)
        if bias is not None or relu:
            acc = jnp.where(out_mask[:, None], acc, 0)
        odt = feats.dtype if out_dtype is None else out_dtype
        return acc.astype(odt), ov1

    T = TILE if tile is None else tile
    nt = max(pl.cdiv(V, T), nblk)   # the window needs nblk blocks to exist
    Vp = nt * T
    dt = feats.dtype
    odt = dt if out_dtype is None else out_dtype

    fp = jnp.pad(feats, ((0, Vp - V), (0, 0)))
    om = jnp.pad(out_mask.astype(jnp.int8), (0, Vp - V))
    mask_r = om.reshape(nt, 1, T)

    if blk is not None and col_r is not None and hit_r is not None:
        # pre-tiled layout from the Pallas kernel-map builder
        # (ops/pallas_kmap.py) — no per-conv prolog work at all
        assert col_r.shape == (nt, 9, T) and hit_r.shape == (nt, 27, T)
        overflow = jnp.int32(0)   # counted once by the kmap builder
        col_r = col_r.reshape(nt, 9, 1, T)
        hit_r = hit_r.reshape(nt, 9, 3, T)
    else:
        ci = jnp.pad(col_idx, ((0, Vp - V), (0, 0)))
        ht = jnp.pad(hit.astype(jnp.int8), ((0, Vp - V), (0, 0)))

        # prolog: per-tile per-column window block index (clamped so the
        # nblk window blocks stay inside the padded array), plus overflow
        first = ci[::T]                                      # [nt, 9]
        blk = jnp.clip(first // T, 0, nt - nblk).astype(jnp.int32)
        rel = ci.reshape(nt, T, 9) - (blk[:, None, :] * T)
        overflow = _window_overflow(rel, ht.reshape(nt, T, 9, 3), nblk * T)

        col_r = (ci.reshape(nt, T, 9).transpose(0, 2, 1)
                 .reshape(nt, 9, 1, T))                      # [nt,9,1,T]
        hit_r = ht.reshape(nt, T, 9, 3).transpose(0, 2, 3, 1)
    w3 = weights.astype(dt).reshape(9, 3 * C, Co)

    if bias is None:
        bias = jnp.zeros((Co,), jnp.float32)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, Co)
    kernel = _make_kernel(T, C, Co, G, nblk, relu)

    in_specs = [
        pl.BlockSpec((1, 9, 1, T), lambda i, blk_ref: (i, 0, 0, 0)),
        pl.BlockSpec((1, 9, 3, T), lambda i, blk_ref: (i, 0, 0, 0)),
        # whole weight tensor VMEM-resident (constant index -> one DMA)
        pl.BlockSpec((9, 3 * C, Co), lambda i, blk_ref: (0, 0, 0)),
        pl.BlockSpec((1, 1, T), lambda i, blk_ref: (i, 0, 0)),
        pl.BlockSpec((1, Co), lambda i, blk_ref: (0, 0)),      # bias
    ]

    def _wnd_index_map(j, b):
        def index_map(i, blk_ref):
            return (blk_ref[i, j] + b, 0)
        return index_map

    for j in range(9):
        for b in range(nblk):
            in_specs.append(pl.BlockSpec((T, CG), _wnd_index_map(j, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, G * Co), lambda i, blk_ref: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vp, G * Co), odt),
        interpret=interpret,
    )(blk, col_r, hit_r, w3, mask_r, bias2, *([fp] * (9 * nblk)))
    return out[:V], overflow


# ---------------------------------------------------------------------------
# Autodiff: the column conv is LINEAR in both feats and weights, so its VJP
# is two more structured ops over the SAME kernel map:
#
#   * grad wrt feats  = the same column conv applied to the cotangent with
#     tap-REVERSED, transposed weights: cube_offsets order reverses exactly
#     under offset negation (k -> 26-k), and on stride-1 maps (input set ==
#     output set) the hit relation is symmetric — hit(o,k) with target i
#     iff hit(i,26-k) with target o.  (The one asymmetry is the builder's
#     conservative q_valid miss for columns whose z-s tap leaves the packed
#     coordinate range, unreachable at the 50 m / 0.05 m operating point —
#     see ops/grid.py build_kmap3_columns.)
#   * grad wrt weights = per-tap slab-transpose GEMMs, computed by
#     `conv_columns_pallas_dw` below: the same streamed windows and one-hot
#     selectors as the forward, but contracting slab^T @ g into a
#     [9, 3C, Co] VMEM-resident accumulator (constant out index map,
#     accumulated across the sequential TPU grid).
#
# This puts the fused kernel on the TRAINING path (the reference's main hot
# path, /root/reference/lidiff/train.py:88-121) — previously every training
# conv fell back to the XLA gather path because pallas_call has no autodiff
# rule.
# ---------------------------------------------------------------------------


def _make_dw_kernel(T: int, C: int, Co: int, G: int, nblk: int):
    def kernel(blk_ref, nv_ref, col_ref, hit_ref, g_in_ref, mask_ref,
               *rest):
        wnd_refs = rest[:9 * nblk]
        dw_ref = rest[9 * nblk]              # [9, 3C, Co] f32, accumulated
        i = pl.program_id(0)
        dt = wnd_refs[0].dtype

        @pl.when(i == 0)
        def _init():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        # tiles past the live-voxel count contribute nothing (their
        # cotangent rows are masked to zero): skip their gathers and GEMMs
        @pl.when(i * T < nv_ref[0])
        def _live():
            keep = mask_ref[0, 0, :].astype(jnp.int32)[:, None] != 0
            gt = jnp.where(keep, g_in_ref[:], 0).astype(dt)  # [T, G*Co]
            iota = jax.lax.broadcasted_iota(jnp.int32, (T, nblk * T), 1)
            for j in range(9):
                lo = blk_ref[i, j] * T
                r0 = col_ref[0, j, 0, :] - lo
                m0 = hit_ref[0, j, 0, :].astype(jnp.int32)
                m1 = hit_ref[0, j, 1, :].astype(jnp.int32)
                m2 = hit_ref[0, j, 2, :].astype(jnp.int32)
                r1 = r0 + m0
                r2 = r1 + m1
                sels = [jnp.where(iota == jnp.where(m != 0, r,
                                                    -1)[:, None],
                                  jnp.float32(1), jnp.float32(0)).astype(dt)
                        for m, r in ((m0, r0), (m1, r1), (m2, r2))]
                gz = []
                for sel in sels:
                    acc_g = jnp.zeros((T, G * C), jnp.float32)
                    for b in range(nblk):
                        acc_g = acc_g + jnp.dot(
                            sel[:, b * T:(b + 1) * T],
                            wnd_refs[j * nblk + b][:],
                            preferred_element_type=jnp.float32)
                    gz.append(acc_g)
                acc = jnp.zeros((3 * C, Co), jnp.float32)
                for gi in range(G):
                    sl = slice(gi * C, (gi + 1) * C)
                    slab = jnp.concatenate(
                        [gz[0][:, sl], gz[1][:, sl], gz[2][:, sl]],
                        axis=1).astype(dt)                  # [T, 3C]
                    # slab^T @ g without an explicit transpose
                    acc = acc + jax.lax.dot_general(
                        slab, gt[:, gi * Co:(gi + 1) * Co],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                dw_ref[j] = dw_ref[j] + acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "nblk", "interpret", "tile"))
def conv_columns_pallas_dw(feats: jnp.ndarray, g: jnp.ndarray,
                           col_idx: jnp.ndarray, hit: jnp.ndarray,
                           out_mask: jnp.ndarray, *, groups: int = 1,
                           nblk: int = DEFAULT_NBLK, interpret: bool = False,
                           tile: int | None = None,
                           blk: jnp.ndarray | None = None,
                           col_r: jnp.ndarray | None = None,
                           hit_r: jnp.ndarray | None = None,
                           nvalid=None) -> jnp.ndarray:
    """Weight gradient of the column conv.

    dW[k, c, co] = sum over outputs o (and groups) of
    hit(o,k) * feats[idx(o,k), c] * g[o, co] — the same streamed windows
    and one-hot row picks as the forward, contracted slab^T @ g.

    Args match `conv_columns_pallas` (feats [V, G*C], g [V, G*Co] the
    masked cotangent).  Returns dW [27, C, Co] float32 (weights are shared
    across groups, so group contributions sum).
    """
    V, CG = feats.shape
    G = groups
    C = CG // G
    Co = g.shape[-1] // G

    if C > 128:
        n_parts = -(-C // 128)
        h = (-(-C // n_parts) + 7) & ~7
        f3 = feats.reshape(V, G, C)
        parts = []
        for p in range(n_parts):
            a, b = p * h, min((p + 1) * h, C)
            parts.append(conv_columns_pallas_dw(
                f3[:, :, a:b].reshape(V, G * (b - a)), g, col_idx, hit,
                out_mask, groups=G, nblk=nblk, interpret=interpret,
                tile=tile, blk=blk, col_r=col_r, hit_r=hit_r,
                nvalid=nvalid))
        return jnp.concatenate(parts, axis=1)               # [27, C, Co]

    T = TILE if tile is None else tile
    nt = max(pl.cdiv(V, T), nblk)
    Vp = nt * T
    dt = feats.dtype

    fp = jnp.pad(feats, ((0, Vp - V), (0, 0)))
    gp = jnp.pad(g.astype(dt), ((0, Vp - V), (0, 0)))
    om = jnp.pad(out_mask.astype(jnp.int8), (0, Vp - V))
    mask_r = om.reshape(nt, 1, T)

    if blk is not None and col_r is not None and hit_r is not None:
        assert col_r.shape == (nt, 9, T) and hit_r.shape == (nt, 27, T)
        col4 = col_r.reshape(nt, 9, 1, T)
        hit4 = hit_r.reshape(nt, 9, 3, T)
    else:
        ci = jnp.pad(col_idx, ((0, Vp - V), (0, 0)))
        ht = jnp.pad(hit.astype(jnp.int8), ((0, Vp - V), (0, 0)))
        first = ci[::T]
        blk = jnp.clip(first // T, 0, nt - nblk).astype(jnp.int32)
        col4 = (ci.reshape(nt, T, 9).transpose(0, 2, 1)
                .reshape(nt, 9, 1, T))
        hit4 = ht.reshape(nt, T, 9, 3).transpose(0, 2, 3, 1)

    nv = (jnp.full((1,), V, jnp.int32) if nvalid is None
          else jnp.asarray(nvalid, jnp.int32).reshape(1))
    kernel = _make_dw_kernel(T, C, Co, G, nblk)
    in_specs = [
        pl.BlockSpec((1, 9, 1, T), lambda i, blk_ref, nv_ref: (i, 0, 0, 0)),
        pl.BlockSpec((1, 9, 3, T), lambda i, blk_ref, nv_ref: (i, 0, 0, 0)),
        pl.BlockSpec((T, G * Co), lambda i, blk_ref, nv_ref: (i, 0)),
        pl.BlockSpec((1, 1, T), lambda i, blk_ref, nv_ref: (i, 0, 0)),
    ]

    def _wnd_index_map(j, b):
        def index_map(i, blk_ref, nv_ref):
            return (blk_ref[i, j] + b, 0)
        return index_map

    for j in range(9):
        for b in range(nblk):
            in_specs.append(pl.BlockSpec((T, CG), _wnd_index_map(j, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        # constant index map: the [9, 3C, Co] accumulator stays VMEM
        # resident across the whole (sequential) grid
        out_specs=pl.BlockSpec((9, 3 * C, Co),
                               lambda i, blk_ref, nv_ref: (0, 0, 0)),
    )
    dw9 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, 3 * C, Co), jnp.float32),
        interpret=interpret,
    )(blk, nv, col4, hit4, gp, mask_r, *([fp] * (9 * nblk)))
    return dw9.reshape(9, 3, C, Co).reshape(27, C, Co)


def _make_dw_kernel_v2(T: int, C: int, Co: int, G: int, nt: int, W: int,
                       CGp: int):
    """Weight-grad kernel on the v2 manual-DMA window geometry: same
    minimal 32-row-aligned windows as the forward (1.6x less gather GEMM
    and selector work per row than the nblk=4 auto-pipelined windows),
    accumulating slab^T @ g into the VMEM-resident [9, 3C, Co] output."""

    def kernel(lo_ref, nv_ref, col_ref, hit_ref, g_in_ref, mask_ref,
               feats_any, dw_ref, wnd, sems):
        i = pl.program_id(0)
        dt = wnd.dtype

        @pl.when(i == 0)
        def _init():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        def live(step):
            return step * T < nv_ref[0]

        def issue(step, slot):
            for j in range(9):
                st = pl.multiple_of(lo_ref[step, j], 32)
                pltpu.make_async_copy(
                    feats_any.at[pl.ds(st, W), :],
                    wnd.at[slot, j], sems.at[slot, j]).start()

        @pl.when((i == 0) & live(0))
        def _first():
            issue(0, 0)

        @pl.when((i + 1 < nt) & live(i + 1))
        def _prefetch():
            issue(i + 1, (i + 1) % 2)

        @pl.when(live(i))
        def _compute():
            slot = i % 2
            for j in range(9):
                st = pl.multiple_of(lo_ref[i, j], 32)
                pltpu.make_async_copy(
                    feats_any.at[pl.ds(st, W), :],
                    wnd.at[slot, j], sems.at[slot, j]).wait()
            keep = mask_ref[0, 0, :].astype(jnp.int32)[:, None] != 0
            gt = jnp.where(keep, g_in_ref[:], 0).astype(dt)   # [T, G*Co]
            iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            for j in range(9):
                lo = lo_ref[i, j]
                r0 = col_ref[0, j, 0, :] - lo
                m0 = hit_ref[0, j, 0, :].astype(jnp.int32)
                m1 = hit_ref[0, j, 1, :].astype(jnp.int32)
                m2 = hit_ref[0, j, 2, :].astype(jnp.int32)
                r1 = r0 + m0
                r2 = r1 + m1
                sels = [jnp.where(iota == jnp.where(m != 0, r, -1)[:, None],
                                  jnp.float32(1), jnp.float32(0)).astype(dt)
                        for m, r in ((m0, r0), (m1, r1), (m2, r2))]
                win = wnd[slot, j]                            # [W, CGp]
                gz = [jnp.dot(sel, win, preferred_element_type=jnp.float32)
                      for sel in sels]
                acc = jnp.zeros((3 * C, Co), jnp.float32)
                for gi in range(G):
                    sl = slice(gi * C, (gi + 1) * C)
                    slab = jnp.concatenate(
                        [gz[0][:, sl], gz[1][:, sl], gz[2][:, sl]],
                        axis=1).astype(dt)                    # [T, 3C]
                    acc = acc + jax.lax.dot_general(
                        slab, gt[:, gi * Co:(gi + 1) * Co],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                dw_ref[j] = dw_ref[j] + acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "interpret", "tile", "wrows"))
def conv_columns_pallas_dw_v2(feats, g, col_idx, hit, out_mask, *,
                              groups: int = 1, interpret: bool = False,
                              tile: int | None = None,
                              wrows: int | None = None,
                              col_r=None, hit_r=None,
                              pre=None, nvalid=None) -> jnp.ndarray:
    """conv_columns_pallas_dw on the v2 manual-DMA geometry (same math).
    Takes the dispatch (tile, wrows) and the builder's `pre` layout so the
    training bwd shares the forward's minimal windows."""
    V, CG = feats.shape
    G = groups
    C = CG // G
    Co = g.shape[-1] // G

    if C > 128:
        n_parts = -(-C // 128)
        h = (-(-C // n_parts) + 7) & ~7
        f3 = feats.reshape(V, G, C)
        parts = []
        for p in range(n_parts):
            a, b = p * h, min((p + 1) * h, C)
            parts.append(conv_columns_pallas_dw_v2(
                f3[:, :, a:b].reshape(V, G * (b - a)), g, col_idx, hit,
                out_mask, groups=G, interpret=interpret, tile=tile,
                wrows=wrows, col_r=col_r, hit_r=hit_r, pre=pre,
                nvalid=nvalid))
        return jnp.concatenate(parts, axis=1)                # [27, C, Co]

    T = TILE_V2 if tile is None else tile
    W = W_ROWS if wrows is None else wrows
    nt = max(pl.cdiv(V, T), -(-W // T))
    Vp = nt * T
    dt = feats.dtype

    CGp = -(-max(CG, 128) // 128) * 128
    fp = jnp.pad(feats, ((0, Vp - V), (0, CGp - CG)))
    gp = jnp.pad(g.astype(dt), ((0, Vp - V), (0, 0)))
    om = jnp.pad(out_mask.astype(jnp.int8), (0, Vp - V))
    mask_r = om.reshape(nt, 1, T)

    if pre is not None:
        lo, col4, hit4 = pre
        assert col4.shape == (nt, 9, 1, T), (col4.shape, nt, T)
    else:
        if col_r is None or hit_r is None:
            col_r, hit_r = _raw_to_tiled(col_idx, hit, V)
        lo, col4, hit4, _ = regroup_for_geometry(col_r, hit_r, T, W)

    nv = (jnp.full((1,), V, jnp.int32) if nvalid is None
          else jnp.asarray(nvalid, jnp.int32).reshape(1))
    kernel = _make_dw_kernel_v2(T, C, Co, G, nt, W, CGp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 9, 1, T), lambda i, lo_ref, nv_ref:
                         (i, 0, 0, 0)),
            pl.BlockSpec((1, 9, 3, T), lambda i, lo_ref, nv_ref:
                         (i, 0, 0, 0)),
            pl.BlockSpec((T, G * Co), lambda i, lo_ref, nv_ref: (i, 0)),
            pl.BlockSpec((1, 1, T), lambda i, lo_ref, nv_ref: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),               # feats
        ],
        out_specs=pl.BlockSpec((9, 3 * C, Co),
                               lambda i, lo_ref, nv_ref: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 9, W, CGp), dt),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    dw9 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, 3 * C, Co), jnp.float32),
        interpret=interpret,
    )(lo, nv, col4, hit4, gp, mask_r, fp)
    return dw9.reshape(9, 3, C, Co).reshape(27, C, Co)


def _raw_to_tiled(col_idx, hit, V: int):
    """Raw [V, 9] / [V, 27] kernel-map arrays -> the builder's TILE-row
    (col_r [nt, 9, T], hit_r [nt, 27, T]) layout (prolog for callers
    without a builder `pre`)."""
    ntT = max(-(-V // TILE), 1)
    ci = jnp.pad(col_idx, ((0, ntT * TILE - V), (0, 0)))
    ht = jnp.pad(hit.astype(jnp.int8), ((0, ntT * TILE - V), (0, 0)))
    col_r = ci.reshape(ntT, TILE, 9).transpose(0, 2, 1)
    hit_r = (ht.reshape(ntT, TILE, 9, 3).transpose(0, 2, 3, 1)
             .reshape(ntT, 27, TILE))
    return col_r, hit_r


def _f0_like(x):
    import numpy as np
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv_columns_pallas_ad(groups: int, nblk: int, interpret: bool,
                           feats, weights, col_idx, hit, out_mask,
                           blk=None, col_r=None, hit_r=None, pre=None,
                           nvalid=None):
    """Differentiable fused column conv (no bias/relu epilogue: on the
    training path BN runs separately in train mode, so the epilogue fold
    is eval-only).  Forward identical to `conv_columns_pallas`; runs the
    size-dispatched kernel geometry (nblk only shapes the dw kernel)."""
    out, _ = conv_columns_dispatch(feats, col_idx, hit, weights, out_mask,
                                   groups=groups, interpret=interpret,
                                   blk=blk, col_r=col_r, hit_r=hit_r,
                                   pre=pre, nvalid=nvalid)
    return out


def _ad_fwd(groups, nblk, interpret, feats, weights, col_idx, hit, out_mask,
            blk=None, col_r=None, hit_r=None, pre=None, nvalid=None):
    out = conv_columns_pallas_ad(groups, nblk, interpret, feats, weights,
                                 col_idx, hit, out_mask, blk, col_r, hit_r,
                                 pre, nvalid)
    return out, (feats, weights, col_idx, hit, out_mask, blk, col_r, hit_r,
                 pre, nvalid)


def _ad_bwd(groups, nblk, interpret, res, g):
    (feats, weights, col_idx, hit, out_mask, blk, col_r, hit_r, pre,
     nvalid) = res
    g = jnp.where(out_mask[:, None], g, 0).astype(feats.dtype)
    # tap-reversed, transposed weights: offset negation reverses
    # cube_offsets order exactly (k -> 26-k)
    w_rev = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    df, _ = conv_columns_dispatch(g, col_idx, hit, w_rev, out_mask,
                                  groups=groups, interpret=interpret,
                                  blk=blk, col_r=col_r, hit_r=hit_r,
                                  out_dtype=feats.dtype, pre=pre,
                                  nvalid=nvalid)
    # weight grad on the forward's dispatch geometry (minimal manual-DMA
    # windows, shared builder `pre` layout) — 1.6x less gather/selector
    # work per row than the nblk auto-pipelined windows
    C = feats.shape[-1] // groups
    t, w = (DISPATCH_NARROW if groups * min(C, 128) <= 128
            else DISPATCH_WIDE)
    p = pre.get((t, w)) if pre else None
    dw = conv_columns_pallas_dw_v2(feats, g, col_idx, hit, out_mask,
                                   groups=groups, interpret=interpret,
                                   tile=t, wrows=w, col_r=col_r,
                                   hit_r=hit_r, pre=p, nvalid=nvalid)
    return (df, dw.astype(weights.dtype), _f0_like(col_idx), _f0_like(hit),
            _f0_like(out_mask), _f0_like(blk), _f0_like(col_r),
            _f0_like(hit_r), _f0_like(pre), _f0_like(nvalid))


conv_columns_pallas_ad.defvjp(_ad_fwd, _ad_bwd)


# ---------------------------------------------------------------------------
# v2: manual double-buffered window DMA, minimal windows.
#
# The per-output-row cost of the one-hot gather GEMM (and of the selector
# iota-compares on the VPU) is W x G*C — INDEPENDENT of the tile size T —
# so the lever that matters is minimizing W itself.  The v1 grid streams
# 9 columns x nblk T-ALIGNED T-row blocks per tile through pallas's
# automatic pipeline: block alignment forces W = nblk*T = 4T = 512 rows
# when the measured span at T=128 is <=249 (real-scan kmaps across noise
# levels sig in {1.0, 0.4, 0.1}, all 5 levels — scripts in BENCH_NOTES).
# v2 keeps the same selector math but copies each column's window with ONE
# 32-row-aligned DMA of W rows directly from HBM (9 issues per tile,
# double-buffered by hand), so W only needs span(T) + 31 alignment slack +
# margin: W=320 at T=128 is 1.6x less gather-GEMM and selector work per
# row than v1's 512, plus 1.6x less window HBM traffic.
#
# Window starts are aligned down to 32 rows (the bf16 sublane tile is 16
# rows; 8-row alignment put bf16 DMAs on the slow unaligned path).
# Narrow convs (G*C < 128) pad the feature lanes to the 128-lane tile the
# DMA slice requires; the zero lanes are never read by the slab slices.
# Out-of-window taps contribute zero and are counted exactly by the
# prolog, like v1.
# ---------------------------------------------------------------------------

TILE_V2 = 128       # v2 output rows per grid step
W_ROWS = 320        # manual window rows: span(128)<=249 + 31 align + margin


def _make_kernel_v2(T: int, C: int, Co: int, G: int, relu: bool, nt: int,
                    W: int, CGp: int, quant: bool = False):

    def kernel(lo_ref, nv_ref, col_ref, hit_ref, w_ref, mask_ref, bias_ref,
               feats_any, o_ref, wnd, sems):
        i = pl.program_id(0)
        # quant: the window payload is int8 (per-channel-quantized feats;
        # scales are folded into w_ref's rows by the caller), the one-hot
        # gather GEMM runs on the int8 MXU path at 2x rate with an exact
        # int32 row pick, and the slab GEMM runs in w_ref's dtype
        dt = w_ref.dtype if quant else wnd.dtype

        # valid voxels are the FIRST nv rows (lex-sorted keys, padding
        # last), so whole output tiles past nv skip their DMAs and math —
        # coarse levels run far under capacity (late solver steps
        # especially), and this recovers that time with zero recompiles
        def live(step):
            return step * T < nv_ref[0]

        def issue(step, slot):
            for j in range(9):
                st = pl.multiple_of(lo_ref[step, j], 32)
                pltpu.make_async_copy(
                    feats_any.at[pl.ds(st, W), :],
                    wnd.at[slot, j], sems.at[slot, j]).start()

        @pl.when((i == 0) & live(0))
        def _first():
            issue(0, 0)

        @pl.when((i + 1 < nt) & live(i + 1))
        def _prefetch():
            issue(i + 1, (i + 1) % 2)

        @pl.when(~live(i))
        def _dead():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(live(i))
        def _compute():
            slot = i % 2
            for j in range(9):
                st = pl.multiple_of(lo_ref[i, j], 32)
                pltpu.make_async_copy(
                    feats_any.at[pl.ds(st, W), :],
                    wnd.at[slot, j], sems.at[slot, j]).wait()

            iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            sel_dt = jnp.int8 if quant else dt
            acc_dt = jnp.int32 if quant else jnp.float32
            accs = [jnp.zeros((T, Co), jnp.float32) for _ in range(G)]
            for j in range(9):
                lo = lo_ref[i, j]
                r0 = col_ref[0, j, 0, :] - lo
                m0 = hit_ref[0, j, 0, :].astype(jnp.int32)
                m1 = hit_ref[0, j, 1, :].astype(jnp.int32)
                m2 = hit_ref[0, j, 2, :].astype(jnp.int32)
                r1 = r0 + m0
                r2 = r1 + m1
                sels = [jnp.where(iota == jnp.where(m != 0, r, -1)[:, None],
                                  jnp.float32(1),
                                  jnp.float32(0)).astype(sel_dt)
                        for m, r in ((m0, r0), (m1, r1), (m2, r2))]
                win = wnd[slot, j]                    # [W, CGp]
                gz = [jnp.dot(sel, win, preferred_element_type=acc_dt)
                      for sel in sels]
                if quant:
                    # |q| <= 127: the int32 row pick casts exactly
                    gz = [g.astype(dt) for g in gz]
                w3 = w_ref[j]
                for gi in range(G):
                    sl = slice(gi * C, (gi + 1) * C)
                    slab = jnp.concatenate(
                        [gz[0][:, sl], gz[1][:, sl], gz[2][:, sl]],
                        axis=1).astype(dt)
                    accs[gi] = accs[gi] + jnp.dot(
                        slab, w3, preferred_element_type=jnp.float32)
            accs = [a + bias_ref[0][None, :] for a in accs]
            acc = accs[0] if G == 1 else jnp.concatenate(accs, axis=1)
            if relu:
                acc = jnp.maximum(acc, 0)
            keep = mask_ref[0, 0, :].astype(jnp.int32)[:, None] != 0
            o_ref[:] = jnp.where(keep, acc, 0).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "interpret", "out_dtype",
                                    "relu", "tile", "wrows", "quant"))
def conv_columns_pallas_v2(feats, col_idx, hit, weights, out_mask, *,
                           groups: int = 1, interpret: bool = False,
                           out_dtype=None,
                           blk=None, col_r=None, hit_r=None,
                           bias=None, relu: bool = False,
                           tile: int | None = None,
                           wrows: int | None = None,
                           pre=None, nvalid=None, quant: bool = False):
    """Manual-DMA variant of conv_columns_pallas (identical math).

    `pre`: optional (lo, col4, hit4) from regroup_for_geometry for THIS
    (tile, wrows) — skips the per-call regroup/window/overflow prolog
    (overflow is then the builder's per-level counter, reported 0 here).
    `nvalid`: optional [] int32 count of valid voxels (they are the FIRST
    rows by key-sort construction); output tiles past it skip their DMAs
    and math entirely — a large win on coarse levels that run far under
    their static capacity.
    `quant`: int8 window payload.  The one-hot selector GEMM — the
    dominant MXU cost at every width — runs on the int8 MXU path at 2x
    the bf16 rate with HALF the window DMA bytes and VMEM scratch; the
    row pick itself stays EXACT (one-hot x int8 -> int32).  The only
    approximation is per-channel symmetric int8 quantization of the
    input features (scales shared across the G classifier-free groups
    and folded into the slab-GEMM weights, so no dequant pass exists).
    Eval-only; the caller gates it to activation convs (Cin >= 32).
    """
    V, CG = feats.shape
    Kt, C, Co = weights.shape
    G = groups
    assert Kt == 27 and CG == G * C
    dt = feats.dtype

    # keep C parts <=128 so the [2, 9, W, G*C] double buffer + weights
    # stay inside VMEM
    c_max = 128
    if C > c_max:
        n_parts = -(-C // c_max)
        h = (-(-C // n_parts) + 7) & ~7
        f3 = feats.reshape(V, G, C)
        acc = None
        ov1 = None
        for p in range(n_parts):
            a, b = p * h, min((p + 1) * h, C)
            out_p, ov_p = conv_columns_pallas_v2(
                f3[:, :, a:b].reshape(V, G * (b - a)), col_idx, hit,
                weights[:, a:b, :], out_mask, groups=G,
                interpret=interpret, out_dtype=jnp.float32,
                blk=blk, col_r=col_r, hit_r=hit_r,
                tile=tile, wrows=wrows, pre=pre, nvalid=nvalid,
                quant=quant)
            acc = out_p if acc is None else acc + out_p
            ov1 = ov_p if ov1 is None else ov1
        if bias is not None:
            acc = acc + jnp.tile(bias.astype(acc.dtype), G)
        if relu:
            acc = jnp.maximum(acc, 0)
        if bias is not None or relu:
            acc = jnp.where(out_mask[:, None], acc, 0)
        odt = dt if out_dtype is None else out_dtype
        return acc.astype(odt), ov1

    T = TILE_V2 if tile is None else tile
    W = W_ROWS if wrows is None else wrows
    nt = max(pl.cdiv(V, T), -(-W // T))
    Vp = nt * T
    odt = dt if out_dtype is None else out_dtype

    # the manual HBM window DMA slices whole (128) lane tiles: pad feature
    # widths (stem 64, the 96-channel up stages' 192, ...) up to the next
    # 128 multiple with zero lanes the slab slices never read
    CGp = -(-max(CG, 128) // 128) * 128
    if quant:
        # per-channel symmetric int8, scales shared across groups (the
        # cond/uncond classifier-free streams run the same net, so their
        # per-channel ranges match); padding rows are zero and stay zero
        f3 = feats.astype(jnp.float32).reshape(V, G, C)
        amax = jnp.max(jnp.abs(f3), axis=(0, 1))                 # [C]
        scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(f3 / scale[None, None, :]), -127, 127)
        feats_w = q.reshape(V, CG).astype(jnp.int8)
        # fold the dequant into the slab weights: slab rows are the 3
        # z-taps x C input channels, every tap scaled by its channel
        weights = (weights.astype(jnp.float32)
                   * scale[None, :, None]).astype(dt)
        wdt = jnp.int8
    else:
        feats_w = feats
        wdt = dt
    fp = jnp.pad(feats_w, ((0, Vp - V), (0, CGp - CG)))
    om = jnp.pad(out_mask.astype(jnp.int8), (0, Vp - V))
    mask_r = om.reshape(nt, 1, T)

    if pre is not None:
        # per-level precomputed geometry (builder): no per-call prolog;
        # overflow is the builder's per-level counter
        lo, col4, hit4g = pre
        assert col4.shape == (nt, 9, 1, T), (col4.shape, nt, T)
        hit4 = hit4g
        overflow = jnp.int32(0)
    elif col_r is not None and hit_r is not None:
        lo, col4, hit4, overflow = regroup_for_geometry(col_r, hit_r, T, W)
    else:
        ci = jnp.pad(col_idx, ((0, Vp - V), (0, 0)))
        ht = jnp.pad(hit.astype(jnp.int8), ((0, Vp - V), (0, 0)))
        col4 = (ci.reshape(nt, T, 9).transpose(0, 2, 1)
                .reshape(nt, 9, 1, T))
        hit4 = ht.reshape(nt, T, 9, 3).transpose(0, 2, 3, 1)
        first = col4[:, :, 0, 0]                             # [nt, 9]
        # window starts aligned down to 32 rows (covers the bf16 16-row
        # sublane tile; 8-row alignment puts bf16 DMAs on the slow
        # unaligned path); W covers measured spans plus <=31-row slack
        lo = ((jnp.clip(first, 0, Vp - W) // 32) * 32).astype(jnp.int32)
        # hit-aware overflow: only taps that actually HIT but fall outside
        # the window are real drops
        rel = col4[:, :, 0, :] - lo[:, :, None]              # [nt, 9, T]
        overflow = _window_overflow(rel.transpose(0, 2, 1),
                                    hit4.transpose(0, 3, 1, 2), W)

    if bias is None:
        bias = jnp.zeros((Co,), jnp.float32)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, Co)
    w3 = weights.astype(dt).reshape(9, 3 * C, Co)

    nv = (jnp.full((1,), V, jnp.int32) if nvalid is None
          else jnp.asarray(nvalid, jnp.int32).reshape(1))

    kernel = _make_kernel_v2(T, C, Co, G, relu, nt, W, CGp, quant=quant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 9, 1, T), lambda i, lo_ref, nv_ref:
                         (i, 0, 0, 0)),
            pl.BlockSpec((1, 9, 3, T), lambda i, lo_ref, nv_ref:
                         (i, 0, 0, 0)),
            pl.BlockSpec((9, 3 * C, Co), lambda i, lo_ref, nv_ref:
                         (0, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda i, lo_ref, nv_ref: (i, 0, 0)),
            pl.BlockSpec((1, Co), lambda i, lo_ref, nv_ref: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),               # feats
        ],
        out_specs=pl.BlockSpec((T, G * Co),
                               lambda i, lo_ref, nv_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 9, W, CGp), wdt),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vp, G * Co), odt),
        interpret=interpret,
    )(lo, nv, col4, hit4, w3, mask_r, bias2, fp)
    return out[:V], overflow


# Size-based dispatch, from a real-scan A/B at 180k points (BENCH_NOTES,
# round 3): narrow convs are per-grid-step-overhead-bound, so the big-tile
# variant wins (C=32: 3.80 vs 5.99 ms v1, C=64: 3.18 vs 5.07); wide convs
# are bound by the W x G*C gather GEMM, so the minimal-window variant wins
# (C=128 G=2: 7.66 vs 8.95 ms v1, C=256 G=2 split: 16.0 vs 20.0).  The
# two geometries here are the ONLY ones production convs run; the kernel-
# map builder counts window overflow for exactly these (pallas_kmap.py).
DISPATCH_WIDE = (128, 320)     # (tile, wrows) for leaf G*C >= 256
DISPATCH_NARROW = (256, 480)   # for leaf G*C <= 128


def conv_columns_dispatch(feats, col_idx, hit, weights, out_mask, *,
                          groups: int = 1, interpret: bool = False,
                          out_dtype=None, blk=None, col_r=None, hit_r=None,
                          bias=None, relu: bool = False, pre=None,
                          nvalid=None, quant: bool = False):
    """The production column conv: picks the fastest measured kernel
    geometry for the conv's width.  Identical math to v1/v2 (exact).

    `pre`: optional dict {(tile, wrows): (lo, col4, hit4)} from the kernel
    map builder (ColumnKernelMap.pre); `nvalid` see v2.
    `quant`: int8 window payload (see conv_columns_pallas_v2) — applied
    only to activation convs (Cin >= 32); the stem/head convs carry raw
    geometry-scaled values that 8 bits cannot represent."""
    G = groups
    C = weights.shape[1]
    t, w = DISPATCH_NARROW if G * min(C, 128) <= 128 else DISPATCH_WIDE
    p = pre.get((t, w)) if pre else None
    return conv_columns_pallas_v2(feats, col_idx, hit, weights, out_mask,
                                  groups=G, interpret=interpret,
                                  out_dtype=out_dtype, blk=blk,
                                  col_r=col_r, hit_r=hit_r, bias=bias,
                                  relu=relu, tile=t, wrows=w, pre=p,
                                  nvalid=nvalid,
                                  quant=bool(quant) and C >= 32)
