"""Fixed-capacity sparse voxel geometry for TPU.

This module is the TPU-native replacement for MinkowskiEngine's coordinate
manager (reference: /root/reference/lidiff/models/models.py:162-178 uses
`ME.TensorField` with UNWEIGHTED_AVERAGE quantization; minkunet.py builds a
4-level stride pyramid with ks=3/stride-1 convs, ks=2/stride-2 down convs and
ks=2/stride-2 transpose convs).

Design: everything has a *static* capacity V so a single XLA compilation
serves every training/sampling step.

  * `VoxelGeom` — one pyramid level: packed sorted keys, int coords, mask.
  * `quantize` — points -> voxels with UNWEIGHTED_AVERAGE features
    (per-voxel mean), plus the point->voxel map used for slice-back
    (TensorField.slice semantics, minkunet.py:497).
  * `build_pyramid` — the whole geometry prologue: voxel sets at strides
    1,2,4,8,16, the 27-neighbor kernel maps per level (shared by every
    stride-1 conv at that level — built once, unlike ME which probes its
    hash map per conv), parent/child maps for down/up convs (derived from
    the pooling cumsum — zero hash lookups), all with static shapes.

Geometry (int coords & index maps) carries no gradients; features flow
separately through the conv ops in `ops/sparse_conv.py`.
"""

from __future__ import annotations

import functools
import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from lidiff_tpu.ops import keys as K


@struct.dataclass
class VoxelGeom:
    """A fixed-capacity set of voxels at one pyramid level.

    Voxels are sorted by lexicographic key; padding rows have key
    (HI_PAD, LO_PAD) and mask=False.  `coords` are unit-voxel integers,
    multiples of `stride` (ME convention: `.C` stays in original-resolution
    units at every level).
    """

    key_hi: jnp.ndarray    # [V] int32, sorted
    key_lo: jnp.ndarray    # [V] int32
    coords: jnp.ndarray    # [V, 4] int32 (batch, x, y, z)
    mask: jnp.ndarray      # [V] bool
    num: jnp.ndarray       # [] int32 — number of valid voxels (<= capacity)
    num_raw: jnp.ndarray   # [] int32 — unique voxels BEFORE capacity clip;
    #                          num_raw > capacity means voxels were dropped
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]

    @property
    def overflow(self) -> jnp.ndarray:
        """Number of voxels deterministically dropped (highest keys)."""
        return jnp.maximum(self.num_raw - self.capacity, 0)


@struct.dataclass
class KernelMap:
    """Padded gather map for a conv: for each output voxel and kernel tap,
    the index of the contributing input voxel (clamped) and a hit mask."""

    idx: jnp.ndarray    # [V_out, K] int32 into input voxel array
    hit: jnp.ndarray    # [V_out, K] bool


@struct.dataclass
class ColumnKernelMap:
    """27-tap kernel map in column form: voxel keys sort by (b, x, y, z),
    so a column's three z-targets (z-s, z, z+s) occupy *consecutive* slots
    starting at the lower bound of z-s. Storing just that base position per
    (dx, dy) column lets the conv fetch each column as ONE contiguous
    3-row slab gather instead of three random row gathers.

    Tap order matches `cube_offsets(3, stride)` (x slowest, z fastest);
    taps col*3 + r correspond to hits m0,m1,m2 whose slab rows are
    0, m0, m0+m1."""

    col_idx: jnp.ndarray   # [V_out, 9] int32 — slab base positions
    hit: jnp.ndarray       # [V_out, 27] bool
    # Optional pre-tiled layout produced by the Pallas kernel-map builder
    # (ops/pallas_kmap.py) and consumed directly by the fused Pallas conv
    # (ops/pallas_conv.py): avoids re-deriving per-tile window blocks and
    # transposed index/hit tiles for every conv sharing this map.
    blk: jnp.ndarray | None = None      # [nt, 9] int32 window block ids
    col_r: jnp.ndarray | None = None    # [nt, 9, T] int32
    hit_r: jnp.ndarray | None = None    # [nt, 27, T] int8
    overflow: jnp.ndarray | None = None  # [] int32 window-overflow count
    # {(tile, wrows): (lo, col4, hit4)} per production conv geometry
    # (ops/pallas_conv.regroup_for_geometry) — built once per level so the
    # ~40 convs sharing this map skip their regroup/overflow prologs
    pre: dict | None = None
    # [] int32 valid-voxel count (valid rows come FIRST by key sort):
    # lets the conv kernel skip whole output tiles past it
    nvalid: jnp.ndarray | None = None

    @property
    def idx(self):
        """Dense [V_out, 27] view (for tests / fallback paths)."""
        m0 = self.hit[:, 0::3].astype(jnp.int32)
        m1 = self.hit[:, 1::3].astype(jnp.int32)
        p = self.col_idx
        dense = jnp.stack([p, p + m0, p + m0 + m1], axis=2)   # [V, 9, 3]
        return dense.reshape(p.shape[0], 27)


def _scatter_pad(capacity: int, idx, values, fill):
    """Scatter `values` at `idx` into a [capacity] (or [capacity, d]) array,
    dropping entries with idx >= capacity via a sentinel row."""
    if values.ndim == 1:
        out = jnp.full((capacity + 1,), fill, dtype=values.dtype)
    else:
        out = jnp.full((capacity + 1, values.shape[-1]), fill, dtype=values.dtype)
    idx = jnp.minimum(idx, capacity)
    return out.at[idx].set(values)[:capacity]


def quantize(points: jnp.ndarray, resolution: float, capacity: int,
             feats: jnp.ndarray | None = None):
    """Voxelize a batched point cloud with UNWEIGHTED_AVERAGE semantics.

    Mirrors the reference `points_to_tensor` (models.py:162-178): voxel
    coordinate = round(p / resolution) (banker's rounding, same as
    torch.round in collations.py:10), features averaged per voxel.

    Args:
      points: [B, N, 3] float — positions (also the default features).
      resolution: voxel edge length.
      capacity: static voxel capacity V (>= max expected unique voxels;
        overflow voxels are dropped deterministically — the highest keys go).
      feats: optional [B, N, C] per-point features; default: the points.

    Returns:
      (geom: VoxelGeom with stride 1,
       vox_feats: [V, C] per-voxel mean features,
       point2voxel: [B, N] int32 index into the voxel arrays; == capacity
         for points that fell out of range or overflowed capacity.)
    """
    B, N, _ = points.shape
    if feats is None:
        feats = points
    C = feats.shape[-1]
    flat_p = points.reshape(B * N, 3)
    flat_f = feats.reshape(B * N, C)
    c = jnp.round(flat_p / resolution).astype(jnp.int32)
    b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N, total_repeat_length=B * N)
    hi, lo, valid = K.pack(b, c)

    order = jnp.arange(B * N, dtype=jnp.int32)
    hi_s, lo_s, order_s = K.lexsort(hi, lo, order)
    valid_s = hi_s != K.HI_PAD

    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
    ])
    head = first & valid_s
    n_unique = jnp.sum(head.astype(jnp.int32))
    vid = jnp.cumsum(head.astype(jnp.int32)) - 1          # id per sorted point
    # overflow + invalid -> sentinel `capacity`
    vid = jnp.where(valid_s & (vid < capacity) & (vid >= 0), vid, capacity)

    # point -> voxel map back in original order
    p2v = jnp.zeros((B * N,), jnp.int32).at[order_s].set(vid)

    # voxel keys / coords (same value for every point of a voxel)
    key_hi = _scatter_pad(capacity, vid, hi_s, K.HI_PAD)
    key_lo = _scatter_pad(capacity, vid, lo_s, K.LO_PAD)
    mask = key_hi != K.HI_PAD
    bb, cc = K.unpack(key_hi, key_lo)
    coords = jnp.concatenate([bb[:, None], cc], axis=-1)
    coords = jnp.where(mask[:, None], coords, 0).astype(jnp.int32)

    # UNWEIGHTED_AVERAGE features
    f_s = flat_f[order_s]
    sums = jnp.zeros((capacity + 1, C), feats.dtype).at[vid].add(f_s)[:capacity]
    cnts = jnp.zeros((capacity + 1,), jnp.float32).at[vid].add(1.0)[:capacity]
    vox_feats = sums / jnp.maximum(cnts, 1.0)[:, None]

    geom = VoxelGeom(
        key_hi=key_hi, key_lo=key_lo, coords=coords, mask=mask,
        num=jnp.minimum(n_unique, capacity).astype(jnp.int32),
        num_raw=n_unique.astype(jnp.int32), stride=1,
    )
    return geom, vox_feats, p2v.reshape(B, N)


def slice_to_points(vox_feats: jnp.ndarray, point2voxel: jnp.ndarray):
    """TensorField.slice: per-point gather of voxel features
    (minkunet.py:497 `y4.slice(x).F`). Out-of-range points get zeros."""
    V = vox_feats.shape[0]
    idx = jnp.minimum(point2voxel, V - 1)
    ok = (point2voxel < V)[..., None]
    return jnp.where(ok, vox_feats[idx], 0)


def pool_geom(geom: VoxelGeom, out_capacity: int):
    """Stride-2 coordinate pooling: the output voxel set of a ks=2/stride-2
    conv (ME floor-divides coordinates when striding maps).

    Returns (geom_out with stride 2*s, child2parent [V_in] int32 index into
    the output arrays, == out_capacity for invalid/overflow).
    """
    s2 = geom.stride * 2
    parent_c = (geom.coords[:, 1:] // s2) * s2
    hi, lo, valid = K.pack(geom.coords[:, 0], parent_c)
    hi = jnp.where(geom.mask & valid, hi, K.HI_PAD)
    lo = jnp.where(geom.mask & valid, lo, K.LO_PAD)

    V_in = geom.capacity
    order = jnp.arange(V_in, dtype=jnp.int32)
    hi_s, lo_s, order_s = K.lexsort(hi, lo, order)
    valid_s = hi_s != K.HI_PAD
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
    ])
    head = first & valid_s
    n_unique = jnp.sum(head.astype(jnp.int32))
    vid = jnp.cumsum(head.astype(jnp.int32)) - 1
    vid = jnp.where(valid_s & (vid < out_capacity) & (vid >= 0), vid, out_capacity)

    child2parent = jnp.full((V_in,), out_capacity, jnp.int32).at[order_s].set(vid)

    key_hi = _scatter_pad(out_capacity, vid, hi_s, K.HI_PAD)
    key_lo = _scatter_pad(out_capacity, vid, lo_s, K.LO_PAD)
    mask = key_hi != K.HI_PAD
    bb, cc = K.unpack(key_hi, key_lo)
    coords = jnp.concatenate([bb[:, None], cc], axis=-1)
    coords = jnp.where(mask[:, None], coords, 0).astype(jnp.int32)

    geom_out = VoxelGeom(
        key_hi=key_hi, key_lo=key_lo, coords=coords, mask=mask,
        num=jnp.minimum(n_unique, out_capacity).astype(jnp.int32),
        num_raw=n_unique.astype(jnp.int32), stride=s2,
    )
    return geom_out, child2parent


def cube_offsets(kernel_size: int, stride_units: int) -> jnp.ndarray:
    """Canonical kernel tap offsets, [K, 3] int32.

    ks=3 -> {-s,0,s}^3 (centered, odd kernels); ks=2 -> {0,s}^3 (ME even
    kernels span [0, ks)).  Order: x slowest, z fastest (itertools.product).
    """
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(kernel_size)
    taps = list(itertools.product(r, r, r))
    return jnp.asarray(taps, jnp.int32) * stride_units


def build_kernel_map(geom_in: VoxelGeom, geom_out: VoxelGeom,
                     offsets: jnp.ndarray) -> KernelMap:
    """For each output voxel o and tap k, find input voxel at
    out_coord + offsets[k] via binary search on the sorted input keys."""
    Ko = offsets.shape[0]
    q_coords = geom_out.coords[:, None, 1:] + offsets[None, :, :]   # [V,K,3]
    q_batch = jnp.broadcast_to(geom_out.coords[:, :1], (geom_out.capacity, Ko))
    q_hi, q_lo, q_valid = K.pack(q_batch, q_coords)
    q_hi = jnp.where(geom_out.mask[:, None], q_hi, K.HI_PAD)
    q_lo = jnp.where(geom_out.mask[:, None], q_lo, K.LO_PAD)
    idx, found = K.searchsorted_pair(geom_in.key_hi, geom_in.key_lo,
                                     q_hi.reshape(-1), q_lo.reshape(-1))
    idx = idx.reshape(geom_out.capacity, Ko)
    found = found.reshape(geom_out.capacity, Ko)
    # q_valid guards the coordinate-range sentinel: an out-of-range query
    # packs to (HI_PAD, LO_PAD), which EQUALS padding rows' keys, so without
    # this mask the search would "find" a padding row and the conv would
    # silently depend on padding features being zero.
    found = found & geom_out.mask[:, None] & q_valid
    return KernelMap(idx=idx, hit=found)


def down_kmap_from_pooling(fine: VoxelGeom, child2parent: jnp.ndarray,
                           out_capacity: int) -> KernelMap:
    """ks=2/stride-2 conv kernel map WITHOUT any hash lookups: the inputs
    contributing to a pooled output voxel are exactly its children, already
    known from the pooling cumsum. Each child lands in a unique
    (parent, tap) slot, so a scatter builds the map directly.

    Tap order matches `cube_offsets(2, fine.stride)` (x slowest, z fastest).
    """
    s = fine.stride
    bits = (fine.coords[:, 1:] // s) % 2
    tap = (bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]).astype(jnp.int32)
    ok = fine.mask & (child2parent < out_capacity)
    parent = jnp.where(ok, child2parent, out_capacity)
    child = jnp.arange(fine.capacity, dtype=jnp.int32)

    idx = jnp.zeros((out_capacity + 1, 8), jnp.int32)
    idx = idx.at[parent, tap].set(jnp.where(ok, child, 0))[:out_capacity]
    hit = jnp.zeros((out_capacity + 1, 8), jnp.bool_)
    hit = hit.at[parent, tap].set(ok)[:out_capacity]
    return KernelMap(idx=idx, hit=hit)


def build_kmap3_columns(geom: VoxelGeom) -> ColumnKernelMap:
    """27-tap kernel map with 9 binary searches per voxel instead of 27.

    Keys sort lexicographically by (batch, x, y, z), and all coordinates at
    a level are multiples of its stride — so within one (batch, x+dx, y+dy)
    column the three z-targets (z-s, z, z+s) occupy at most three
    CONSECUTIVE slots. One lower-bound search per column plus equality
    checks at p, p+m0, p+m0+m1 resolves all three taps.

    Tap order matches `cube_offsets(3, stride)`.
    """
    s = geom.stride
    V = geom.capacity
    b = geom.coords[:, 0]
    xyz = geom.coords[:, 1:]

    base_cols = []
    hit_cols = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            base = xyz + jnp.asarray([dx * s, dy * s, -s], jnp.int32)
            q_hi, q_lo, q_valid = K.pack(b, base)
            q_hi = jnp.where(geom.mask, q_hi, K.HI_PAD)
            q_lo = jnp.where(geom.mask, q_lo, K.LO_PAD)
            p, m0 = K.searchsorted_pair(geom.key_hi, geom.key_lo, q_hi, q_lo)
            # out-of-range queries pack to the padding sentinel and would
            # otherwise "hit" padding rows (see build_kernel_map)
            m0 = m0 & q_valid
            # z target keys differ only in lo by +s and +2s (no 4096 carry:
            # z stays within the same column by construction of the coords)
            p1 = jnp.minimum(p + m0.astype(jnp.int32), V - 1)
            m1 = (geom.key_hi[p1] == q_hi) & (geom.key_lo[p1] == q_lo + s)
            p2 = jnp.minimum(p1 + m1.astype(jnp.int32), V - 1)
            m2 = (geom.key_hi[p2] == q_hi) & (geom.key_lo[p2] == q_lo + 2 * s)
            base_cols.append(p)
            # q_valid also guards m1/m2: with q_hi == HI_PAD the equality
            # against padding rows would otherwise hold. (A query whose z-s
            # tap is out of range loses its z/z+s taps too — conservative
            # miss, unreachable at the 50 m / 0.05 m operating point where
            # |coord| <= ~1100 << 2048.)
            ok = geom.mask & q_valid
            hit_cols += [m0 & ok, m1 & ok, m2 & ok]

    col_idx = jnp.stack(base_cols, axis=1)                    # [V, 9]
    hit = jnp.stack(hit_cols, axis=1)                         # [V, 27]
    return ColumnKernelMap(col_idx=col_idx, hit=hit)


def up_maps(fine: VoxelGeom, child2parent: jnp.ndarray):
    """Transpose-conv (ks=2, stride 2) gather maps: every fine voxel has
    exactly one coarse parent (by construction of pooling); the kernel tap is
    determined by the fine voxel's position within the parent cell.

    Returns (parent_idx [V_fine] int32, tap_id [V_fine] int32 in [0,8)).
    Tap order matches `cube_offsets(2, s_fine)`: x slowest, z fastest.
    """
    s = fine.stride
    bits = (fine.coords[:, 1:] // s) % 2          # [V,3] in {0,1}
    tap = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    return child2parent, tap.astype(jnp.int32)


@struct.dataclass
class DownMap:
    """ks=2/stride-2 down-conv map in child form: every FINE voxel has one
    (parent, tap) slot (the transpose of the [V_coarse, 8] gather map) —
    the conv then runs as one GEMM + narrow tap-select gather + scatter-add
    instead of 8 wide rate-bound row gathers (ops/sparse_conv.py)."""
    parent_idx: jnp.ndarray   # [V_fine] int32 (== V_coarse when invalid)
    tap: jnp.ndarray          # [V_fine] int32 in [0, 8)


@struct.dataclass
class LevelGeom:
    """Geometry bundle for one UNet level."""
    geom: VoxelGeom
    kmap3: KernelMap                      # 27-tap map, shared by all ks=3 convs
    # maps towards the *next coarser* level (None at the coarsest):
    down_kmap: KernelMap | None = None    # ks=2/stride2 conv: coarse <- fine
    parent_idx: jnp.ndarray | None = None  # [V] fine -> coarse index
    up_tap: jnp.ndarray | None = None      # [V] tap id for transpose conv


@struct.dataclass
class Pyramid:
    """Full geometry prologue for a UNet forward: built once per
    voxelization, reused by every conv in every block (and by both the
    conditioned and unconditioned denoiser passes of classifier-free
    guidance — the reference rebuilds ME coordinate maps per pass,
    models.py:98-103)."""
    levels: tuple          # tuple[LevelGeom] finest -> coarsest
    point2voxel: jnp.ndarray   # [B, N] into level-0 voxels
    vox_feats: jnp.ndarray     # [V0, C] UNWEIGHTED_AVERAGE input features

    def overflows(self) -> jnp.ndarray:
        """Per-level dropped-voxel counts [num_levels] int32. Any nonzero
        entry means static capacities were exceeded and features were
        deterministically (but spatially biasedly) dropped — size
        capacities from measured occupancy (scripts/measure_occupancy.py)."""
        return jnp.stack([l.geom.overflow for l in self.levels])

    def window_overflows(self) -> jnp.ndarray:
        """Per-level dropped CONV TAP counts [num_levels] int32 from the
        Pallas kernel-map builder's finite DMA windows (zero for maps built
        by the search-based XLA builder, which has no windows). Nonzero
        means a scene's column spans exceeded the calibrated window size
        (nblk*TILE rows) and conv taps were silently zeroed — surfaced in
        bench.py / the trainer like capacity overflow."""
        return jnp.stack([
            l.kmap3.overflow if getattr(l.kmap3, "overflow", None)
            is not None else jnp.int32(0)
            for l in self.levels])


def build_pyramid(points: jnp.ndarray, resolution: float,
                  capacities: Sequence[int], num_levels: int,
                  feats: jnp.ndarray | None = None) -> Pyramid:
    """Quantize points and assemble `num_levels` geometry levels
    (stride 1, 2, ..., 2^(num_levels-1)) with all kernel maps."""
    assert len(capacities) >= num_levels
    geom0, vox_feats, p2v = quantize(points, resolution, capacities[0], feats)

    geoms = [geom0]
    c2ps = []
    for li in range(1, num_levels):
        g, c2p = pool_geom(geoms[-1], capacities[li])
        geoms.append(g)
        c2ps.append(c2p)

    # TPU: build the column maps with the windowed-compare Pallas kernel —
    # the search-based builder's per-probe [V]-row gathers dominate the
    # whole sampling step on TPU (see ops/pallas_kmap.py)
    from lidiff_tpu.ops import sparse_conv as _sc
    if _sc.USE_PALLAS and _sc._on_tpu():
        from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas
        _kmap3 = build_kmap3_columns_pallas
    else:
        _kmap3 = build_kmap3_columns

    levels = []
    for li, g in enumerate(geoms):
        kmap3 = _kmap3(g)
        if li + 1 < num_levels:
            # down/up convs run in CHILD form off (parent_idx, up_tap)
            # (sparse_conv_down / sparse_conv_transpose); the [V_c, 8]
            # gather-form down_kmap has no production consumer, so it is
            # no longer built here — build it explicitly via
            # down_kmap_from_pooling for fallback/verification paths
            parent_idx, up_tap = up_maps(g, c2ps[li])
        else:
            parent_idx, up_tap = None, None
        levels.append(LevelGeom(geom=g, kmap3=kmap3, down_kmap=None,
                                parent_idx=parent_idx, up_tap=up_tap))

    return Pyramid(levels=tuple(levels), point2voxel=p2v, vox_feats=vox_feats)
