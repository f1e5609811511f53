"""Voxel-coordinate keys for the fixed-capacity sparse engine.

A voxel is identified by (batch, x, y, z) integer coordinates.  We avoid
int64 on TPU (XLA emulates s64) by packing each coordinate tuple into a
*lexicographic pair* of int32 keys:

    hi = batch * 2^12 + (x + 2048)
    lo = (y + 2048) * 2^12 + (z + 2048)

Coordinates are unit-voxel integers (multiples of the tensor stride at
coarser pyramid levels, mirroring MinkowskiEngine's convention where
/root/reference/lidiff/models/minkunet.py keeps `.C` in original-resolution
units).  Valid range per axis is [-2048, 2047]; out-of-range coordinates are
flagged invalid and masked out deterministically.  At LiDiff's operating
point (50 m crop, 0.05 m voxels -> |c| <= ~1100 plus noise margin) this never
triggers in practice.

Sorting uses `jax.lax.sort` with two keys (lexicographic); lookups use a
vectorized binary search over the sorted (hi, lo) pair.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

# Rolled binary-search probes (same knob as the conv tap loops,
# ops/sparse_conv.py): small HLO for compile-bound CPU runs, unrolled for
# TPU execution speed.
ROLLED_SEARCH = os.environ.get(
    "LIDIFF_CONV_SCAN", "0").lower() in ("1", "true")

COORD_BITS = 12
COORD_SPAN = 1 << COORD_BITS          # 4096
COORD_OFF = COORD_SPAN // 2           # 2048
COORD_MIN = -COORD_OFF
COORD_MAX = COORD_OFF - 1
# Padding/invalid sentinel: larger than any valid key pair.
HI_PAD = jnp.iinfo(jnp.int32).max
LO_PAD = jnp.iinfo(jnp.int32).max


def pack(batch: jnp.ndarray, coords: jnp.ndarray):
    """Pack (batch [..], coords [.., 3]) int32 -> (hi, lo, valid).

    Out-of-range coordinates yield (HI_PAD, LO_PAD) and valid=False so they
    sort to the end and never match a lookup.
    """
    c = coords.astype(jnp.int32)
    valid = jnp.all((c >= COORD_MIN) & (c <= COORD_MAX), axis=-1)
    x, y, z = c[..., 0], c[..., 1], c[..., 2]
    hi = batch.astype(jnp.int32) * COORD_SPAN + (x + COORD_OFF)
    lo = (y + COORD_OFF) * COORD_SPAN + (z + COORD_OFF)
    hi = jnp.where(valid, hi, HI_PAD)
    lo = jnp.where(valid, lo, LO_PAD)
    return hi, lo, valid


def unpack(hi: jnp.ndarray, lo: jnp.ndarray):
    """Inverse of `pack` (valid keys only): returns (batch, coords[..,3])."""
    b = hi // COORD_SPAN
    x = hi % COORD_SPAN - COORD_OFF
    y = lo // COORD_SPAN - COORD_OFF
    z = lo % COORD_SPAN - COORD_OFF
    return b, jnp.stack([x, y, z], axis=-1)


def lexsort(hi: jnp.ndarray, lo: jnp.ndarray, *values: jnp.ndarray):
    """Sort 1-D arrays lexicographically by (hi, lo); co-sorts `values`.

    Returns (hi_sorted, lo_sorted, *values_sorted).
    """
    return jax.lax.sort((hi, lo) + tuple(values), num_keys=2, is_stable=True)


def pair_less(ah, al, bh, bl):
    """Lexicographic (ah, al) < (bh, bl)."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def searchsorted_pair(hi_arr: jnp.ndarray, lo_arr: jnp.ndarray,
                      q_hi: jnp.ndarray, q_lo: jnp.ndarray):
    """Vectorized lower-bound binary search on a lexicographically sorted
    (hi_arr, lo_arr) pair. Returns (idx, found) where `found` means an exact
    match exists at `idx` (idx is clamped to len-1 when not found).
    """
    n = hi_arr.shape[0]
    steps = max(1, math.ceil(math.log2(max(n, 2))) + 1)
    lo_b = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    hi_b = jnp.full(q_hi.shape, n, dtype=jnp.int32)

    def probe(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mh = hi_arr[mid]
        ml = lo_arr[mid]
        less = pair_less(mh, ml, q_hi, q_lo)
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    if ROLLED_SEARCH:
        # rolled fori_loop: ~18x smaller HLO; used where COMPILE time
        # dominates (CPU tests, the multichip dryrun — round 1's dryrun
        # timed out compiling the unrolled form). On TPU the rolled loop
        # executes its per-round gathers ~2 orders of magnitude slower
        # (measured 4.4 s/step of while-loops in the sampling scan), so
        # the unrolled python loop is the execution default.
        lo_b, hi_b = jax.lax.fori_loop(0, steps, probe, (lo_b, hi_b))
    else:
        carry = (lo_b, hi_b)
        for _ in range(steps):
            carry = probe(0, carry)
        lo_b, hi_b = carry
    idx = jnp.clip(lo_b, 0, n - 1)
    found = (hi_arr[idx] == q_hi) & (lo_arr[idx] == q_lo)
    return idx, found
