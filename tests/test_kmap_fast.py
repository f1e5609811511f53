"""The optimized kernel-map builders must agree exactly with the
brute-force binary-search builder."""

import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import grid as G


def _grid(seed, B=2, N=300, res=0.3, cap=700):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1.5, size=(B, N, 3)).astype(np.float32)
    geom, _, _ = G.quantize(jnp.asarray(pts), res, cap)
    return geom


def _assert_same_map(a: G.KernelMap, b: G.KernelMap):
    ha, hb = np.asarray(a.hit), np.asarray(b.hit)
    np.testing.assert_array_equal(ha, hb)
    ia, ib = np.asarray(a.idx), np.asarray(b.idx)
    np.testing.assert_array_equal(ia[ha], ib[hb])


def test_kmap3_columns_matches_bruteforce():
    for seed in [0, 1]:
        geom = _grid(seed)
        ref = G.build_kernel_map(geom, geom, G.cube_offsets(3, 1))
        fast = G.build_kmap3_columns(geom)
        _assert_same_map(fast, ref)


def test_kmap3_columns_strided_level():
    geom = _grid(2)
    pooled, c2p = G.pool_geom(geom, 700)
    ref = G.build_kernel_map(pooled, pooled, G.cube_offsets(3, 2))
    fast = G.build_kmap3_columns(pooled)
    _assert_same_map(fast, ref)


def test_sparse_conv_columns_matches_dense():
    from lidiff_tpu.ops.sparse_conv import sparse_conv
    rng = np.random.default_rng(4)
    geom = _grid(4)
    ref_map = G.build_kernel_map(geom, geom, G.cube_offsets(3, 1))
    col_map = G.build_kmap3_columns(geom)
    C = 8
    feats = jnp.asarray(
        rng.normal(0, 1, (geom.capacity, C)).astype(np.float32))
    feats = jnp.where(jnp.asarray(geom.mask)[:, None], feats, 0)
    w = jnp.asarray(rng.normal(0, 0.2, (27, C, 5)).astype(np.float32))
    ref = sparse_conv(feats, ref_map, w, geom.mask)
    fast = sparse_conv(feats, col_map, w, geom.mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_down_kmap_from_pooling_matches_bruteforce():
    geom = _grid(3)
    pooled, c2p = G.pool_geom(geom, 700)
    ref = G.build_kernel_map(geom, pooled, G.cube_offsets(2, 1))
    fast = G.down_kmap_from_pooling(geom, c2p, pooled.capacity)
    _assert_same_map(fast, ref)


def test_scan_taps_matches_unrolled_and_groups():
    """The rolled (lax.scan) tap-loop mode and the grouped (G=2) execution
    must both reproduce the unrolled single-group conv exactly."""
    from lidiff_tpu.ops import sparse_conv as sc
    rng = np.random.default_rng(5)
    geom = _grid(5)
    col_map = G.build_kmap3_columns(geom)
    C = 8
    f1 = jnp.asarray(rng.normal(0, 1, (geom.capacity, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(0, 1, (geom.capacity, C)).astype(np.float32))
    mask = jnp.asarray(geom.mask)
    f1 = jnp.where(mask[:, None], f1, 0)
    f2 = jnp.where(mask[:, None], f2, 0)
    w = jnp.asarray(rng.normal(0, 0.2, (27, C, 5)).astype(np.float32))

    old = sc.SCAN_TAPS
    try:
        sc.SCAN_TAPS = False
        r1 = np.asarray(sc.sparse_conv_columns(f1, col_map, w, mask))
        r2 = np.asarray(sc.sparse_conv_columns(f2, col_map, w, mask))
        both_un = np.asarray(sc.sparse_conv_columns(
            jnp.concatenate([f1, f2], 1), col_map, w, mask, groups=2))
        sc.SCAN_TAPS = True
        r1_s = np.asarray(sc.sparse_conv_columns(f1, col_map, w, mask))
        both_s = np.asarray(sc.sparse_conv_columns(
            jnp.concatenate([f1, f2], 1), col_map, w, mask, groups=2))
    finally:
        sc.SCAN_TAPS = old
    np.testing.assert_array_equal(r1_s, r1)
    np.testing.assert_array_equal(both_un[:, :5], r1)
    np.testing.assert_array_equal(both_un[:, 5:], r2)
    np.testing.assert_array_equal(both_s, both_un)
