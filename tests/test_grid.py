"""Unit tests for the fixed-capacity voxel geometry (quantize / pool /
kernel maps) against brute-force numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.ops import grid as G
from lidiff_tpu.ops import keys as K


def _np_voxelize(points, res):
    """Dict-based reference: voxel -> (mean feat, point ids)."""
    c = np.round(points / res).astype(np.int64)
    vox = {}
    for i, cc in enumerate(map(tuple, c)):
        vox.setdefault(cc, []).append(i)
    return vox


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(K.COORD_MIN, K.COORD_MAX + 1, size=(100, 3))
    batch = rng.integers(0, 7, size=(100,))
    hi, lo, valid = K.pack(jnp.asarray(batch), jnp.asarray(coords))
    assert bool(jnp.all(valid))
    b2, c2 = K.unpack(hi, lo)
    np.testing.assert_array_equal(np.asarray(b2), batch)
    np.testing.assert_array_equal(np.asarray(c2), coords)


def test_pack_out_of_range_invalid():
    hi, lo, valid = K.pack(jnp.zeros((2,), jnp.int32),
                           jnp.asarray([[0, 0, 5000], [1, 2, 3]], jnp.int32))
    assert not bool(valid[0]) and bool(valid[1])
    assert int(hi[0]) == K.HI_PAD


def test_searchsorted_pair():
    rng = np.random.default_rng(1)
    coords = rng.integers(-50, 50, size=(200, 3))
    coords = np.unique(coords, axis=0)
    batch = np.zeros(len(coords), np.int32)
    hi, lo, _ = K.pack(jnp.asarray(batch), jnp.asarray(coords))
    hi, lo = K.lexsort(hi, lo)
    # queries: half present, half absent
    q = np.vstack([coords[::2], coords[::2] + 1000])
    qh, ql, _ = K.pack(jnp.zeros((len(q),), jnp.int32), jnp.asarray(q))
    idx, found = K.searchsorted_pair(hi, lo, qh, ql)
    idx, found = np.asarray(idx), np.asarray(found)
    present_set = set(map(tuple, coords))
    expect = np.array([tuple(row) in present_set for row in q])
    np.testing.assert_array_equal(found, expect)
    _, c_all = K.unpack(hi[jnp.asarray(idx)], lo[jnp.asarray(idx)])
    c_all = np.asarray(c_all)
    np.testing.assert_array_equal(c_all[expect], q[expect])


def test_quantize_unweighted_average():
    rng = np.random.default_rng(2)
    B, N, res, cap = 2, 300, 0.25, 700
    pts = rng.normal(0, 3, size=(B, N, 3)).astype(np.float32)
    geom, vox_feats, p2v = jax.jit(
        G.quantize, static_argnums=(1, 2))(jnp.asarray(pts), res, cap)
    vox_feats = np.asarray(vox_feats)
    p2v = np.asarray(p2v)
    coords = np.asarray(geom.coords)
    mask = np.asarray(geom.mask)

    for b in range(B):
        ref = _np_voxelize(pts[b], res)
        n_ref = len(ref)
        got = {tuple(coords[v, 1:]) for v in np.unique(p2v[b])}
        assert len(got) == n_ref
        for cc, ids in ref.items():
            vs = {p2v[b, i] for i in ids}
            assert len(vs) == 1           # all points of a voxel agree
            v = vs.pop()
            assert mask[v]
            np.testing.assert_array_equal(coords[v, 1:], np.asarray(cc))
            assert coords[v, 0] == b
            np.testing.assert_allclose(
                vox_feats[v], pts[b][ids].mean(0), rtol=1e-5, atol=1e-5)
    total = sum(len(_np_voxelize(pts[b], res)) for b in range(B))
    assert int(geom.num) == total
    # keys sorted ascending with padding at the end
    hi = np.asarray(geom.key_hi)
    assert np.all(np.diff(hi.astype(np.int64)) >= 0)


def test_quantize_banker_rounding_matches_torch_round():
    # torch.round / np.round use round-half-to-even (collations.py:10 parity)
    pts = jnp.asarray([[[0.5, 1.5, 2.5]]]) * 1.0
    geom, _, _ = G.quantize(pts, 1.0, 8)
    c = np.asarray(geom.coords[0, 1:])
    np.testing.assert_array_equal(c, [0, 2, 2])


def test_quantize_overflow_deterministic():
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 5, size=(1, 300, 3)).astype(np.float32)
    g_full, _, p2v_full = G.quantize(jnp.asarray(pts), 0.1, 400)
    n = int(g_full.num)
    cap = n - 10
    g_small, _, p2v_small = G.quantize(jnp.asarray(pts), 0.1, cap)
    assert int(g_small.num) == cap
    # the surviving voxels are exactly the lowest-key prefix
    np.testing.assert_array_equal(
        np.asarray(g_small.key_hi), np.asarray(g_full.key_hi[:cap]))
    # dropped points are flagged with the sentinel
    dropped = np.asarray(p2v_small[0]) == cap
    assert dropped.sum() > 0


def test_slice_to_points_roundtrip():
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 2, size=(2, 100, 3)).astype(np.float32)
    geom, vox_feats, p2v = G.quantize(jnp.asarray(pts), 0.5, 256)
    sliced = G.slice_to_points(vox_feats, p2v)
    # every point receives its voxel's mean: re-averaging per voxel is identity
    ref = _np_voxelize(pts.reshape(-1, 3), 0.5)
    # points in the same voxel (and batch) share the sliced value
    flat = np.asarray(sliced).reshape(-1, 3)
    p2v_flat = np.asarray(p2v).reshape(-1)
    for v in np.unique(p2v_flat):
        rows = flat[p2v_flat == v]
        assert np.allclose(rows, rows[0])


def test_pool_geom_floor_division():
    # negative coords must floor (ME stride semantics), not truncate
    pts = jnp.asarray([[[-0.05, 0.0, 0.0], [0.05, 0.0, 0.0]]])  # res 0.05 -> x=-1, 1
    geom, _, _ = G.quantize(pts, 0.05, 8)
    pooled, c2p = G.pool_geom(geom, 8)
    coords = np.asarray(pooled.coords)[np.asarray(pooled.mask)]
    xs = sorted(coords[:, 1].tolist())
    assert xs == [-2, 0]          # floor(-1/2)*2 = -2


def test_pool_child2parent():
    rng = np.random.default_rng(5)
    pts = rng.normal(0, 2, size=(2, 200, 3)).astype(np.float32)
    geom, _, _ = G.quantize(jnp.asarray(pts), 0.2, 512)
    pooled, c2p = G.pool_geom(geom, 512)
    coords = np.asarray(geom.coords)
    pcoords = np.asarray(pooled.coords)
    c2p = np.asarray(c2p)
    mask = np.asarray(geom.mask)
    for v in range(len(coords)):
        if not mask[v]:
            assert c2p[v] == 512
            continue
        parent = c2p[v]
        expect = (coords[v, 1:] // 2) * 2
        np.testing.assert_array_equal(pcoords[parent, 1:], expect)
        assert pcoords[parent, 0] == coords[v, 0]
    assert np.asarray(pooled.stride) == 2


def test_kernel_map_vs_bruteforce():
    rng = np.random.default_rng(6)
    pts = rng.normal(0, 1.5, size=(2, 150, 3)).astype(np.float32)
    geom, _, _ = G.quantize(jnp.asarray(pts), 0.5, 256)
    kmap = G.build_kernel_map(geom, geom, G.cube_offsets(3, 1))
    coords = np.asarray(geom.coords)
    mask = np.asarray(geom.mask)
    idx = np.asarray(kmap.idx)
    hit = np.asarray(kmap.hit)
    table = {(coords[v, 0], *coords[v, 1:]): v
             for v in range(len(coords)) if mask[v]}
    offs = np.asarray(G.cube_offsets(3, 1))
    for v in range(len(coords)):
        for k in range(27):
            q = (coords[v, 0], *(coords[v, 1:] + offs[k]))
            if mask[v] and q in table:
                assert hit[v, k]
                assert idx[v, k] == table[q]
            else:
                assert not hit[v, k]


def test_build_pyramid_shapes_and_up_maps():
    rng = np.random.default_rng(7)
    pts = rng.normal(0, 2, size=(2, 400, 3)).astype(np.float32)
    caps = [1024] * 5
    pyr = G.build_pyramid(jnp.asarray(pts), 0.2, caps, 5)
    assert len(pyr.levels) == 5
    strides = [lvl.geom.stride for lvl in pyr.levels]
    assert strides == [1, 2, 4, 8, 16]
    # every valid fine voxel has a valid parent and consistent tap
    for li in range(4):
        fine = pyr.levels[li].geom
        coarse = pyr.levels[li + 1].geom
        pidx = np.asarray(pyr.levels[li].parent_idx)
        tap = np.asarray(pyr.levels[li].up_tap)
        fmask = np.asarray(fine.mask)
        fcoords = np.asarray(fine.coords)
        ccoords = np.asarray(coarse.coords)
        offs = np.asarray(G.cube_offsets(2, fine.stride))
        vs = np.nonzero(fmask)[0]
        ps = pidx[vs]
        assert np.all(ps < coarse.capacity)
        np.testing.assert_array_equal(
            ccoords[ps, 1:] + offs[tap[vs]], fcoords[vs, 1:])


def test_quantize_jit_consistency():
    # jitted and eager paths agree
    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.normal(0, 2, size=(1, 128, 3)).astype(np.float32))
    g1, f1, m1 = G.quantize(pts, 0.3, 200)
    g2, f2, m2 = jax.jit(G.quantize, static_argnums=(1, 2))(pts, 0.3, 200)
    np.testing.assert_array_equal(np.asarray(g1.key_hi), np.asarray(g2.key_hi))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
