"""Sparse conv / transpose conv / masked BN vs dense numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import grid as G
from lidiff_tpu.ops.sparse_conv import (masked_moments, sparse_conv,
                                        sparse_conv_transpose)


def _make_grid(seed=0, B=2, N=120, res=0.4, cap=256):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1.2, size=(B, N, 3)).astype(np.float32)
    geom, vox_feats, p2v = G.quantize(jnp.asarray(pts), res, cap)
    return geom, np.asarray(vox_feats), rng


def _dense_conv_ref(coords, mask, feats, offs, W):
    """Dict-based dense reference convolution."""
    table = {(coords[v, 0], *coords[v, 1:]): v
             for v in range(len(coords)) if mask[v]}
    out = np.zeros((len(coords), W.shape[-1]), np.float32)
    for v in range(len(coords)):
        if not mask[v]:
            continue
        acc = np.zeros(W.shape[-1], np.float32)
        for k in range(len(offs)):
            q = (coords[v, 0], *(coords[v, 1:] + offs[k]))
            if q in table:
                acc += feats[table[q]] @ W[k]
        out[v] = acc
    return out


def test_sparse_conv_matches_dense_reference():
    geom, vox_feats, rng = _make_grid()
    kmap = G.build_kernel_map(geom, geom, G.cube_offsets(3, 1))
    Cin, Cout = 3, 8
    W = rng.normal(0, 0.3, size=(27, Cin, Cout)).astype(np.float32)
    out = sparse_conv(jnp.asarray(vox_feats), kmap, jnp.asarray(W),
                      geom.mask)
    out_f = sparse_conv(jnp.asarray(vox_feats), kmap, jnp.asarray(W),
                        geom.mask, fused=True)
    coords = np.asarray(geom.coords)
    mask = np.asarray(geom.mask)
    offs = np.asarray(G.cube_offsets(3, 1))
    ref = _dense_conv_ref(coords, mask, vox_feats, offs, W)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f), ref, rtol=1e-4, atol=1e-5)


def test_down_conv_matches_dense_reference():
    geom, vox_feats, rng = _make_grid(seed=1)
    pooled, _ = G.pool_geom(geom, 256)
    kmap = G.build_kernel_map(geom, pooled, G.cube_offsets(2, 1))
    W = rng.normal(0, 0.3, size=(8, 3, 4)).astype(np.float32)
    out = sparse_conv(jnp.asarray(vox_feats), kmap, jnp.asarray(W),
                      pooled.mask)
    ref = _dense_conv_ref_down(np.asarray(geom.coords), np.asarray(geom.mask),
                               vox_feats, np.asarray(pooled.coords),
                               np.asarray(pooled.mask),
                               np.asarray(G.cube_offsets(2, 1)), W)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_down_conv_child_form_matches_gather_form():
    """The GEMM + tap-gather + scatter-add child form (sparse_conv_down,
    the production DownStage path) must match the 8-tap gather form up to
    the reduction-order ulp, forward AND grads, incl. grouped G=2 and the
    bias/ReLU epilogue."""
    geom, vox_feats, rng = _make_grid(seed=3, B=2, N=400, cap=512)
    pooled, c2p = G.pool_geom(geom, 300)   # force some capacity overflow
    kmap = G.build_kernel_map(geom, pooled, G.cube_offsets(2, 1))
    parent_idx, tap = G.up_maps(geom, c2p)
    for Gr, Cin, Cout in ((1, 3, 8), (2, 5, 4)):
        V = geom.capacity
        f = rng.normal(0, 1, (V, Gr * Cin)).astype(np.float32)
        f = np.where(np.asarray(geom.mask)[:, None], f, 0)
        W = rng.normal(0, 0.3, (8, Cin, Cout)).astype(np.float32)
        b = rng.normal(0, 0.5, (Cout,)).astype(np.float32)

        def g_form(f, W):
            return sparse_conv(f, kmap, W, pooled.mask, groups=Gr,
                               bias=jnp.asarray(b), relu=True)

        def c_form(f, W):
            return sparse_conv(f, G.DownMap(parent_idx, tap), W,
                               pooled.mask, groups=Gr, bias=jnp.asarray(b),
                               relu=True)

        a = g_form(jnp.asarray(f), jnp.asarray(W))
        c = c_form(jnp.asarray(f), jnp.asarray(W))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)

        def loss(form):
            return lambda f, W: jnp.sum(form(f, W) ** 2)

        ga = jax.grad(loss(g_form), argnums=(0, 1))(jnp.asarray(f),
                                                    jnp.asarray(W))
        gc = jax.grad(loss(c_form), argnums=(0, 1))(jnp.asarray(f),
                                                    jnp.asarray(W))
        for x, y in zip(ga, gc):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)


def test_down_conv_bf16_drift():
    """ADVICE r4: with LIDIFF_COMPUTE_DTYPE=bfloat16 the child-form down
    conv casts the GEMM output f32->bf16 BEFORE the scatter-add, so a
    parent's <=8 children accumulate in bf16. Bound that drift against the
    f32 dense reference: it must stay within the bf16 rounding regime of
    one GEMM + an 8-term sum (~2^-8 relative), nowhere near an
    accumulation blow-up."""
    from lidiff_tpu.ops import sparse_conv as sc
    geom, vox_feats, rng = _make_grid(seed=5, B=2, N=400, cap=512)
    pooled, c2p = G.pool_geom(geom, 300)
    parent_idx, tap = G.up_maps(geom, c2p)
    W = rng.normal(0, 0.3, size=(8, 3, 8)).astype(np.float32)
    ref = _dense_conv_ref_down(np.asarray(geom.coords),
                               np.asarray(geom.mask), vox_feats,
                               np.asarray(pooled.coords),
                               np.asarray(pooled.mask),
                               np.asarray(G.cube_offsets(2, 1)), W)
    sc.set_compute_dtype("bfloat16")
    try:
        out = sparse_conv(jnp.asarray(vox_feats), G.DownMap(parent_idx, tap),
                          jnp.asarray(W), pooled.mask)
    finally:
        sc.set_compute_dtype("float32")
    err = np.abs(np.asarray(out, np.float32) - ref)
    scale = np.maximum(np.abs(ref), 1.0)
    assert (err / scale).max() < 0.02, (err / scale).max()


def _dense_conv_ref_down(in_coords, in_mask, feats, out_coords, out_mask,
                         offs, W):
    table = {(in_coords[v, 0], *in_coords[v, 1:]): v
             for v in range(len(in_coords)) if in_mask[v]}
    out = np.zeros((len(out_coords), W.shape[-1]), np.float32)
    for v in range(len(out_coords)):
        if not out_mask[v]:
            continue
        for k in range(len(offs)):
            q = (out_coords[v, 0], *(out_coords[v, 1:] + offs[k]))
            if q in table:
                out[v] += feats[table[q]] @ W[k]
    return out


def test_transpose_conv_matches_scatter_reference():
    geom, _, rng = _make_grid(seed=2)
    pooled, c2p = G.pool_geom(geom, 256)
    parent_idx, tap = G.up_maps(geom, c2p)
    Cin, Cout = 5, 7
    Vc = pooled.capacity
    coarse_feats = rng.normal(0, 1, size=(Vc, Cin)).astype(np.float32)
    coarse_feats[~np.asarray(pooled.mask)] = 0
    W = rng.normal(0, 0.3, size=(8, Cin, Cout)).astype(np.float32)
    out = sparse_conv_transpose(jnp.asarray(coarse_feats), parent_idx, tap,
                                jnp.asarray(W), geom.mask)
    # scatter reference: each coarse voxel contributes W[k] to fine voxel
    # at coarse + off_k
    fine_table = {(c[0], *c[1:]): v for v, c in
                  enumerate(np.asarray(geom.coords))
                  if np.asarray(geom.mask)[v]}
    ref = np.zeros((geom.capacity, Cout), np.float32)
    offs = np.asarray(G.cube_offsets(2, 1))
    pc = np.asarray(pooled.coords)
    pm = np.asarray(pooled.mask)
    for u in range(Vc):
        if not pm[u]:
            continue
        for k in range(8):
            q = (pc[u, 0], *(pc[u, 1:] + offs[k]))
            if q in fine_table:
                ref[fine_table[q]] += coarse_feats[u] @ W[k]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_masked_moments():
    rng = np.random.default_rng(3)
    feats = rng.normal(2, 3, size=(64, 5)).astype(np.float32)
    mask = rng.random(64) > 0.4
    feats_j = jnp.asarray(feats)
    mean, var, cnt = masked_moments(feats_j, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean), feats[mask].mean(0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), feats[mask].var(0),
                               rtol=1e-4)
    assert int(cnt) == mask.sum()


def test_sparse_conv_grad_flows():
    geom, vox_feats, rng = _make_grid(seed=4, N=60, cap=128)
    kmap = G.build_kernel_map(geom, geom, G.cube_offsets(3, 1))
    W = jnp.asarray(rng.normal(0, 0.3, size=(27, 3, 4)).astype(np.float32))

    def loss(w, f):
        out = sparse_conv(f, kmap, w, geom.mask)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(W, jnp.asarray(vox_feats))
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gw).sum()) > 0
    assert float(jnp.abs(gf).sum()) > 0
