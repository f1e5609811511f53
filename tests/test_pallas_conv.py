"""Exact-equivalence tests for the fused Pallas column conv
(ops/pallas_conv.py) against the XLA reference path
(ops/sparse_conv.sparse_conv_columns), in pallas interpret mode on CPU.

The kernel replaces the conv engine of the denoiser hot path (reference
/root/reference/lidiff/models/minkunet.py:13-76 conv blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.ops import sparse_conv as sc
from lidiff_tpu.ops.grid import build_pyramid
from lidiff_tpu.ops.pallas_conv import conv_columns_pallas


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 4, (1, 1600, 3)).astype(np.float32)
    caps = [1280, 896, 640, 512, 384]
    return jax.jit(lambda p: build_pyramid(p, 0.25, caps, 5))(
        jnp.asarray(pts))


@pytest.mark.parametrize("lv", [0, pytest.param(2, marks=pytest.mark.slow),
                                pytest.param(4, marks=pytest.mark.slow)])
def test_matches_xla_exactly(pyramid, lv):
    rng = np.random.default_rng(lv)
    L = pyramid.levels[lv]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    ref = sc.sparse_conv_columns(jnp.asarray(feats), L.kmap3,
                                 jnp.asarray(w), L.geom.mask)
    got, ov = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                  L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                  interpret=True)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_grouped_matches_per_group(pyramid):
    """G=2 fused streams == two independent G=1 calls (classifier-free
    fusion, reference models.py:98-103)."""
    rng = np.random.default_rng(7)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co, G = 8, 16, 2
    feats = rng.normal(0, 1, (V, G * C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    got, ov = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                  L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                  groups=G, interpret=True)
    assert int(ov) == 0
    for g in range(G):
        solo, _ = conv_columns_pallas(
            jnp.asarray(feats[:, g * C:(g + 1) * C]), L.kmap3.col_idx,
            L.kmap3.hit, jnp.asarray(w), L.geom.mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got[:, g * Co:(g + 1) * Co]),
                                   np.asarray(solo), rtol=0, atol=1e-5)


def test_window_overflow_drops_taps_not_garbage(pyramid):
    """With an artificially tiny window (nblk=1... impossible spans), rows
    outside the window must be counted in `overflow` and contribute
    exactly zero — never garbage."""
    rng = np.random.default_rng(3)
    L = pyramid.levels[0]
    V = L.geom.capacity
    C, Co = 8, 8
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    got, ov = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                  L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                  nblk=1, interpret=True)
    assert int(ov) > 0          # the tiny window must actually overflow
    # oracle: XLA conv with the out-of-window taps masked out of the kmap,
    # per z-tap (the kernel drops exactly the taps whose own window row
    # falls outside [0, nblk*T))
    T = 128
    nt = max(-(-V // T), 1)
    ci = np.asarray(L.kmap3.col_idx)
    hit = np.asarray(L.kmap3.hit).copy()
    ci_p = np.pad(ci, ((0, nt * T - V), (0, 0)))
    blk = np.clip(ci_p[::T] // T, 0, nt - 1)
    rel = (ci_p.reshape(nt, T, 9) -
           blk[:, None, :] * T).reshape(nt * T, 9)[:V]    # [V, 9]
    for j in range(9):
        m0 = hit[:, 3 * j].astype(np.int64)
        m1 = hit[:, 3 * j + 1].astype(np.int64)
        rows = np.stack([rel[:, j], rel[:, j] + m0,
                         rel[:, j] + m0 + m1], axis=1)    # [V, 3]
        inside = (rows >= 0) & (rows < T)
        hit[:, 3 * j:3 * j + 3] &= inside
    from lidiff_tpu.ops.grid import ColumnKernelMap
    kmap_masked = ColumnKernelMap(col_idx=L.kmap3.col_idx,
                                  hit=jnp.asarray(hit))
    ref = sc.sparse_conv_columns(jnp.asarray(feats), kmap_masked,
                                 jnp.asarray(w), L.geom.mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_big_c_split_matches_xla(pyramid):
    """C > 256 triggers the exact channel-split path (U0's 384-wide concat
    conv, reference minkunet.py:283-310)."""
    rng = np.random.default_rng(11)
    L = pyramid.levels[3]
    V = L.geom.capacity
    C, Co = 272, 16     # > 256 forces the split; non-multiple-of-16 half
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    ref = sc.sparse_conv_columns(jnp.asarray(feats), L.kmap3,
                                 jnp.asarray(w), L.geom.mask)
    got, ov = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                  L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                  interpret=True)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


@pytest.mark.slow
def test_tiled_kmap_path_matches(pyramid):
    """The pre-tiled layout from the Pallas kernel-map builder must give
    the same conv output as the raw col_idx/hit prolog path."""
    from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas
    rng = np.random.default_rng(21)
    L = pyramid.levels[1]
    g = L.geom
    V = g.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(g.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    km = build_kmap3_columns_pallas(g, interpret=True)
    base, _ = conv_columns_pallas(jnp.asarray(feats), km.col_idx, km.hit,
                                  jnp.asarray(w), g.mask, interpret=True)
    tiled, _ = conv_columns_pallas(jnp.asarray(feats), km.col_idx, km.hit,
                                   jnp.asarray(w), g.mask, interpret=True,
                                   blk=km.blk, col_r=km.col_r,
                                   hit_r=km.hit_r)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("lv", [0, pytest.param(2, marks=pytest.mark.slow),
                                pytest.param(4, marks=pytest.mark.slow)])
def test_v2_manual_dma_matches_xla(pyramid, lv):
    """The manual double-buffered DMA variant (conv_columns_pallas_v2) must
    match the XLA reference exactly — same selectors and GEMMs, only the
    window streaming differs."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    rng = np.random.default_rng(60 + lv)
    L = pyramid.levels[lv]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    ref = sc.sparse_conv_columns(jnp.asarray(feats), L.kmap3,
                                 jnp.asarray(w), L.geom.mask)
    got, ov = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                     L.kmap3.hit, jnp.asarray(w),
                                     L.geom.mask, interpret=True)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_v2_grouped_and_epilogue(pyramid):
    """v2 with G=2 + folded bias/ReLU epilogue matches v1's output."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    rng = np.random.default_rng(71)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co, G = 8, 16, 2
    feats = rng.normal(0, 1, (V, G * C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    c = rng.normal(0, 0.5, (Co,)).astype(np.float32)
    v1, _ = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                groups=G, interpret=True,
                                bias=jnp.asarray(c), relu=True)
    v2, ov = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                    L.kmap3.hit, jnp.asarray(w),
                                    L.geom.mask, groups=G, interpret=True,
                                    bias=jnp.asarray(c), relu=True)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=0, atol=1e-5)


def test_v2_tiled_kmap_path_matches(pyramid):
    """v2 fed the pre-tiled kernel-map layout must match its raw path."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas
    rng = np.random.default_rng(81)
    L = pyramid.levels[1]
    g = L.geom
    V = g.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(g.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    km = build_kmap3_columns_pallas(g, interpret=True)
    base, _ = conv_columns_pallas_v2(jnp.asarray(feats), km.col_idx,
                                     km.hit, jnp.asarray(w), g.mask,
                                     interpret=True)
    tiled, _ = conv_columns_pallas_v2(jnp.asarray(feats), km.col_idx,
                                      km.hit, jnp.asarray(w), g.mask,
                                      interpret=True, blk=km.blk,
                                      col_r=km.col_r, hit_r=km.hit_r)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("lv", [0, pytest.param(3, marks=pytest.mark.slow)])
def test_custom_vjp_grads_match_xla(pyramid, lv):
    """The conv's custom_vjp (bwd-feats = tap-reversed transposed-weight
    conv over the same map; bwd-weights = slab^T@g kernel) must match
    autodiff through the XLA gather conv to f32 tolerance."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_ad
    rng = np.random.default_rng(40 + lv)
    L = pyramid.levels[lv]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    cot = rng.normal(0, 1, (V, Co)).astype(np.float32)

    def loss_xla(f, ww):
        out = sc.sparse_conv_columns(f, L.kmap3, ww, L.geom.mask,
                                     allow_pallas=False)
        return jnp.sum(out * cot)

    def loss_pallas(f, ww):
        out = conv_columns_pallas_ad(1, 4, True, f, ww, L.kmap3.col_idx,
                                     L.kmap3.hit, L.geom.mask)
        return jnp.sum(out * cot)

    df_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(feats),
                                                    jnp.asarray(w))
    df_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(feats),
                                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=0, atol=2e-4)


@pytest.mark.slow
def test_custom_vjp_grads_grouped_and_bigc(pyramid):
    """Grouped streams (G=2) and the C>128 split path must also
    differentiate correctly (weights shared across groups sum their
    contributions)."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_ad
    rng = np.random.default_rng(77)
    L = pyramid.levels[3]
    V = L.geom.capacity
    G, C, Co = 2, 136, 8     # C>128 exercises the split recursion
    feats = rng.normal(0, 1, (V, G * C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    cot = rng.normal(0, 1, (V, G * Co)).astype(np.float32)

    def loss_xla(f, ww):
        out = sc.sparse_conv_columns(f, L.kmap3, ww, L.geom.mask, groups=G,
                                     allow_pallas=False)
        return jnp.sum(out * cot)

    def loss_pallas(f, ww):
        out = conv_columns_pallas_ad(G, 4, True, f, ww, L.kmap3.col_idx,
                                     L.kmap3.hit, L.geom.mask)
        return jnp.sum(out * cot)

    df_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(feats),
                                                    jnp.asarray(w))
    df_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(feats),
                                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=0, atol=5e-4)


def test_custom_vjp_forward_matches_nonad(pyramid):
    """The AD wrapper's forward must be bit-identical to the raw kernel."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_ad
    rng = np.random.default_rng(51)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    raw, _ = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                 L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                 interpret=True)
    ad = conv_columns_pallas_ad(1, 4, True, jnp.asarray(feats),
                                jnp.asarray(w), L.kmap3.col_idx,
                                L.kmap3.hit, L.geom.mask)
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(raw))


def test_bias_relu_epilogue(pyramid):
    """Folded conv+BN(+ReLU) epilogue == separate bias-add + relu + mask
    (the eval-mode BN fold, reference BasicConvolutionBlock semantics
    minkunet.py:13-29)."""
    rng = np.random.default_rng(31)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    c = rng.normal(0, 0.5, (Co,)).astype(np.float32)
    base, _ = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                  L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                  interpret=True)
    ref = np.maximum(np.asarray(base) + c, 0)
    ref[~np.asarray(L.geom.mask)] = 0.0
    got, _ = conv_columns_pallas(jnp.asarray(feats), L.kmap3.col_idx,
                                 L.kmap3.hit, jnp.asarray(w), L.geom.mask,
                                 interpret=True, bias=jnp.asarray(c),
                                 relu=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=1e-5)


def test_pre_layout_and_tile_skip_match(pyramid):
    """The builder-precomputed (lo, col4, hit4) layouts and the
    nvalid tile-skip must reproduce the prolog path exactly: identical
    valid rows, exact zeros past nvalid."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_dispatch
    from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas
    rng = np.random.default_rng(77)
    L = pyramid.levels[1]
    g = L.geom
    V = g.capacity
    km = build_kmap3_columns_pallas(g, interpret=True)
    assert km.pre is not None and km.nvalid is not None
    for G, C, Co in ((1, 16, 24), (2, 80, 64)):
        feats = rng.normal(0, 1, (V, G * C)).astype(np.float32)
        feats[~np.asarray(g.mask)] = 0.0
        w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
        base, _ = conv_columns_dispatch(
            jnp.asarray(feats), km.col_idx, km.hit, jnp.asarray(w),
            g.mask, groups=G, interpret=True,
            col_r=km.col_r, hit_r=km.hit_r)
        got, _ = conv_columns_dispatch(
            jnp.asarray(feats), km.col_idx, km.hit, jnp.asarray(w),
            g.mask, groups=G, interpret=True,
            col_r=km.col_r, hit_r=km.hit_r, pre=km.pre, nvalid=km.nvalid)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
        # force skipping: declare only the first half valid — tiles past
        # it must come back exact zeros, tiles before it bit-identical
        nv = V // 2
        half, _ = conv_columns_dispatch(
            jnp.asarray(feats), km.col_idx, km.hit, jnp.asarray(w),
            g.mask, groups=G, interpret=True,
            col_r=km.col_r, hit_r=km.hit_r, pre=km.pre,
            nvalid=jnp.int32(nv))
        np.testing.assert_array_equal(np.asarray(half)[:nv],
                                      np.asarray(base)[:nv])
        assert (np.asarray(half)[-(V - nv - 256):] == 0).all()


def _fake_quant(feats, G, C):
    """The kernel's exact quantization formula, applied in numpy:
    per-channel symmetric int8, scales shared across groups."""
    V = feats.shape[0]
    f3 = feats.reshape(V, G, C).astype(np.float64)
    amax = np.abs(f3).max(axis=(0, 1))
    scale = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
    q = np.clip(np.round(f3.astype(np.float32) / scale[None, None, :]),
                -127, 127).astype(np.float32)
    return (q * scale[None, None, :]).reshape(V, G * C), scale


def test_quant_exact_on_integer_feats(pyramid):
    """With integer-valued feats whose per-channel amax is exactly 127,
    the int8 path is bit-exact vs the unquantized v2 kernel (scale == 1,
    every row pick and cast exact)."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    rng = np.random.default_rng(90)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co, G = 32, 24, 2
    feats = rng.integers(-127, 128, (V, G * C)).astype(np.float32)
    feats[:1] = 127.0                     # pin per-channel amax to 127
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    base, _ = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                     L.kmap3.hit, jnp.asarray(w),
                                     L.geom.mask, groups=G, interpret=True)
    got, ov = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                     L.kmap3.hit, jnp.asarray(w),
                                     L.geom.mask, groups=G, interpret=True,
                                     quant=True)
    assert int(ov) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize("C,Co,G", [(32, 24, 1),
                                    pytest.param(48, 16, 2,
                                                 marks=pytest.mark.slow)])
def test_quant_matches_fake_quant_oracle(pyramid, C, Co, G):
    """The int8 kernel == the XLA f32 conv run on quantize-dequantized
    feats (the kernel's only approximation IS that quantization; the
    one-hot row pick and int32 accumulate are exact)."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    rng = np.random.default_rng(91 + C)
    L = pyramid.levels[2]
    V = L.geom.capacity
    feats = (rng.normal(0, 1, (V, G * C)) *
             rng.uniform(0.05, 8.0, (1, G * C))).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    fq, _ = _fake_quant(feats, G, C)
    ref = sc.sparse_conv_columns(jnp.asarray(fq), L.kmap3, jnp.asarray(w),
                                 L.geom.mask, groups=G)
    got, ov = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                     L.kmap3.hit, jnp.asarray(w),
                                     L.geom.mask, groups=G, interpret=True,
                                     quant=True)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_quant_dispatch_gates_geometry_convs(pyramid):
    """conv_columns_dispatch(quant=True) must leave Cin < 32 convs (stem /
    head: raw geometry-scaled inputs) unquantized — identical output to
    quant=False."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_dispatch
    rng = np.random.default_rng(93)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co = 16, 24
    feats = rng.normal(0, 3, (V, C)).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    base, _ = conv_columns_dispatch(jnp.asarray(feats), L.kmap3.col_idx,
                                    L.kmap3.hit, jnp.asarray(w),
                                    L.geom.mask, interpret=True)
    got, _ = conv_columns_dispatch(jnp.asarray(feats), L.kmap3.col_idx,
                                   L.kmap3.hit, jnp.asarray(w),
                                   L.geom.mask, interpret=True, quant=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_xla_fake_quant_mirror_matches_kernel(pyramid):
    """sparse_conv_columns' CONV_QUANT fake-quant mirror (the CPU / A-B
    path) must equal the Pallas int8 kernel: same formula, same gate."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_v2
    rng = np.random.default_rng(95)
    L = pyramid.levels[1]
    V = L.geom.capacity
    C, Co = 32, 16
    feats = (rng.normal(0, 1, (V, C)) *
             rng.uniform(0.1, 5.0, (1, C))).astype(np.float32)
    feats[~np.asarray(L.geom.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    b = rng.normal(0, 0.5, (Co,)).astype(np.float32)
    sc.set_conv_quant(True)
    try:
        ref = sc.sparse_conv_columns(jnp.asarray(feats), L.kmap3,
                                     jnp.asarray(w), L.geom.mask,
                                     bias=jnp.asarray(b), relu=True,
                                     allow_pallas=False)
    finally:
        sc.set_conv_quant(False)
    got, _ = conv_columns_pallas_v2(jnp.asarray(feats), L.kmap3.col_idx,
                                    L.kmap3.hit, jnp.asarray(w),
                                    L.geom.mask, interpret=True, quant=True,
                                    bias=jnp.asarray(b), relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


@pytest.mark.slow
def test_custom_vjp_grads_with_builder_layouts(pyramid):
    """Grads through the AD conv fed the kernel-map builder's pre-tiled
    layouts (blk/col_r/hit_r/pre/nvalid — the production training path,
    which routes dw through the v2 manual-DMA weight-grad kernel) must
    match XLA autodiff."""
    from lidiff_tpu.ops.pallas_conv import conv_columns_pallas_ad
    from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas
    rng = np.random.default_rng(99)
    L = pyramid.levels[1]
    g = L.geom
    V = g.capacity
    G, C, Co = 2, 16, 24
    km = build_kmap3_columns_pallas(g, interpret=True)
    assert km.pre is not None
    feats = rng.normal(0, 1, (V, G * C)).astype(np.float32)
    feats[~np.asarray(g.mask)] = 0.0
    w = rng.normal(0, 0.1, (27, C, Co)).astype(np.float32)
    cot = rng.normal(0, 1, (V, G * Co)).astype(np.float32)

    def loss_xla(f, ww):
        out = sc.sparse_conv_columns(f, km, ww, g.mask, groups=G,
                                     allow_pallas=False)
        return jnp.sum(out * cot)

    def loss_pallas(f, ww):
        out = conv_columns_pallas_ad(G, 4, True, f, ww, km.col_idx,
                                     km.hit, g.mask, km.blk, km.col_r,
                                     km.hit_r, km.pre, km.nvalid)
        return jnp.sum(out * cot)

    df_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(feats),
                                                    jnp.asarray(w))
    df_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(feats),
                                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=0, atol=2e-4)
