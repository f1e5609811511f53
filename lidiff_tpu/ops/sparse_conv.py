"""Functional sparse convolution ops (gather -> GEMM -> accumulate).

TPU-native replacements for MinkowskiEngine's generalized sparse convolution
(reference call sites: /root/reference/lidiff/models/minkunet.py:13-80 conv /
deconv / BN blocks).  All shapes are static; kernel maps come precomputed
from `ops.grid.build_pyramid`, so a conv is K gathers + K GEMMs feeding the
MXU — no coordinate bookkeeping on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import os

from lidiff_tpu.ops.grid import ColumnKernelMap, DownMap, KernelMap

# Conv GEMM precision policy. HIGHEST keeps f32 matmuls exactly f32 (needed
# for golden tests vs numpy; the TPU/axon backends default f32 matmuls to
# bf16 products). DEFAULT uses the MXU's fast path (bf16 products, f32
# accumulate) — the right training/serving setting on TPU, matching how
# mixed-precision diffusion nets are normally run.
_PREC_MAP = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
}
PRECISION = _PREC_MAP[os.environ.get("LIDIFF_MATMUL_PRECISION",
                                     "highest").lower()]

# Optional low-precision conv compute: gathers and MXU products run in
# bfloat16 (halved HBM traffic, full-rate MXU) with f32 accumulation, while
# parameters and the functional interface stay f32.
COMPUTE_DTYPE = jnp.bfloat16 if os.environ.get(
    "LIDIFF_COMPUTE_DTYPE", "float32").lower() in ("bf16", "bfloat16") \
    else jnp.float32

# Rolled (lax.scan) tap loops: identical math, ~9-27x smaller HLO. Used
# where COMPILE time dominates (the CPU multichip dryrun, CPU tests);
# unrolled loops stay the default on TPU where XLA overlaps gathers across
# columns.
SCAN_TAPS = os.environ.get("LIDIFF_CONV_SCAN", "0").lower() in ("1", "true")

# Fused Pallas kernel for the 27-tap column convs (ops/pallas_conv.py):
# streams per-column VMEM windows and does the gather as exact one-hot
# matmuls on the MXU, cutting the conv's HBM traffic ~5x. TPU only (the
# interpret path is far too slow for CPU tests); default on, switchable
# per-process for A/B timing.
USE_PALLAS = os.environ.get("LIDIFF_PALLAS", "1").lower() in ("1", "true")

# int8 window payload for the EVAL conv kernels (LIDIFF_CONV_QUANT=int8):
# the one-hot gather GEMM — the dominant MXU cost — runs at 2x rate with
# half the window DMA bytes; the only approximation is per-channel int8
# quantization of activation-conv inputs (see conv_columns_pallas_v2).
# Training and the stem/head geometry convs always stay in COMPUTE_DTYPE.
CONV_QUANT = os.environ.get("LIDIFF_CONV_QUANT", "").lower() == "int8"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def set_use_pallas(flag: bool) -> None:
    global USE_PALLAS
    USE_PALLAS = bool(flag)


def set_conv_quant(flag: bool) -> None:
    """Toggle the int8 eval-conv path. Takes effect on the next TRACE of a
    caller (the flag is read at trace time); jitted closures traced before
    the toggle keep their path — set LIDIFF_CONV_QUANT per process for
    A/B timing."""
    global CONV_QUANT
    CONV_QUANT = bool(flag)


def set_precision(name: str) -> None:
    global PRECISION
    PRECISION = _PREC_MAP[name.lower()]


def set_compute_dtype(name: str) -> None:
    global COMPUTE_DTYPE
    COMPUTE_DTYPE = (jnp.bfloat16 if name.lower() in ("bf16", "bfloat16")
                     else jnp.float32)


def sparse_conv_columns(feats: jnp.ndarray, kmap: ColumnKernelMap,
                        weights: jnp.ndarray, out_mask: jnp.ndarray,
                        groups: int = 1, bias: jnp.ndarray | None = None,
                        relu: bool = False,
                        allow_pallas: bool = True) -> jnp.ndarray:
    """27-tap sparse conv over a column kernel map.

    The column map is cheap to BUILD (9 binary searches instead of 27);
    for the conv itself, plain per-tap row gathers are what XLA:TPU lowers
    efficiently (measured: a multi-row slice gather lowers to a scalar loop
    and is ~150x slower), so the dense per-tap indices are reconstructed
    arithmetically (rows p, p+m0, p+m0+m1) and the conv accumulates 27
    gather+GEMM pairs in the compute dtype.

    `groups`: feats is [V, G*Cin] (group-major channels) holding G
    INDEPENDENT feature sets over the SAME voxel geometry, convolved with
    the SAME weights. TPU row gathers are row-RATE-bound (measured: C=32
    and C=96 rows cost the same), so one gather of G-fold-wide rows serves
    all groups — this is how the sampler fuses the conditioned and
    unconditioned classifier-free passes (reference classfree_forward,
    /root/reference/lidiff/models/models.py:98-103) into one forward at
    roughly half the per-step gather cost. Each group's GEMM contracts
    exactly as the ungrouped conv would, so results match bitwise.
    """
    Kt, Cin, Cout = weights.shape
    assert Kt == 27
    G = groups
    assert feats.shape[-1] == G * Cin
    out_dtype = feats.dtype
    cf = feats.astype(COMPUTE_DTYPE)
    cw = weights.astype(COMPUTE_DTYPE)

    if USE_PALLAS and allow_pallas and _on_tpu():
        from lidiff_tpu.ops.pallas_conv import (DEFAULT_NBLK,
                                                conv_columns_dispatch,
                                                conv_columns_pallas_ad)
        if bias is None and not relu:
            # differentiable path (custom_vjp: bwd-feats is the same conv
            # with tap-reversed transposed weights, bwd-weights a slab^T@g
            # kernel) — the TRAINING convs run the fused kernel too
            out = conv_columns_pallas_ad(
                G, DEFAULT_NBLK, False, cf, cw, kmap.col_idx, kmap.hit,
                out_mask, getattr(kmap, "blk", None),
                getattr(kmap, "col_r", None), getattr(kmap, "hit_r", None),
                getattr(kmap, "pre", None), getattr(kmap, "nvalid", None))
            return out.astype(out_dtype)
        # fused bias/ReLU epilogue: eval-only (BN folded into the weights),
        # never differentiated. Per-call window overflow is discarded HERE
        # because the kernel-map builder counts it once per level for the
        # exact dispatch geometries (pallas_kmap.py), surfaced via Pyramid.
        out, _ = conv_columns_dispatch(cf, kmap.col_idx, kmap.hit, cw,
                                       out_mask, groups=G,
                                       out_dtype=out_dtype,
                                       blk=getattr(kmap, "blk", None),
                                       col_r=getattr(kmap, "col_r", None),
                                       hit_r=getattr(kmap, "hit_r", None),
                                       bias=bias, relu=relu,
                                       pre=getattr(kmap, "pre", None),
                                       nvalid=getattr(kmap, "nvalid", None),
                                       quant=CONV_QUANT)
        return out

    if CONV_QUANT and (bias is not None or relu) and Cin >= 32:
        # fake-quant mirror of the Pallas int8 path on the non-Pallas
        # (CPU / A-B) path: quantize-dequantize the input with the exact
        # kernel formula so end-to-end quality of LIDIFF_CONV_QUANT=int8
        # can be evaluated anywhere. Gated to the eval epilogue calls
        # (bias is the folded BN — training convs never quantize).
        f3 = cf.astype(jnp.float32).reshape(-1, G, Cin)
        amax = jnp.max(jnp.abs(f3), axis=(0, 1))
        scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(f3 / scale[None, None, :]), -127, 127)
        cf = (q * scale[None, None, :]).reshape(cf.shape).astype(cf.dtype)

    return _sparse_conv_columns_xla(cf, kmap, cw, out_mask, G, bias, relu,
                                    out_dtype)


def _sparse_conv_columns_xla(cf, kmap, cw, out_mask, G, bias, relu,
                             out_dtype):
    Kt, Cin, Cout = cw.shape

    # TPU gathers are row-RATE-bound, not byte-bound. Build a 3-row windowed
    # view once (sequential writes at full HBM bandwidth), then each column
    # needs ONE [V] row-gather of the 3*G*C-wide window instead of three
    # C-wide gathers per group: 9 gathers per conv regardless of groups.
    W = G * Cin
    fpad = jnp.concatenate([cf, jnp.zeros((2, W), cf.dtype)], 0)
    wnd = jnp.concatenate([fpad[:-2], fpad[1:-1], fpad[2:]], 1)  # [V, 3W]

    def one_column(base, hit3, w3):
        base = jnp.minimum(base, wnd.shape[0] - 1)
        g3 = wnd[base]                                     # [V, 3W]
        s0 = g3[:, :W]
        s1 = g3[:, W:2 * W]
        s2 = g3[:, 2 * W:]
        m0 = hit3[:, 0:1]
        m1 = hit3[:, 1:2]
        m2 = hit3[:, 2:3]
        # window rows of the three z-taps: 0, m0, m0+m1
        g_zm1 = jnp.where(m0, s0, 0)
        g_z0 = jnp.where(m1, jnp.where(m0, s1, s0), 0)
        r2 = m0.astype(jnp.int32) + m1.astype(jnp.int32)
        g_zp1 = jnp.where(m2, jnp.where(r2 == 2, s2,
                                        jnp.where(r2 == 1, s1, s0)), 0)
        per_g = []
        for g in range(G):
            sl = slice(g * Cin, (g + 1) * Cin)
            gg = jnp.concatenate([g_zm1[:, sl], g_z0[:, sl], g_zp1[:, sl]],
                                 axis=1)                   # [V, 3Cin]
            per_g.append(jnp.dot(gg, w3, preferred_element_type=out_dtype,
                                 precision=PRECISION))
        return per_g

    w3s = cw.reshape(9, 3 * Cin, Cout)
    if SCAN_TAPS:
        hitT = kmap.hit.reshape(-1, 9, 3).transpose(1, 0, 2)   # [9, V, 3]

        def body(acc, xs):
            base, hit3, w3 = xs
            per_g = one_column(base, hit3, w3)
            return tuple(a + p for a, p in zip(acc, per_g)), None

        init = tuple(jnp.zeros((kmap.col_idx.shape[0], Cout), out_dtype)
                     for _ in range(G))
        outs, _ = jax.lax.scan(body, init,
                               (kmap.col_idx.T, hitT, w3s))
        outs = list(outs)
    else:
        outs = [jnp.zeros((kmap.col_idx.shape[0], Cout), out_dtype)
                for _ in range(G)]
        for col in range(9):
            per_g = one_column(kmap.col_idx[:, col],
                               kmap.hit[:, col * 3:(col + 1) * 3], w3s[col])
            outs = [a + p for a, p in zip(outs, per_g)]
    out = outs[0] if G == 1 else jnp.concatenate(outs, axis=1)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), G)
    if relu:
        out = jnp.maximum(out, 0)
    return jnp.where(out_mask[:, None], out, 0)


def sparse_conv(feats: jnp.ndarray, kmap, weights: jnp.ndarray,
                out_mask: jnp.ndarray, *, fused: bool = False,
                groups: int = 1, bias: jnp.ndarray | None = None,
                relu: bool = False,
                allow_pallas: bool = True) -> jnp.ndarray:
    """Sparse convolution.

    Args:
      feats: [V_in, G*Cin] input voxel features (padding rows must be zero
        or will be masked by `kmap.hit`); G independent group feature sets
        over the same geometry (see sparse_conv_columns).
      kmap: gather map [V_out, K] (KernelMap) or a ColumnKernelMap for
        27-tap convs (slab-gather fast path).
      weights: [K, Cin, Cout] per-tap weights, shared across groups.
      out_mask: [V_out] validity of output voxels.
      fused: if True, materialize the [V_out, K*Cin] gathered matrix and run
        a single large GEMM (better MXU utilization, more memory); otherwise
        accumulate K small GEMMs.
    """
    if isinstance(kmap, ColumnKernelMap):
        return sparse_conv_columns(feats, kmap, weights, out_mask,
                                   groups=groups, bias=bias, relu=relu,
                                   allow_pallas=allow_pallas)
    if isinstance(kmap, DownMap):
        return sparse_conv_down(feats, kmap.parent_idx, kmap.tap, weights,
                                out_mask, groups=groups, bias=bias,
                                relu=relu)
    Kt, Cin, Cout = weights.shape
    G = groups
    assert feats.shape[-1] == G * Cin
    out_dtype = feats.dtype
    cf = feats.astype(COMPUTE_DTYPE)
    cw = weights.astype(COMPUTE_DTYPE)
    if fused and G == 1:
        g = cf[kmap.idx]                                 # [V, K, Cin]
        g = jnp.where(kmap.hit[..., None], g, 0)
        out = jnp.dot(g.reshape(g.shape[0], Kt * Cin),
                      cw.reshape(Kt * Cin, Cout),
                      preferred_element_type=out_dtype,
                      precision=PRECISION)
    else:
        def one_tap(idx_k, hit_k, w_k):
            g = cf[idx_k]                                # [V, G*Cin]
            g = jnp.where(hit_k[:, None], g, 0)
            return [jnp.dot(g[:, gi * Cin:(gi + 1) * Cin], w_k,
                            preferred_element_type=out_dtype,
                            precision=PRECISION) for gi in range(G)]

        init = tuple(jnp.zeros((kmap.idx.shape[0], Cout), out_dtype)
                     for _ in range(G))
        if SCAN_TAPS:
            def body(acc, xs):
                per_g = one_tap(*xs)
                return tuple(a + p for a, p in zip(acc, per_g)), None
            outs, _ = jax.lax.scan(body, init,
                                   (kmap.idx.T, kmap.hit.T, cw))
            outs = list(outs)
        else:
            outs = list(init)
            for k in range(Kt):
                per_g = one_tap(kmap.idx[:, k], kmap.hit[:, k], cw[k])
                outs = [a + p for a, p in zip(outs, per_g)]
        out = outs[0] if G == 1 else jnp.concatenate(outs, axis=1)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), G)
    if relu:
        out = jnp.maximum(out, 0)
    return jnp.where(out_mask[:, None], out, 0)


def sparse_conv_down(feats: jnp.ndarray, parent_idx: jnp.ndarray,
                     tap: jnp.ndarray, weights: jnp.ndarray,
                     out_mask: jnp.ndarray, *, groups: int = 1,
                     bias: jnp.ndarray | None = None,
                     relu: bool = False) -> jnp.ndarray:
    """ks=2 / stride-2 down conv in CHILD form (the transpose of the
    8-tap gather map): every fine voxel contributes to exactly one
    (parent, tap) slot, so

        out[o] = sum over children c of o:  feats[c] @ W[tap(c)]

    runs as ONE GEMM against all 8 tap weights + a narrow tap-select row
    gather + a scatter-add into the parents.  The gather-map path costs 8
    wide row gathers per output (rate-bound on TPU: ~1.4M gathered rows
    per fine-level down conv); this path moves 2 x V_fine narrow rows.
    Reduction order within a parent differs from the gather path: in f32
    mode the difference is ulp-level; in bf16 mode (COMPUTE_DTYPE =
    bfloat16) the GEMM output is cast f32->bf16 BEFORE the scatter-add and
    a parent's <=8 children accumulate in bf16 (~8 mantissa bits below
    f32) — the drift is bounded by the conv chain's own bf16 rounding and
    is covered by tests/test_sparse_conv.py::test_down_conv_bf16_drift.
    Fully XLA-differentiable (training path too).

    Args:
      feats: [V_f, G*Cin]; parent_idx: [V_f] int32 (== V_c when the fine
        voxel is invalid or its parent overflowed); tap: [V_f] in [0, 8);
      weights: [8, Cin, Cout] (cube_offsets(2) order, z fastest);
      out_mask: [V_c].
    """
    Kt, Cin, Cout = weights.shape
    G = groups
    assert feats.shape[-1] == G * Cin
    Vf = feats.shape[0]
    Vc = out_mask.shape[0]
    out_dtype = feats.dtype
    cf = feats.astype(COMPUTE_DTYPE)
    cw = weights.astype(COMPUTE_DTYPE)
    w_all = jnp.transpose(cw, (1, 0, 2)).reshape(Cin, Kt * Cout)
    ok = parent_idx < Vc
    # tap-select as a vectorized masked sum, NOT y.reshape(Vf*Kt,)[rows]:
    # row i of the select reads only its own contiguous block [Kt*i,Kt*(i+1))
    # so a row gather is pure waste — XLA lowers the gather at the TPU's
    # row-rate bound (~9 GB/s measured at L0, 20 ms/step) while the one-hot
    # multiply+sum streams at full vector bandwidth (fuses into the GEMM
    # epilogue). ok is folded into the one-hot so invalid rows contribute 0.
    oh = (tap[:, None] == jnp.arange(Kt, dtype=tap.dtype)[None, :])
    oh = (oh & ok[:, None]).astype(jnp.float32)          # [V_f, Kt]
    pidx = jnp.minimum(parent_idx, Vc)
    # one GEMM over all G streams (classifier-free groups share weights:
    # [V_f, G, Cin] @ w_all batches as rows), then ONE scatter-add of the
    # concatenated [V_f, G*Cout] — TPU scatter is row-rate-bound
    # (~80 Mrows/s regardless of width), so G separate scatters cost G x
    # the rows for the same payload
    y = jnp.dot(cf.reshape(Vf * G, Cin), w_all,
                preferred_element_type=jnp.float32,
                precision=PRECISION)                     # [V_f*G, K*Cout]
    y = y.reshape(Vf, G, Kt, Cout)
    ysel = (y * oh[:, None, :, None]).sum(axis=2)        # [V_f, G, Cout]
    # scatter-add in the compute dtype: the TPU scatter is byte-bound at
    # ~10 GB/s (measured 2.25 ms per [180k, 32] f32 level), so bf16
    # payloads halve it; a parent sums at most 8 children, so the bf16
    # partial sums stay within the conv chain's own rounding regime
    ysel = ysel.reshape(Vf, G * Cout).astype(cf.dtype)
    out = jnp.zeros((Vc + 1, G * Cout),
                    cf.dtype).at[pidx].add(ysel)[:Vc].astype(jnp.float32)
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), G)
    if relu:
        out = jnp.maximum(out, 0)
    return jnp.where(out_mask[:, None], out, 0).astype(out_dtype)


def sparse_conv_transpose(coarse_feats: jnp.ndarray, parent_idx: jnp.ndarray,
                          tap: jnp.ndarray, weights: jnp.ndarray,
                          fine_mask: jnp.ndarray,
                          groups: int = 1) -> jnp.ndarray:
    """Transpose (generative up) convolution, ks=2 / stride 2.

    Every fine voxel has exactly one coarse parent; its kernel tap is its
    position within the parent cell (ops.grid.up_maps).  out[v] =
    coarse[parent(v)] @ W[tap(v)].

    Args:
      coarse_feats: [V_c, G*Cin]; parent_idx: [V_f] int32 (== V_c if absent);
      tap: [V_f] int32 in [0, K); weights: [K, Cin, Cout]; fine_mask: [V_f].
    """
    Kt, Cin, Cout = weights.shape
    G = groups
    assert coarse_feats.shape[-1] == G * Cin
    Vc = coarse_feats.shape[0]
    Vf = parent_idx.shape[0]
    out_dtype = coarse_feats.dtype
    cf = coarse_feats.astype(COMPUTE_DTYPE)
    cw = weights.astype(COMPUTE_DTYPE)
    ok = (parent_idx < Vc) & fine_mask

    # every fine voxel reads exactly ONE (parent, tap) product, so compute
    # all K products per coarse voxel in a single clean GEMM and fetch with
    # one narrow row-gather of Y.reshape(Vc*K, Cout)[parent*K + tap] —
    # instead of K per-tap masked GEMMs over the FULL fine set (K-fold
    # wasted MXU work plus K masked [V_f, Cin] copies of HBM traffic).
    w_all = jnp.transpose(cw, (1, 0, 2)).reshape(Cin, Kt * Cout)
    rows = jnp.minimum(parent_idx, Vc - 1) * Kt + tap
    if G == 1:
        y = jnp.dot(cf, w_all, preferred_element_type=out_dtype,
                    precision=PRECISION)                  # [Vc, K*Cout]
        o = y.reshape(Vc * Kt, Cout)[rows]
    else:
        # G > 1 (grouped classifier-free streams): ONE block-diagonal GEMM
        # producing columns in (k, g, c) order, so the (parent, tap) pick
        # is a single narrow row gather over [Vc*K, G*Cout] — the TPU
        # gather is row-rate-bound (~40-80 Mrows/s regardless of width),
        # so G separate gathers cost G x the rows. The 2x MAC waste of
        # the zero blocks is far cheaper than the lane-concat/relayout
        # alternatives (measured at the L0 up-conv point, V_f=180096,
        # Cout=96, G=2: 3.5 ms vs 4.8 per-group gathers / 5.4
        # concat+gather / 4.4 two-level gather).
        wr = w_all.reshape(Cin, Kt, Cout)
        wbd = jnp.zeros((G, Cin, Kt, G, Cout), cw.dtype)
        for gi in range(G):
            wbd = wbd.at[gi, :, :, gi, :].set(wr)
        y = jnp.dot(cf, wbd.reshape(G * Cin, Kt * G * Cout),
                    preferred_element_type=out_dtype,
                    precision=PRECISION)                  # [Vc, K*G*Cout]
        o = y.reshape(Vc * Kt, G * Cout)[rows]
    out = jnp.where(ok[:, None], o, 0)
    return jnp.where(fine_mask[:, None], out, 0)


def masked_moments(feats: jnp.ndarray, mask: jnp.ndarray,
                   axis_name: str | None = None):
    """Per-channel mean/variance over valid voxels; with `axis_name`, the
    moments are reduced across the device mesh axis — the TPU-native
    equivalent of MinkowskiSyncBatchNorm (reference train.py:90).

    The row reduction rides the MXU as a [1,V]x[V,2C] GEMV (much faster on
    TPU than a sublane-strided sum over 100k+ rows)."""
    mv = mask.astype(feats.dtype)
    fm = feats * mv[:, None]
    cat = jnp.concatenate([fm, fm * feats], axis=1)        # [V, 2C]
    # statistics stay exactly f32 regardless of the conv precision policy
    sums = jnp.dot(mv[None, :], cat,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)[0]
    C = feats.shape[-1]
    cnt = jnp.sum(mv)
    s1 = sums[:C]
    s2 = sums[C:]
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    return mean, var, cnt


def global_pool(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global average pool over voxels -> [C]."""
    m = mask.astype(feats.dtype)[:, None]
    return jnp.sum(feats * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)
