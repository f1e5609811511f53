"""Flax linen building blocks over the sparse engine.

Mirrors the reference block set (/root/reference/lidiff/models/minkunet.py:
13-80): BasicConvolutionBlock (conv+BN+ReLU), BasicDeconvolutionBlock
(transpose conv+BN+ReLU), ResidualBlock — re-designed as masked, static-shape
ops over precomputed kernel maps.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lidiff_tpu.ops.grid import DownMap, KernelMap, LevelGeom
from lidiff_tpu.ops.sparse_conv import (masked_moments, sparse_conv,
                                        sparse_conv_transpose)


def _kaiming(key, shape, dtype=jnp.float32):
    """He-uniform over (taps * in_channels) fan-in, the sparse-conv analog of
    torch's default conv init."""
    fan_in = shape[0] * shape[1] if len(shape) == 3 else shape[0]
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed kernel map.

    `groups` > 1 runs G independent feature sets ([V, G*C], group-major
    channels) over the same geometry with SHARED weights — used to fuse the
    classifier-free cond/uncond passes into one forward (gathers are
    row-rate-bound, so G-wide rows gather for the price of one)."""
    features: int
    taps: int = 27
    groups: int = 1

    @nn.compact
    def __call__(self, feats, kmap: KernelMap, out_mask, w_scale=None,
                 bias=None, relu: bool = False,
                 allow_pallas: bool = True):
        cin = feats.shape[-1] // self.groups
        w = self.param("kernel", _kaiming, (self.taps, cin, self.features))
        if w_scale is not None:
            w = w * w_scale[None, None, :]
        return sparse_conv(feats, kmap, w, out_mask, groups=self.groups,
                           bias=bias, relu=relu, allow_pallas=allow_pallas)


class SparseConvTranspose(nn.Module):
    """ks=2 / stride-2 generative transpose conv onto the finer level."""
    features: int
    taps: int = 8
    groups: int = 1

    @nn.compact
    def __call__(self, coarse_feats, parent_idx, tap, fine_mask):
        cin = coarse_feats.shape[-1] // self.groups
        w = self.param("kernel", _kaiming, (self.taps, cin, self.features))
        return sparse_conv_transpose(coarse_feats, parent_idx, tap, w,
                                     fine_mask, groups=self.groups)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels (torch BatchNorm1d semantics: biased var
    for normalization, unbiased for the running estimate, momentum 0.1).

    `axis_name` turns it into a cross-replica sync BN
    (MinkowskiSyncBatchNorm parity, reference train.py:90).
    """
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, feats, mask, train: bool, channels: int = None):
        """Normalize `feats`; or, with feats=None and `channels` given,
        return the eval-mode per-channel affine (k, c) with y = x*k + c —
        used to fold conv+BN(+ReLU) into one fused op (weights scaled by
        k, c applied as the conv's epilogue bias). Mathematically equal to
        the unfused eval path; saves the elementwise HBM pass."""
        C = channels if feats is None else feats.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,)))
        if feats is None:
            k = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            return k, bias - ra_mean.value * k
        if train:
            assert self.groups == 1, "grouped BN is inference-only"
            mean, var, cnt = masked_moments(feats, mask, self.axis_name)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        if self.groups > 1:
            mean = jnp.tile(mean, self.groups)
            var = jnp.tile(var, self.groups)
            scale = jnp.tile(scale, self.groups)
            bias = jnp.tile(bias, self.groups)
        if feats.dtype == jnp.float32:
            y = (feats - mean) * jax.lax.rsqrt(var + self.eps) * scale \
                + bias
        else:
            # low-precision activation chain (bf16 eval): apply the affine
            # in the activation dtype so BN doesn't promote the whole
            # stream back to f32 (k/c are f32-derived, rounded once)
            k = scale * jax.lax.rsqrt(var + self.eps)
            c = bias - mean * k
            y = feats * k.astype(feats.dtype) + c.astype(feats.dtype)
        return jnp.where(mask[:, None], y, 0)



class ConvBNReLU(nn.Module):
    """BasicConvolutionBlock analog (minkunet.py:13-29). With taps=8 it is
    the ks=2/stride-2 down conv (output voxels = next coarser level)."""
    features: int
    taps: int = 27
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, feats, kmap, out_mask, train: bool):
        conv = SparseConv(self.features, self.taps, self.groups)
        bn = MaskedBatchNorm(axis_name=self.axis_name, groups=self.groups)
        if train:
            # differentiated path: the Pallas conv carries a custom_vjp
            # (ops/pallas_conv.py), so training runs the fused kernel too;
            # BN stays separate (train-mode batch moments)
            x = conv(feats, kmap, out_mask)
            x = bn(x, out_mask, True)
            return nn.relu(x)
        k, c = bn(None, None, False, channels=self.features)
        return conv(feats, kmap, out_mask, w_scale=k, bias=c, relu=True)


class DeconvBNReLU(nn.Module):
    """BasicDeconvolutionBlock analog (minkunet.py:32-46)."""
    features: int

    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, coarse_feats, parent_idx, tap, fine_mask, train: bool):
        x = SparseConvTranspose(self.features, groups=self.groups)(
            coarse_feats, parent_idx, tap, fine_mask)
        x = MaskedBatchNorm(axis_name=self.axis_name, groups=self.groups)(
            x, fine_mask, train)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """ResidualBlock analog (minkunet.py:49-80), stride 1 only: two ks=3
    convs + BN with a (1x1 conv + BN) shortcut when channels change."""
    features: int
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, feats, kmap, mask, train: bool):
        G = self.groups
        conv1 = SparseConv(self.features, 27, G)
        bn1 = MaskedBatchNorm(axis_name=self.axis_name, groups=G)
        conv2 = SparseConv(self.features, 27, G)
        bn2 = MaskedBatchNorm(axis_name=self.axis_name, groups=G)
        if train:
            x = conv1(feats, kmap, mask)
            x = bn1(x, mask, True)
            x = nn.relu(x)
            x = conv2(x, kmap, mask)
            x = bn2(x, mask, True)
        else:
            k1, c1 = bn1(None, None, False, channels=self.features)
            x = conv1(feats, kmap, mask, w_scale=k1, bias=c1, relu=True)
            k2, c2 = bn2(None, None, False, channels=self.features)
            x = conv2(x, kmap, mask, w_scale=k2, bias=c2)
        cin = feats.shape[-1] // G
        if cin == self.features:
            short = feats
        else:
            # 1x1 conv == per-voxel dense; apply per group via a reshape
            # (Dense broadcasts over leading dims, contraction per group is
            # identical to the ungrouped op)
            V = feats.shape[0]
            fin = feats.reshape(V, G, cin) if G > 1 else feats
            # computation in the activation dtype (bf16 on the eval fast
            # path, f32 in training); params stay f32
            short = nn.Dense(self.features, use_bias=False,
                             kernel_init=_kaiming, dtype=fin.dtype)(fin)
            if G > 1:
                short = short.reshape(V, G * self.features)
            short = MaskedBatchNorm(axis_name=self.axis_name, groups=G)(
                short, mask, train)
        return nn.relu(x + short)


class MLP(nn.Module):
    """Linear -> LeakyReLU(0.1) -> Linear, the gate/head pattern used
    throughout MinkUNetDiff (minkunet.py:165-181 etc.). GEMMs run in the
    global compute dtype (bf16 fast path), params and output stay f32."""
    hidden: int
    out: int
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        from lidiff_tpu.ops import sparse_conv as sc
        dt = sc.COMPUTE_DTYPE
        x = nn.Dense(self.hidden, dtype=dt)(x.astype(dt))
        x = nn.leaky_relu(x, self.negative_slope)
        return nn.Dense(self.out, dtype=dt)(x).astype(jnp.float32)


def group_concat(a, b, groups: int):
    """Channel-concat of two group-major arrays: [V, G*Ca] ++ [V, G*Cb]
    -> [V, G*(Ca+Cb)], concatenating per group."""
    if groups == 1:
        return jnp.concatenate([a, b], axis=-1)
    V = a.shape[0]
    ar = a.reshape(V, groups, -1)
    br = b.reshape(V, groups, -1)
    return jnp.concatenate([ar, br], axis=-1).reshape(V, -1)


class DownStage(nn.Module):
    """stage_i pattern (minkunet.py:102-124 / 183-262): ks=2/stride-2 down
    conv followed by two residual blocks on the coarser level."""
    mid: int
    out: int
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, feats, fine: LevelGeom, coarse: LevelGeom,
                 train: bool):
        # child-form map: one GEMM + scatter-add instead of 8 wide gathers
        # (sparse_conv_down); fine.down_kmap stays available for the
        # gather-form fallback/tests
        x = ConvBNReLU(self.mid, taps=8, axis_name=self.axis_name,
                       groups=self.groups)(
            feats, DownMap(fine.parent_idx, fine.up_tap),
            coarse.geom.mask, train)
        x = ResidualBlock(self.out, self.axis_name, self.groups)(
            x, coarse.kmap3, coarse.geom.mask, train)
        x = ResidualBlock(self.out, self.axis_name, self.groups)(
            x, coarse.kmap3, coarse.geom.mask, train)
        return x


class UpStage(nn.Module):
    """up_i pattern (minkunet.py:283-374): transpose conv onto the finer
    level, channel-concat with the skip, two residual blocks."""
    up_ch: int
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, coarse_feats, skip_feats, fine: LevelGeom,
                 train: bool):
        y = DeconvBNReLU(self.up_ch, axis_name=self.axis_name,
                         groups=self.groups)(
            coarse_feats, fine.parent_idx, fine.up_tap, fine.geom.mask,
            train)
        y = group_concat(y, skip_feats, self.groups)
        y = ResidualBlock(self.up_ch, self.axis_name, self.groups)(
            y, fine.kmap3, fine.geom.mask, train)
        y = ResidualBlock(self.up_ch, self.axis_name, self.groups)(
            y, fine.kmap3, fine.geom.mask, train)
        return y


class Stem(nn.Module):
    """stem pattern (minkunet.py:93-100): two ks=3 conv+BN+ReLU at stride 1."""
    features: int
    axis_name: Optional[str] = None
    groups: int = 1

    @nn.compact
    def __call__(self, feats, level: LevelGeom, train: bool):
        x = ConvBNReLU(self.features, axis_name=self.axis_name,
                       groups=self.groups)(
            feats, level.kmap3, level.geom.mask, train)
        x = ConvBNReLU(self.features, axis_name=self.axis_name,
                       groups=self.groups)(
            x, level.kmap3, level.geom.mask, train)
        return x
