"""Sparse-voxel UNets in Flax.

TPU-native re-designs of the reference networks
(/root/reference/lidiff/models/minkunet.py):

  * `MinkGlobalEnc`  (ref :83-141)  — partial-scan encoder, stem + 4 down
    stages, returns stage-4 (stride-16, 256-ch) features.
  * `MinkUNetDiff`   (ref :144-497) — conditional denoiser: 4-down/4-up UNet
    whose input at every stage is gated by w = MLP([1-NN-matched partial
    feature, timestep embedding]) (ref :420-497).
  * `MinkUNet`       (ref :500-619) — unconditional UNet for the refinement
    offsets, Tanh head.

All geometry (voxel sets, kernel maps, parent maps, point->voxel map) comes
precomputed in a `Pyramid`, so the module bodies are pure gather/GEMM over
static shapes.  Channel plan cs = [32,32,64,128,256,256,128,96,96]
(ref :88/:150/:507).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lidiff_tpu.models.blocks import (MLP, DownStage, Stem, UpStage)
from lidiff_tpu.ops.grid import Pyramid, VoxelGeom, slice_to_points
from lidiff_tpu.ops.knn import match_features

CS = (32, 32, 64, 128, 256, 256, 128, 96, 96)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (ref minkunet.py:390-401)."""
    half = dim // 2
    freqs = jnp.exp(np.log(10000.0) / (half - 1) *
                    -jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _maybe_remat(cls, enable: bool):
    """Rematerialize a block in backward passes: conv activations are
    gather-heavy and dominate training memory at 180k-point scale; the
    recompute is cheap relative to HBM (jax.checkpoint via nn.remat)."""
    if not enable:
        return cls
    # flax nn.remat static_argnums counts `self` as arg 0: `train` is arg 4
    # for DownStage/UpStage(feats/coarse, ..., train) and arg 3 for Stem
    return nn.remat(cls, static_argnums=(4,) if cls in (DownStage, UpStage)
                    else (3,))


class MinkGlobalEnc(nn.Module):
    """Partial-scan encoder -> stage-4 conditioning features."""
    cr: float = 1.0
    axis_name: Optional[str] = None
    remat: bool = True

    @nn.compact
    def __call__(self, pyr: Pyramid, train: bool = False):
        cs = [int(self.cr * c) for c in CS]
        lv = pyr.levels
        Down = _maybe_remat(DownStage, self.remat and train)
        x0 = Stem(cs[0], self.axis_name, name="Stem_0")(
            pyr.vox_feats, lv[0], train)
        x1 = Down(cs[0], cs[1], self.axis_name, name="DownStage_0")(
            x0, lv[0], lv[1], train)
        x2 = Down(cs[1], cs[2], self.axis_name, name="DownStage_1")(
            x1, lv[1], lv[2], train)
        x3 = Down(cs[2], cs[3], self.axis_name, name="DownStage_2")(
            x2, lv[2], lv[3], train)
        x4 = Down(cs[3], cs[4], self.axis_name, name="DownStage_3")(
            x3, lv[3], lv[4], train)
        return x4          # [V4, 256] at stride 16


class _StageGate(nn.Module):
    """Per-voxel conditioning gate: w = latemp(cat(latent(match), temp(t)))
    (ref minkunet.py:424-429 and analogous blocks). `swap` reproduces the
    up1 quirk where the concat order is (t, p) (ref :461).

    Takes the 1-NN-matched partial feature `match` precomputed per level:
    down and up stages at the same level share the same coordinate set, so
    the denoiser needs only 5 distinct matches, not 8 (the reference
    recomputes per stage, minkunet.py:424-491).

    With `groups` G > 1, `match` is [V, G, c4] (one conditioning bank per
    group — the fused classifier-free cond/uncond execution) and `feats`
    is [V, G*C] group-major; gate MLPs share parameters across groups."""
    gate_out: int
    latemp_hidden: int
    swap: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, feats, geom: VoxelGeom, match, temp_emb):
        G = self.groups
        c4 = match.shape[-1]
        p = MLP(c4, c4, name="latent")(match)           # [V, (G,) c4]
        t = MLP(temp_emb.shape[-1], c4, name="temp")(temp_emb)
        t_vox = t[geom.coords[:, 0]]                     # batch-id gather
        if G > 1:
            t_vox = jnp.broadcast_to(t_vox[:, None, :], p.shape)
        pt = jnp.concatenate([t_vox, p] if self.swap else [p, t_vox],
                             axis=-1)
        w = MLP(self.latemp_hidden, self.gate_out, name="latemp")(pt)
        # gate in the activation dtype: MLP outputs are bf16-valued (its
        # last GEMM runs in COMPUTE_DTYPE), so this cast is exact and keeps
        # a bf16 eval stream from promoting back to f32
        w = w.astype(feats.dtype)
        if G > 1:
            V = feats.shape[0]
            f = feats.reshape(V, G, -1)
            f = f * jnp.where(geom.mask[:, None, None], w, 0)
            return f.reshape(V, -1)
        return feats * jnp.where(geom.mask[:, None], w, 0)


class MinkUNetDiff(nn.Module):
    """Conditional denoiser. Returns per-point noise prediction [B, N, 3]."""
    out_dim: int = 96          # timestep-embedding width (ref models.py:76)
    cr: float = 1.0
    axis_name: Optional[str] = None
    remat: bool = True

    @nn.compact
    def __call__(self, pyr: Pyramid, part_feats, part_geom,
                 t: jnp.ndarray, train: bool = False):
        """part_feats / part_geom may be G-tuples: the denoiser then runs G
        independent conditioning streams (one per bank) over the SAME voxel
        geometry in one fused pass with shared parameters — gathers are
        row-rate-bound on TPU, so this runs the classifier-free cond+uncond
        pair (reference models.py:98-103) for ~the cost of one forward.
        Output is [B, N, 3] (G=1) or [B, N, G, 3]."""
        if isinstance(part_feats, (tuple, list)):
            banks = list(zip(part_feats, part_geom))
        else:
            banks = [(part_feats, part_geom)]
        G = len(banks)
        # bf16 eval fast path: cast the inputs ONCE so the whole activation
        # stream (convs, BN affines, gates, matches) stays in COMPUTE_DTYPE
        # — the first conv already rounds its input to this dtype, so
        # quality is unchanged while every inter-op HBM pass halves and the
        # per-conv cast copies disappear. Training keeps f32 activations.
        from lidiff_tpu.ops import sparse_conv as _sc
        cd = _sc.COMPUTE_DTYPE
        if not train and cd != jnp.float32:
            banks = [(pf.astype(cd), pg) for pf, pg in banks]
        cs = [int(self.cr * c) for c in CS]
        lv = pyr.levels
        DownStage = _maybe_remat(globals()["DownStage"],
                                 self.remat and train)
        UpStage = _maybe_remat(globals()["UpStage"], self.remat and train)
        temp = timestep_embedding(t, self.out_dim)

        # one 1-NN conditioning match per level and bank, shared by the down
        # and up stages that live on that level's coordinate set
        nb = pyr.point2voxel.shape[0]        # static batch count
        def level_match(l):
            ms = [match_features(l.geom.coords, l.geom.mask, pg.coords,
                                 pg.mask, pf, n_batch=nb)
                  for pf, pg in banks]
            return ms[0] if G == 1 else jnp.stack(ms, axis=1)  # [V, G, c4]
        match = [level_match(l) for l in lv]

        # (gate_out, latemp_hidden) per stage; hidden widths follow the
        # reference latemp_* layer plans (minkunet.py:171-175, 299-303,
        # 327-331, 355-359)
        def gate(out, hidden, swap=False, name=None):
            return _StageGate(out, hidden, swap, G, name=name)

        def down(mid, out, name):
            return DownStage(mid, out, self.axis_name, G, name=name)

        def up(ch, name):
            return UpStage(ch, self.axis_name, G, name=name)

        # the stem input (voxelized points) is identical for every group:
        # run it once and tile — exact (both reference passes would compute
        # the same stem activations)
        vf = pyr.vox_feats
        if not train and cd != jnp.float32:
            vf = vf.astype(cd)
        x0 = Stem(cs[0], self.axis_name, name="Stem_0")(vf, lv[0], train)
        if G > 1:
            x0 = jnp.tile(x0, (1, G))
        g0 = gate(cs[0], cs[4], name="gate_s1")(x0, lv[0].geom, match[0],
                                                temp)
        x1 = down(cs[0], cs[1], "DownStage_0")(g0, lv[0], lv[1], train)
        g1 = gate(cs[1], cs[4], name="gate_s2")(x1, lv[1].geom, match[1],
                                                temp)
        x2 = down(cs[1], cs[2], "DownStage_1")(g1, lv[1], lv[2], train)
        g2 = gate(cs[2], cs[4], name="gate_s3")(x2, lv[2].geom, match[2],
                                                temp)
        x3 = down(cs[2], cs[3], "DownStage_2")(g2, lv[2], lv[3], train)
        g3 = gate(cs[3], cs[4], name="gate_s4")(x3, lv[3].geom, match[3],
                                                temp)
        x4 = down(cs[3], cs[4], "DownStage_3")(g3, lv[3], lv[4], train)

        g4 = gate(cs[4], cs[4], swap=True, name="gate_u1")(
            x4, lv[4].geom, match[4], temp)
        y1 = up(cs[5], "UpStage_0")(g4, x3, lv[3], train)
        g5 = gate(cs[5], cs[5], name="gate_u2")(y1, lv[3].geom, match[3],
                                                temp)
        y2 = up(cs[6], "UpStage_1")(g5, x2, lv[2], train)
        g6 = gate(cs[6], cs[6], name="gate_u3")(y2, lv[2].geom, match[2],
                                                temp)
        y3 = up(cs[7], "UpStage_2")(g6, x1, lv[1], train)
        g7 = gate(cs[7], cs[7], name="gate_u4")(y3, lv[1].geom, match[1],
                                                temp)
        y4 = up(cs[8], "UpStage_3")(g7, x0, lv[0], train)

        # per-point head after TensorField slice-back (ref :376-380, :497)
        pt_feats = slice_to_points(y4, pyr.point2voxel)
        if G > 1:
            B, N = pt_feats.shape[:2]
            pt_feats = pt_feats.reshape(B, N, G, -1)
        out = MLP(20, 3, name="head")(pt_feats)
        return out


class MinkUNet(nn.Module):
    """Unconditional UNet; per-point head Linear->LeakyReLU->Linear->Tanh
    with out_channels = 3 * up_factor (ref :500-619)."""
    out_channels: int = 18
    cr: float = 1.0
    axis_name: Optional[str] = None
    remat: bool = True

    @nn.compact
    def __call__(self, pyr: Pyramid, train: bool = False):
        cs = [int(self.cr * c) for c in CS]
        lv = pyr.levels
        DownStage = _maybe_remat(globals()["DownStage"],
                                 self.remat and train)
        UpStage = _maybe_remat(globals()["UpStage"], self.remat and train)
        from lidiff_tpu.ops import sparse_conv as _sc
        vf = pyr.vox_feats
        if not train and _sc.COMPUTE_DTYPE != jnp.float32:
            vf = vf.astype(_sc.COMPUTE_DTYPE)   # bf16 eval stream (see
        x0 = Stem(cs[0], self.axis_name, name="Stem_0")(   # MinkUNetDiff)
            vf, lv[0], train)
        x1 = DownStage(cs[0], cs[1], self.axis_name, name="DownStage_0")(
            x0, lv[0], lv[1], train)
        x2 = DownStage(cs[1], cs[2], self.axis_name, name="DownStage_1")(
            x1, lv[1], lv[2], train)
        x3 = DownStage(cs[2], cs[3], self.axis_name, name="DownStage_2")(
            x2, lv[2], lv[3], train)
        x4 = DownStage(cs[3], cs[4], self.axis_name, name="DownStage_3")(
            x3, lv[3], lv[4], train)
        y1 = UpStage(cs[5], self.axis_name, name="UpStage_0")(
            x4, x3, lv[3], train)
        y2 = UpStage(cs[6], self.axis_name, name="UpStage_1")(
            y1, x2, lv[2], train)
        y3 = UpStage(cs[7], self.axis_name, name="UpStage_2")(
            y2, x1, lv[1], train)
        y4 = UpStage(cs[8], self.axis_name, name="UpStage_3")(
            y3, x0, lv[0], train)
        pt_feats = slice_to_points(y4, pyr.point2voxel)
        out = MLP(20, self.out_channels, name="head")(pt_feats)
        return jnp.tanh(out)
