"""End-to-end golden test for the checkpoint converter: a WHOLE tiny
DiffusionPoints forward.

A state_dict is hand-built with the reference's exact key names and layouts
(/root/reference/lidiff/models/minkunet.py:83-497 module plans: ME conv
kernels [K, Cin, Cout] with the FIRST coordinate varying fastest, torch
Linears [out, in], BatchNorm {weight,bias,running_mean,running_var}).  It is
then run through BOTH:

  * `convert_diffusion` -> our `DiffusionModel` (partial encoder + denoiser)
    in eval mode over real pyramids, and
  * an independent numpy oracle that consumes the state_dict DIRECTLY with
    MinkowskiEngine semantics (generalized sparse conv over coordinate
    dicts, ME tap enumeration, eval BatchNorm, the reference's gate wiring
    minkunet.py:420-497 including the up1 (t, p) concat swap at :461).

Agreement pins the converter end-to-end — every tensor's placement, the
ks=3 / ks=2 / transpose-conv tap permutations, the Linear transposes, the
BN fold, gate wiring, match semantics and the per-point head — not just
per-layer conventions (tests/test_convert_golden.py).  A structural check
additionally asserts the converted tree covers EVERY param/stat our model
initializes (nothing missing, nothing extra, shapes equal).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lidiff_tpu.tools.convert_checkpoint import convert_diffusion

pytestmark = pytest.mark.slow

CR = 0.25
CS = [int(CR * c) for c in (32, 32, 64, 128, 256, 256, 128, 96, 96)]
EMB = CS[8]                                  # reference: embed_dim = cs[-1]
LEAK = 0.1
EPS = 1e-5


# ---------------------------------------------------------------------------
# hand-built reference state_dict
# ---------------------------------------------------------------------------

def build_state_dict(rng: np.random.Generator) -> dict:
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.normal(
            size=(dout, din)).astype(np.float32) / np.sqrt(din)
        sd[f"{name}.bias"] = 0.1 * rng.normal(size=(dout,)).astype(np.float32)

    def mlp(name, din, hid, dout):
        lin(f"{name}.0", din, hid)
        lin(f"{name}.2", hid, dout)

    def conv(name, k, cin, cout):
        if k == 1:
            sd[f"{name}.kernel"] = rng.normal(
                size=(cin, cout)).astype(np.float32) / np.sqrt(cin)
        else:
            sd[f"{name}.kernel"] = rng.normal(
                size=(k ** 3, cin, cout)).astype(np.float32) / np.sqrt(
                    k ** 3 * cin)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = 0.1 * rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = 0.1 * rng.normal(size=(c,)).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    def residual(name, cin, cout):
        conv(f"{name}.net.0", 3, cin, cout)
        bn(f"{name}.net.1", cout)
        conv(f"{name}.net.3", 3, cout, cout)
        bn(f"{name}.net.4", cout)
        if cin != cout:
            conv(f"{name}.downsample.0", 1, cin, cout)
            bn(f"{name}.downsample.1", cout)

    def stem(name, cin, cout):
        conv(f"{name}.0", 3, cin, cout)
        bn(f"{name}.1", cout)
        conv(f"{name}.3", 3, cout, cout)
        bn(f"{name}.4", cout)

    def down_stage(name, cin, cout):
        conv(f"{name}.0.net.0", 2, cin, cin)
        bn(f"{name}.0.net.1", cin)
        residual(f"{name}.1", cin, cout)
        residual(f"{name}.2", cout, cout)

    def up_stage(name, cin, cup, cskip):
        conv(f"{name}.0.net.0", 2, cin, cup)       # transpose conv
        bn(f"{name}.0.net.1", cup)
        residual(f"{name}.1.0", cup + cskip, cup)
        residual(f"{name}.1.1", cup, cup)

    # partial encoder (MinkGlobalEnc, ref :83-130)
    stem("partial_enc.stem", 3, CS[0])
    for i in range(1, 5):
        down_stage(f"partial_enc.stage{i}", CS[i - 1], CS[i])

    # denoiser (MinkUNetDiff, ref :144-380)
    stem("model.stem", 3, CS[0])
    for i in range(1, 5):
        down_stage(f"model.stage{i}", CS[i - 1], CS[i])
    up_stage("model.up1", CS[4], CS[5], CS[3])
    up_stage("model.up2", CS[5], CS[6], CS[2])
    up_stage("model.up3", CS[6], CS[7], CS[1])
    up_stage("model.up4", CS[7], CS[8], CS[0])
    # gate MLP plans (ref :165-372): latent cs4->cs4->cs4, temp
    # emb->emb->cs4, latemp (cs4+cs4)->hidden->stage width
    latemp_plan = [("stage1", CS[4], CS[0]), ("stage2", CS[4], CS[1]),
                   ("stage3", CS[4], CS[2]), ("stage4", CS[4], CS[3]),
                   ("up1", CS[4], CS[4]), ("up2", CS[5], CS[5]),
                   ("up3", CS[6], CS[6]), ("up4", CS[7], CS[7])]
    for tag, hid, out in latemp_plan:
        mlp(f"model.latent_{tag}", CS[4], CS[4], CS[4])
        mlp(f"model.{tag}_temp", EMB, EMB, CS[4])
        mlp(f"model.latemp_{tag}", CS[4] + CS[4], hid, out)
    mlp("model.last", CS[8], 20, 3)
    return sd


# ---------------------------------------------------------------------------
# numpy oracle with MinkowskiEngine semantics
# ---------------------------------------------------------------------------

def me_offs(k: int) -> np.ndarray:
    """ME kernel-region enumeration: FIRST coordinate varies fastest."""
    r = range(-(k // 2), k // 2 + 1) if k % 2 == 1 else range(k)
    return np.array([(x, y, z) for z in r for y in r for x in r], np.int64)


def sort_coords(c: np.ndarray) -> np.ndarray:
    """Lexicographic (b, x, y, z) — the engine's key order, so 1-NN
    tie-breaking by first-argmin coincides between oracle and engine."""
    order = np.lexsort((c[:, 3], c[:, 2], c[:, 1], c[:, 0]))
    return c[order]


class Level:
    def __init__(self, coords: np.ndarray, stride: int):
        self.coords = sort_coords(coords)
        self.stride = stride
        self.index = {tuple(c): i for i, c in enumerate(self.coords)}


def build_levels(coords: np.ndarray) -> list[Level]:
    lv = [Level(np.unique(coords, axis=0), 1)]
    for i in range(4):
        s2 = 2 ** (i + 1)
        pc = np.concatenate(
            [lv[-1].coords[:, :1], (lv[-1].coords[:, 1:] // s2) * s2], 1)
        lv.append(Level(np.unique(pc, axis=0), s2))
    return lv


def conv3(lv: Level, f: np.ndarray, w: np.ndarray) -> np.ndarray:
    """ME generalized sparse conv, ks=3 stride 1: out[u] = sum x[u+off*s]@W."""
    out = np.zeros((len(lv.coords), w.shape[2]))
    for ki, off in enumerate(me_offs(3)):
        for i, u in enumerate(lv.coords):
            j = lv.index.get((u[0], u[1] + off[0] * lv.stride,
                              u[2] + off[1] * lv.stride,
                              u[3] + off[2] * lv.stride))
            if j is not None:
                out[i] += f[j] @ w[ki]
    return out


def conv_down(fine: Level, coarse: Level, f, w) -> np.ndarray:
    """ks=2 / stride-2 conv: out[u] = sum_{off in {0,1}^3} x[u+off*s_f]@W."""
    out = np.zeros((len(coarse.coords), w.shape[2]))
    for ki, off in enumerate(me_offs(2)):
        for i, u in enumerate(coarse.coords):
            j = fine.index.get((u[0], u[1] + off[0] * fine.stride,
                                u[2] + off[1] * fine.stride,
                                u[3] + off[2] * fine.stride))
            if j is not None:
                out[i] += f[j] @ w[ki]
    return out


def conv_up(coarse: Level, fine: Level, f, w) -> np.ndarray:
    """Generative transpose conv ks=2 / stride 2 onto the cached fine set:
    each fine voxel has exactly one coarse parent; tap = its cell bits in
    ME enumeration (x fastest)."""
    out = np.zeros((len(fine.coords), w.shape[2]))
    for i, c in enumerate(fine.coords):
        bits = (c[1:] // fine.stride) % 2
        k_me = bits[0] + 2 * bits[1] + 4 * bits[2]
        parent = (c[0], *(c[1:] - bits * fine.stride))
        out[i] = f[coarse.index[parent]] @ w[k_me]
    return out


def bn_eval(sd, name, f):
    w, b = sd[f"{name}.weight"], sd[f"{name}.bias"]
    rm, rv = sd[f"{name}.running_mean"], sd[f"{name}.running_var"]
    return (f - rm) / np.sqrt(rv + EPS) * w + b


def relu(x):
    return np.maximum(x, 0.0)


def leaky(x):
    return np.where(x >= 0, x, LEAK * x)


def mlp_np(sd, name, x):
    h = leaky(x @ sd[f"{name}.0.weight"].T + sd[f"{name}.0.bias"])
    return h @ sd[f"{name}.2.weight"].T + sd[f"{name}.2.bias"]


def residual_np(sd, name, lv, f):
    x = relu(bn_eval(sd, f"{name}.net.1",
                     conv3(lv, f, sd[f"{name}.net.0.kernel"])))
    x = bn_eval(sd, f"{name}.net.4", conv3(lv, x, sd[f"{name}.net.3.kernel"]))
    if f"{name}.downsample.0.kernel" in sd:
        short = bn_eval(sd, f"{name}.downsample.1",
                        f @ sd[f"{name}.downsample.0.kernel"])
    else:
        short = f
    return relu(x + short)


def stem_np(sd, name, lv, f):
    x = relu(bn_eval(sd, f"{name}.1", conv3(lv, f, sd[f"{name}.0.kernel"])))
    return relu(bn_eval(sd, f"{name}.4",
                        conv3(lv, x, sd[f"{name}.3.kernel"])))


def down_np(sd, name, fine, coarse, f):
    x = relu(bn_eval(sd, f"{name}.0.net.1",
                     conv_down(fine, coarse, f, sd[f"{name}.0.net.0.kernel"])))
    x = residual_np(sd, f"{name}.1", coarse, x)
    return residual_np(sd, f"{name}.2", coarse, x)


def up_np(sd, name, coarse, fine, f, skip):
    y = relu(bn_eval(sd, f"{name}.0.net.1",
                     conv_up(coarse, fine, f, sd[f"{name}.0.net.0.kernel"])))
    y = np.concatenate([y, skip], axis=-1)       # ME.cat(deconv, skip)
    y = residual_np(sd, f"{name}.1.0", fine, y)
    return residual_np(sd, f"{name}.1.1", fine, y)


def match_np(q: Level, r: Level, r_feats) -> np.ndarray:
    """Same-batch 1-NN on integer voxel coords; first argmin over the
    engine's key order breaks ties identically."""
    out = np.zeros((len(q.coords), r_feats.shape[1]))
    for i, c in enumerate(q.coords):
        same = r.coords[:, 0] == c[0]
        d = np.sum((r.coords[:, 1:] - c[1:]) ** 2, axis=1).astype(np.float64)
        d[~same] = 1e18
        out[i] = r_feats[np.argmin(d)]
    return out


def temb_np(t: np.ndarray, dim: int) -> np.ndarray:
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = t[:, None].astype(np.float64) * freqs[None, :]
    return np.concatenate([np.sin(args), np.cos(args)], axis=1)


def gate_np(sd, tag, lv, f, match, temp_emb, swap=False):
    p = mlp_np(sd, f"model.latent_{tag}", match)
    tv = mlp_np(sd, f"model.{tag}_temp", temp_emb)[lv.coords[:, 0]]
    cat = np.concatenate([tv, p] if swap else [p, tv], axis=-1)
    return f * mlp_np(sd, f"model.latemp_{tag}", cat)


def oracle_forward(sd, full_c, part_c, t):
    """eps prediction for every full voxel (reference forward :420-497)."""
    lf = build_levels(full_c)
    lp = build_levels(part_c)

    # partial encoder
    pf = stem_np(sd, "partial_enc.stem", lp[0],
                 lp[0].coords[:, 1:].astype(np.float64))
    for i in range(1, 5):
        pf = down_np(sd, f"partial_enc.stage{i}", lp[i - 1], lp[i], pf)

    temp = temb_np(t, EMB)

    x0 = stem_np(sd, "model.stem", lf[0],
                 lf[0].coords[:, 1:].astype(np.float64))
    xs = [x0]
    for i in range(1, 5):
        g = gate_np(sd, f"stage{i}", lf[i - 1], xs[-1],
                    match_np(lf[i - 1], lp[4], pf), temp)
        xs.append(down_np(sd, f"model.stage{i}", lf[i - 1], lf[i], g))

    y = gate_np(sd, "up1", lf[4], xs[4], match_np(lf[4], lp[4], pf), temp,
                swap=True)                        # (t, p) concat quirk :461
    y = up_np(sd, "model.up1", lf[4], lf[3], y, xs[3])
    for ui, (lc, lf_i, skip) in enumerate(
            [(3, 2, 2), (2, 1, 1), (1, 0, 0)], start=2):
        y = gate_np(sd, f"up{ui}", lf[lc], y,
                    match_np(lf[lc], lp[4], pf), temp)
        y = up_np(sd, f"model.up{ui}", lf[lc], lf[lf_i], y, xs[skip])

    eps = mlp_np(sd, "model.last", y)
    return lf[0], eps


# ---------------------------------------------------------------------------
# scene + the test
# ---------------------------------------------------------------------------

def make_scene(rng):
    """B=2 integer-coordinate clouds in [0, 64)^3, one point per voxel."""
    def cloud(n):
        flat = rng.choice(64 ** 3, size=n, replace=False)
        return np.stack(np.unravel_index(flat, (64, 64, 64)), 1).astype(
            np.int64)

    full = np.stack([cloud(40) for _ in range(2)])          # [2, 40, 3]
    part = np.stack([cloud(16) for _ in range(2)])          # [2, 16, 3]
    return full, part


def to_coords4(batched):
    """[B, N, 3] -> [B*N, 4] (b, x, y, z)."""
    B, N, _ = batched.shape
    b = np.repeat(np.arange(B), N)[:, None]
    return np.concatenate([b, batched.reshape(-1, 3)], axis=1)


def _tree_spec(tree):
    import jax
    return {jax.tree_util.keystr(p): tuple(l.shape) for p, l in
            jax.tree_util.tree_leaves_with_path(tree)}


def test_full_model_forward_matches_me_oracle():
    import jax
    import jax.numpy as jnp
    from lidiff_tpu.models.diffusion import DiffusionModel
    from lidiff_tpu.ops.grid import build_pyramid

    rng = np.random.default_rng(20260819)
    sd = build_state_dict(rng)
    params, stats = convert_diffusion(sd, tap="x")

    full, part = make_scene(rng)
    t = np.array([7, 311], np.int64)

    model = DiffusionModel(out_dim=EMB, cr=CR, remat=False)
    pts = jnp.asarray(full.astype(np.float32))
    ppts = jnp.asarray(part.astype(np.float32))
    pyr_full = build_pyramid(pts, 1.0, [128] * 5, 5)
    pyr_part = build_pyramid(ppts, 1.0, [64] * 5, 5)

    # 1) structural coverage: the converted tree provides exactly the
    # params/stats our model initializes, shape-for-shape
    init_vars = model.init(jax.random.PRNGKey(0), pyr_full, pyr_part,
                           jnp.asarray(t), False)
    want_p = _tree_spec(init_vars["params"])
    got_p = _tree_spec(params)
    assert got_p == want_p, (
        f"missing={sorted(set(want_p) - set(got_p))[:8]} "
        f"extra={sorted(set(got_p) - set(want_p))[:8]} "
        f"shape_diffs={[(k, got_p[k], want_p[k]) for k in got_p
                        if k in want_p and got_p[k] != want_p[k]][:8]}")
    want_s = _tree_spec(init_vars["batch_stats"])
    got_s = _tree_spec(stats)
    assert got_s == want_s

    # 2) numerical end-to-end parity vs the ME-semantics oracle
    eps = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        pyr_full, pyr_part, jnp.asarray(t), False))          # [2, 40, 3]

    lv0, eps_np = oracle_forward(sd, to_coords4(full), to_coords4(part),
                                 t.astype(np.float64))
    # oracle rows are voxel-ordered; map each input point to its voxel row
    per_point = np.stack([eps_np[lv0.index[tuple(c)]]
                          for c in to_coords4(full)]).reshape(2, 40, 3)

    np.testing.assert_allclose(eps, per_point, rtol=2e-3, atol=2e-3)
    # sanity: the signal is real (not vacuously both ~0)
    assert float(np.abs(per_point).max()) > 1e-3
