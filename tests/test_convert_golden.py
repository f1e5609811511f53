"""Numerical golden test for the checkpoint converter's layout conventions.

MinkowskiEngine 0.5.4's generalized sparse convolution computes

    out[u] = sum_{off in region} x[u + off] @ W_me[k(off)]

where the kernel region for ks=3 is {-1,0,1}^3 enumerated with the FIRST
coordinate varying fastest (ME KernelRegion/RegionIterator; reference convs
at /root/reference/lidiff/models/minkunet.py:13-29 use these kernels), and
torch Linear weights are stored [out, in].

The converter (tools/convert_checkpoint.py) maps ME kernels to our tap
order (x slowest, z fastest; ops/grid.py::cube_offsets) via `cube_perm`
and transposes Linears. These tests pin both conventions against a
standalone numpy oracle of the ME conv — each kernel tap carries a
distinct signature so ANY tap-order mistake changes the result.
"""

import itertools

import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import grid as G
from lidiff_tpu.ops.sparse_conv import sparse_conv
from lidiff_tpu.tools.convert_checkpoint import cube_perm
import pytest

pytestmark = pytest.mark.slow


def me_offsets(k: int) -> np.ndarray:
    """ME enumeration: first coordinate fastest."""
    rng = range(-(k // 2), k // 2 + 1) if k % 2 == 1 else range(k)
    return np.array([(x, y, z) for z in rng for y in rng for x in rng],
                    np.int64)


def me_conv_oracle(coords: np.ndarray, feats: np.ndarray,
                   w_me: np.ndarray, k: int) -> np.ndarray:
    """out[u] = sum_off x[u + off] @ W_me[k(off)] over existing voxels."""
    table = {tuple(c): i for i, c in enumerate(coords)}
    offs = me_offsets(k)
    out = np.zeros((len(coords), w_me.shape[2]), np.float64)
    for ui, u in enumerate(coords):
        for ki, off in enumerate(offs):
            j = table.get(tuple(u + off))
            if j is not None:
                out[ui] += feats[j].astype(np.float64) @ w_me[ki]
    return out


def _run_ours(coords, feats, w_me, cap=64):
    """Convert W like the converter does, run our conv over the same scene."""
    w_ours = w_me[cube_perm(3, "x")]
    pts = jnp.asarray(coords[None].astype(np.float32))   # res=1 -> coords
    geom, _, p2v = G.quantize(pts, 1.0, cap)
    kmap = G.build_kmap3_columns(geom)
    # scatter features into the voxel array via the point->voxel map
    V = geom.capacity
    vox_feats = np.zeros((V, feats.shape[1]), np.float32)
    vox_feats[np.asarray(p2v[0])] = feats
    out_v = sparse_conv(jnp.asarray(vox_feats), kmap,
                        jnp.asarray(w_ours.astype(np.float32)), geom.mask)
    # slice back to the input order
    return np.asarray(out_v)[np.asarray(p2v[0])]


def test_single_neighbor_pins_every_tap():
    """Scenes of exactly two voxels at every one of the 26 neighbor offsets:
    each exercises exactly one kernel tap with no summation ambiguity, so
    agreement is exact and any permutation error is caught tap-by-tap."""
    rng = np.random.default_rng(0)
    Cin, Cout = 3, 2
    w_me = rng.normal(size=(27, Cin, Cout)).astype(np.float32)
    # give each tap a distinct strong signature
    for kx in range(27):
        w_me[kx] += kx * np.eye(Cin, Cout, dtype=np.float32)
    for off in itertools.product((-1, 0, 1), repeat=3):
        if off == (0, 0, 0):
            continue
        coords = np.array([[5, 5, 5], [5 + off[0], 5 + off[1], 5 + off[2]]],
                          np.int64)
        feats = rng.normal(size=(2, Cin)).astype(np.float32)
        want = me_conv_oracle(coords, feats, w_me, 3)
        got = _run_ours(coords, feats, w_me)
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"offset {off}")


def test_random_scene_matches_oracle():
    rng = np.random.default_rng(1)
    Cin, Cout = 4, 5
    # ~40 unique voxels in a tight cluster (many neighbor hits)
    coords = np.unique(rng.integers(0, 5, size=(60, 3)), axis=0)
    feats = rng.normal(size=(len(coords), Cin)).astype(np.float32)
    w_me = rng.normal(size=(27, Cin, Cout)).astype(np.float32)
    want = me_conv_oracle(coords, feats, w_me, 3)
    got = _run_ours(coords, feats, w_me)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_linear_transpose_convention():
    """torch Linear stores [out, in]; our Dense kernel is [in, out]."""
    from lidiff_tpu.tools.convert_checkpoint import _linear
    rng = np.random.default_rng(2)
    w = rng.normal(size=(7, 4)).astype(np.float32)      # torch [out, in]
    b = rng.normal(size=(7,)).astype(np.float32)
    sd = {"lin.weight": w, "lin.bias": b}
    got = _linear(sd, "lin")
    x = rng.normal(size=(3, 4)).astype(np.float32)
    np.testing.assert_allclose(x @ got["kernel"] + got["bias"],
                               x @ w.T + b, rtol=1e-6)
