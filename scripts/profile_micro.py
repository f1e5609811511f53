"""Micro-timings inside the denoiser: conv variants, KNN match, BN, gather."""

import os
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import grid as G
from lidiff_tpu.ops.knn import match_features
from lidiff_tpu.ops.sparse_conv import masked_moments, sparse_conv

N = int(os.environ.get("PROF_N", 60000))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, N // 10)
    r = rng.uniform(3.5, 50.0, N // 10)
    part = np.stack([r * np.cos(az), r * np.sin(az),
                     rng.uniform(-2, 2, N // 10)], -1).astype(np.float32)
    pts = np.tile(part, (10, 1)) + rng.normal(0, 1, (N, 3)).astype(np.float32)
    x = jnp.asarray(pts[None])

    geom, vox_feats, p2v = jax.jit(
        lambda p: G.quantize(p, 0.05, N))(x)
    kmap = jax.jit(G.build_kmap3_columns)(geom)
    print(f"valid voxels: {int(geom.num)}/{geom.capacity}", flush=True)

    for C in [32, 96]:
        f = jnp.asarray(rng.normal(0, 1, (N, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (27, C, C)).astype(np.float32))
        conv_l = jax.jit(lambda f, w: sparse_conv(f, kmap, w, geom.mask))
        timeit(f"conv27 loop C={C}", conv_l, f, w)
        conv_f = jax.jit(lambda f, w: sparse_conv(f, kmap, w, geom.mask,
                                                  fused=True))
        timeit(f"conv27 fused C={C}", conv_f, f, w)
        gather = jax.jit(lambda f: jnp.where(kmap.hit[..., None],
                                             f[kmap.idx], 0).sum(1))
        timeit(f"bare gather27 C={C}", gather, f)
        bn = jax.jit(lambda f: masked_moments(f, geom.mask))
        timeit(f"masked BN C={C}", bn, f)

    # KNN match: full stage-0 voxels vs part stage-4 bank
    Vp = 2048
    r_coords = jnp.asarray(
        rng.integers(-1000, 1000, (Vp, 4)).astype(np.int32) * 16)
    r_coords = r_coords.at[:, 0].set(0)
    r_mask = jnp.ones((Vp,), bool)
    r_feats = jnp.asarray(rng.normal(0, 1, (Vp, 256)).astype(np.float32))
    mf = jax.jit(lambda: match_features(geom.coords, geom.mask, r_coords,
                                        r_mask, r_feats))
    timeit("knn match (V x 2048, 256ch gather)", mf)

    # dense gate MLP at V x 256
    f256 = jnp.asarray(rng.normal(0, 1, (N, 256)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.1, (256, 256)).astype(np.float32))
    mlp = jax.jit(lambda f: jnp.maximum(f @ w1, 0) @ w1)
    timeit("dense 256x256 MLP xV", mlp, f256)


if __name__ == "__main__":
    main()
