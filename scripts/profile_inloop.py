"""In-executable repeat timings (fori_loop inside one jit) — removes the
axon relay's per-launch overhead from measurements."""

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
K = int(os.environ.get("PROF_K", 20))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/K*1000:.3f} ms/iter  ({dt*1000:.1f} ms total)",
          flush=True)


def repeat(body, x0):
    """Run body K times with a data dependency chain."""
    def f(x):
        def it(i, acc):
            return body(acc + 0.0 * i)
        return jax.lax.fori_loop(0, K, it, x)
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, N // 10)
    r = rng.uniform(3.5, 50.0, N // 10)
    part = np.stack([r * np.cos(az), r * np.sin(az),
                     rng.uniform(-2, 2, N // 10)], -1).astype(np.float32)
    pts = np.tile(part, (10, 1)) + rng.normal(0, 1, (N, 3)).astype(np.float32)
    x = jnp.asarray(pts[None])

    geom, vox_feats, p2v = jax.jit(lambda p: G.quantize(p, 0.05, N))(x)
    kmap = jax.jit(G.build_kmap3_columns)(geom)
    print(f"valid voxels: {int(geom.num)}/{geom.capacity}", flush=True)

    C = 32
    f0 = jnp.asarray(rng.normal(0, 1, (N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.03, (27, C, C)).astype(np.float32))

    timeit("conv27 loop C=32", repeat(
        lambda f: sparse_conv(f, kmap, w, geom.mask), f0), f0)
    timeit("conv27 fused C=32", repeat(
        lambda f: sparse_conv(f, kmap, w, geom.mask, fused=True), f0), f0)
    timeit("bn C=32", repeat(
        lambda f: f * masked_moments(f, geom.mask)[0][None, :], f0), f0)

    C = 96
    f1 = jnp.asarray(rng.normal(0, 1, (N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.03, (27, C, C)).astype(np.float32))
    timeit("conv27 loop C=96", repeat(
        lambda f: sparse_conv(f, kmap, w1, geom.mask), f1), f1)
    timeit("conv27 fused C=96", repeat(
        lambda f: sparse_conv(f, kmap, w1, geom.mask, fused=True), f1), f1)

    # quantize+pyramid in-loop (geometry per step)
    caps = [N, N // 2, N // 4, N // 8, N // 16]
    def geo(p):
        pyr = G.build_pyramid(p, 0.05, caps, 5)
        return p + 1e-6 * pyr.vox_feats[:p.shape[1]][None]
    timeit("full geometry pyramid", repeat(geo, x), x)

    # knn match
    Vp = 2048
    r_coords = jnp.asarray(
        rng.integers(-1000, 1000, (Vp, 4)).astype(np.int32) * 16)
    r_coords = r_coords.at[:, 0].set(0)
    r_mask = jnp.ones((Vp,), bool)
    r_feats = jnp.asarray(rng.normal(0, 1, (Vp, 256)).astype(np.float32))

    def knn_body(f):
        m = match_features(geom.coords, geom.mask, r_coords, r_mask, r_feats)
        return f + m[:, :32] * 1e-6
    timeit("knn match + 256ch gather", repeat(knn_body, f0), f0)

    # dense MLP
    f256 = jnp.asarray(rng.normal(0, 1, (N, 256)).astype(np.float32))
    wd = jnp.asarray(rng.normal(0, 0.03, (256, 256)).astype(np.float32))
    timeit("dense 256->256->256", repeat(
        lambda f: jnp.maximum(f @ wd, 0) @ wd, f256), f256)


if __name__ == "__main__":
    main()
