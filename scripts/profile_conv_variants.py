"""Head-to-head conv variant timing on TPU (in-executable repeats):
dense per-tap loop vs fused vs column slab-gather."""

import os
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops import grid as G
from lidiff_tpu.ops.sparse_conv import sparse_conv, sparse_conv_columns

N = int(os.environ.get("PROF_N", 60000))
K = int(os.environ.get("PROF_K", 20))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/K*1000:.3f} ms/iter", flush=True)


def repeat(body):
    def f(x):
        return jax.lax.fori_loop(0, K, lambda i, acc: body(acc + 0.0 * i), x)
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, N // 10)
    r = rng.uniform(3.5, 50.0, N // 10)
    part = np.stack([r * np.cos(az), r * np.sin(az),
                     rng.uniform(-2, 2, N // 10)], -1).astype(np.float32)
    pts = np.tile(part, (10, 1)) + rng.normal(0, 1, (N, 3)).astype(np.float32)
    x = jnp.asarray(pts[None])

    geom, _, _ = jax.jit(lambda p: G.quantize(p, 0.05, N))(x)
    col_map = jax.jit(G.build_kmap3_columns)(geom)
    dense_map = G.KernelMap(idx=jax.jit(lambda m: m.idx)(col_map),
                            hit=col_map.hit)
    print(f"valid: {int(geom.num)}/{geom.capacity}", flush=True)

    for C in [32]:
        f0 = jnp.asarray(rng.normal(0, 1, (N, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.03, (27, C, C)).astype(np.float32))
        timeit(f"dense loop C={C}", repeat(
            lambda f: sparse_conv(f, dense_map, w, geom.mask)), f0)
        timeit(f"dense fused C={C}", repeat(
            lambda f: sparse_conv(f, dense_map, w, geom.mask, fused=True)),
            f0)
        timeit(f"columns slab C={C}", repeat(
            lambda f: sparse_conv_columns(f, col_map, w, geom.mask)), f0)
        # slab gather alone
        fpad = jnp.concatenate([f0, jnp.zeros((3, C))], 0)
        from lidiff_tpu.ops.sparse_conv import _slab_gather
        timeit(f"slab gather x9 C={C}", repeat(
            lambda f: sum(_slab_gather(
                jnp.concatenate([f, jnp.zeros((3, C))], 0),
                col_map.col_idx[:, c], 3).sum(1) for c in range(9))), f0)
        # plain row gather x27
        timeit(f"row gather x27 C={C}", repeat(
            lambda f: sum(f[dense_map.idx[:, k]] for k in range(27))), f0)


if __name__ == "__main__":
    main()
