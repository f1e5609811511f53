"""Direct on-TPU profile of the real sparse_conv_columns at per-level sizes,
decomposed: full conv vs gather-only vs GEMM-only, plus XLA gather-rate vs
table size (to find the VMEM-staging knee).

Run: python scripts/profile_conv_direct.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)

    print("=== XLA gather rate vs table size (width 128 f32 / bf16) ===")
    for V in (16384, 32768, 49152, 65536, 98304, 131072, 180224):
        for dt in (jnp.float32, jnp.bfloat16):
            wnd = jnp.asarray(rng.normal(size=(V, 128)), dtype=dt)
            idx = jnp.asarray(np.sort(rng.integers(0, V, size=V))
                              .astype(np.int32))

            wsmall = jnp.asarray(rng.normal(size=(128, 8)), dtype=dt)

            @jax.jit
            def g(wnd, idx, wsmall):
                return jnp.dot(wnd[idx], wsmall,
                               preferred_element_type=jnp.float32)

            t = timed(g, wnd, idx, wsmall)
            print(f"  V={V:7d} {dt.__name__:9s}: {t*1e3:8.3f} ms "
                  f"{V/t/1e6:8.1f} Mrows/s")

    print("=== real sparse_conv_columns per level (f32) ===")
    from lidiff_tpu.ops.grid import ColumnKernelMap
    from lidiff_tpu.ops.sparse_conv import sparse_conv_columns

    # (V, Cin, Cout) roughly matching the UNet levels at 180k points
    for V, Cin, Cout in ((180224, 32, 32), (90112, 32, 32),
                         (90112, 96 * 2, 96), (45056, 64, 64),
                         (22528, 128, 128), (11264, 256, 256)):
        feats = jnp.asarray(rng.normal(size=(V, Cin)).astype(np.float32))
        base = np.sort(rng.integers(0, V, size=(V, 9)), axis=0)
        kmap = ColumnKernelMap(
            col_idx=jnp.asarray(base.astype(np.int32)),
            hit=jnp.asarray(rng.random((V, 27)) < 0.5),
        )
        w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32))
        mask = jnp.ones((V,), jnp.bool_)

        f = jax.jit(sparse_conv_columns)
        t = timed(f, feats, kmap, w, mask)
        rows = 9 * V
        print(f"  V={V:7d} C={Cin:3d}->{Cout:3d}: {t*1e3:8.2f} ms  "
              f"slab-rows {rows/t/1e6:7.1f} M/s")

        # gather-only ablation: 9 slab gathers, sum (no selects, no GEMM)
        @jax.jit
        def gather_only(feats, col_idx):
            fpad = jnp.concatenate([feats, jnp.zeros((2, Cin),
                                                     feats.dtype)], 0)
            wnd = jnp.concatenate([fpad[:-2], fpad[1:-1], fpad[2:]], 1)
            acc = jnp.zeros((V, 3 * Cin), feats.dtype)
            for col in range(9):
                acc = acc + wnd[col_idx[:, col]]
            return acc

        t = timed(gather_only, feats, kmap.col_idx)
        print(f"      gather-only: {t*1e3:8.2f} ms  "
              f"{rows/t/1e6:7.1f} Mrows/s")

        # GEMM-only ablation
        @jax.jit
        def gemm_only(g, w):
            out = jnp.zeros((V, Cout), jnp.float32)
            for col in range(9):
                out = out + jnp.dot(
                    g, w[col * 3:(col + 1) * 3].reshape(3 * Cin, Cout),
                    preferred_element_type=jnp.float32)
            return out

        g0 = jnp.asarray(rng.normal(size=(V, 3 * Cin)).astype(np.float32))
        t = timed(gemm_only, g0, w)
        flops = 2 * 9 * V * 3 * Cin * Cout
        print(f"      gemm-only:   {t*1e3:8.2f} ms  "
              f"{flops/t/1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
