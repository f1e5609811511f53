"""Microbenchmark: row-gather strategies for the sparse-conv hot path.

Round-1 profiling showed the denoiser forward is ~94% conv row gathers and
that XLA:TPU row gathers are row-RATE-bound (~12M rows/s measured),
independent of row width. This script measures candidate Pallas kernels
against that baseline on the real chip:

  xla         — jnp baseline: out = wnd[idx] @ W (what round 1 ships)
  pallas_vmem — whole table resident in VMEM, per-tile fori_loop gather
                fused with the MXU GEMM
  pallas_dma  — table in HBM, per-tile async DMA of a contiguous window
                (valid because column kernel-map indices are monotone),
                gather from the VMEM window, fused GEMM

Run on TPU:  python scripts/profile_gather_pallas.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# ---------------- XLA baseline ----------------

@functools.partial(jax.jit, static_argnums=())
def xla_gather_dot(wnd, idx, w):
    g = wnd[idx]
    return jnp.dot(g, w, preferred_element_type=jnp.float32)


# ---------------- Pallas: VMEM-resident ----------------

def _vmem_kernel(idx_ref, wnd_ref, w_ref, o_ref, g_ref):
    T = g_ref.shape[0]
    W = idx_ref.shape[2]

    def body(i, _):
        for u in range(8):
            j = i * 8 + u
            g_ref[j, :] = wnd_ref[idx_ref[0, j // W, j % W], :]
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)
    o_ref[:] = jnp.dot(g_ref[:], w_ref[:], preferred_element_type=jnp.float32)


def pallas_vmem(wnd, idx3, w, T=512):
    n_tiles, A, Bw = idx3.shape
    Vo = n_tiles * T
    C3 = wnd.shape[1]
    Co = w.shape[1]
    return pl.pallas_call(
        _vmem_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, A, Bw), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, Co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vo, Co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, C3), wnd.dtype)],
    )(idx3, wnd, w)


# ---------------- Pallas: HBM + windowed DMA ----------------

def _dma_kernel(lo_ref, idx_ref, wnd_ref, w_ref, o_ref, win_ref, g_ref, sem):
    T = g_ref.shape[0]
    W = idx_ref.shape[2]
    SPAN = win_ref.shape[0]
    lo = lo_ref[0, 0, 0]
    cp = pltpu.make_async_copy(wnd_ref.at[pl.ds(lo, SPAN), :], win_ref, sem)
    cp.start()
    cp.wait()

    def body(i, _):
        for u in range(8):
            j = i * 8 + u
            g_ref[j, :] = win_ref[idx_ref[0, j // W, j % W] - lo, :]
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)
    o_ref[:] = jnp.dot(g_ref[:], w_ref[:], preferred_element_type=jnp.float32)


def pallas_dma(wnd, idx3, lo3, w, T=1024, SPAN=4096):
    n_tiles, A, Bw = idx3.shape
    Vo = n_tiles * T
    C3 = wnd.shape[1]
    Co = w.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, A, Bw), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, Co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SPAN, C3), wnd.dtype),
            pltpu.VMEM((T, C3), wnd.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vo, Co), jnp.float32),
    )(lo3, idx3, wnd, w)


def main():
    rng = np.random.default_rng(0)
    C3, Co = 128, 32
    results = {}

    for V in (16384, 131072, 180224):
        wnd = jnp.asarray(rng.normal(size=(V, C3)).astype(np.float32))
        # monotone indices, like a column kernel map (sorted voxel keys)
        idx_np = np.sort(rng.integers(0, V, size=V)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        w = jnp.asarray(rng.normal(size=(C3, Co)).astype(np.float32))

        t = timed(xla_gather_dot, wnd, idx, w)
        results[f"xla_V{V}"] = t
        print(f"xla          V={V:7d}: {t*1e3:8.3f} ms  "
              f"{V/t/1e6:8.1f} Mrows/s")

        if V * C3 * 4 <= 8 * 2**20:   # VMEM-resident only when it fits
            T = 512
            f = jax.jit(functools.partial(pallas_vmem, T=T))
            idx3 = jnp.asarray(idx_np.reshape(-1, 8, T // 8))
            t = timed(f, wnd, idx3, w)
            results[f"pallas_vmem_V{V}"] = t
            print(f"pallas_vmem  V={V:7d}: {t*1e3:8.3f} ms  "
                  f"{V/t/1e6:8.1f} Mrows/s")
            ref = xla_gather_dot(wnd, idx, w)
            err = float(jnp.max(jnp.abs(ref - f(wnd, idx3, w))))
            print(f"             max|Δ| vs xla: {err:.2e}")

        try:
            T, SPAN = 1024, 4096
            lo_np = np.minimum(idx_np[::T], V - SPAN).astype(np.int32)
            # correctness check for this input: window always covers
            span_ok = ((idx_np.reshape(-1, T) - lo_np[:, None]) < SPAN).all()
            lo3 = jnp.asarray(lo_np.reshape(-1, 1, 1))
            idx3 = jnp.asarray(idx_np.reshape(-1, 8, T // 8))
            f = jax.jit(functools.partial(pallas_dma, T=T, SPAN=SPAN))
            t = timed(f, wnd, idx3, lo3, w)
            results[f"pallas_dma_V{V}"] = t
            print(f"pallas_dma   V={V:7d}: {t*1e3:8.3f} ms  "
                  f"{V/t/1e6:8.1f} Mrows/s  (span_ok={span_ok})")
            if span_ok:
                ref = xla_gather_dot(wnd, idx, w)
                got = f(wnd, idx3, lo3, w)
                err = float(jnp.max(jnp.abs(ref - got)))
                print(f"             max|Δ| vs xla: {err:.2e}")
        except Exception as e:
            print(f"pallas_dma   V={V:7d}: FAILED "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
