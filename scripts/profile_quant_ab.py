"""On-TPU A/B of the int8 eval-conv path vs bf16 per conv width, plus the
v1 vs v2 weight-grad kernels, on REAL-scan kernel maps (the demo scan at a
t~T noise level, per-level pyramids like the production sampler sees).

Run: python scripts/profile_quant_ab.py            (defaults N=180000)
     PROF_N=60000 python scripts/profile_quant_ab.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE", "bfloat16")

import time

import jax

# reuse bench.py's persistent compile cache: each A/B case is a fresh
# kernel specialization and the tunneled compile dominates wall time
from lidiff_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PROF_N", 180_000))
REPS = int(os.environ.get("PROF_K", 20))


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def load_points():
    ref = "/root/reference/lidiff/Datasets/test/000123.ply"
    rng = np.random.default_rng(0)
    if os.path.exists(ref):
        from lidiff_tpu.utils.ply import read_ply
        pts = read_ply(ref)["points"].astype(np.float32)
        d = np.linalg.norm(pts, axis=1)
        pts = pts[(d > 3.5) & (d < 50.0)]
        from lidiff_tpu.ops.fps import fps
        part = fps(pts, N // 10).astype(np.float32)
    else:
        az = rng.uniform(0, 2 * np.pi, N // 10)
        r = rng.uniform(3.5, 50.0, N // 10)
        part = np.stack([r * np.cos(az), r * np.sin(az),
                         rng.uniform(-2, 2, N // 10)], -1).astype(np.float32)
    x = np.tile(part, (10, 1)) + rng.normal(0, 1, (N, 3)).astype(np.float32)
    return jnp.asarray(x[None])


def main():
    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.models.diffusion import DiffusionTask
    from lidiff_tpu.ops.pallas_conv import (conv_columns_dispatch,
                                            conv_columns_pallas_dw,
                                            conv_columns_pallas_dw_v2,
                                            DISPATCH_NARROW, DISPATCH_WIDE)

    cfg = finalize_config({
        "experiment": {"id": "qab"},
        "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [], "test": [],
                 "num_points": N, "max_range": 50.0, "dataset_norm": False,
                 "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": 8,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
    })
    task = DiffusionTask(cfg)
    x = load_points()
    pyr = jax.jit(task.pyramid_full)(x)
    rng = np.random.default_rng(1)

    # (level, Cin, Cout) pairs matching the UNet conv population
    cases = [(0, 32, 32), (1, 32, 32), (2, 64, 64), (3, 128, 128),
             (4, 256, 256), (1, 96, 96), (0, 96, 96)]
    dt = jnp.bfloat16

    print(f"device={jax.devices()[0]}  N={N}  G=2  dtype=bf16 vs int8")
    print(f"{'case':>18s} {'bf16 ms':>9s} {'int8 ms':>9s} {'x':>6s}")
    for lvl, C, Co in cases:
        L = pyr.levels[lvl]
        km, mask = L.kmap3, L.geom.mask
        V = L.geom.capacity
        f = jnp.asarray(rng.normal(0, 1, (V, 2 * C)), dt)
        f = jnp.where(mask[:, None], f, 0)
        w = jnp.asarray(rng.normal(0, 0.05, (27, C, Co)), dt)
        b = jnp.asarray(rng.normal(0, 0.1, (Co,)), jnp.float32)

        def run(quant):
            def body(ff):
                out, _ = conv_columns_dispatch(
                    ff, km.col_idx, km.hit, w, mask, groups=2,
                    bias=b, relu=True, pre=km.pre, nvalid=km.nvalid,
                    quant=quant)
                return out
            return jax.jit(lambda ff: jax.lax.fori_loop(
                0, REPS, lambda i, a: body(a * (1.0 - 1e-6)), ff))

        tb = timed(run(False), f, reps=1) / REPS
        tq = timed(run(True), f, reps=1) / REPS
        print(f"L{lvl} C={C:3d}->{Co:3d} V={V:6d} {tb*1e3:8.2f} "
              f"{tq*1e3:9.2f} {tb/tq:6.2f}")

    print("\nweight-grad kernels (training bwd), G=2:")
    print(f"{'case':>18s} {'v1 ms':>9s} {'v2 ms':>9s} {'x':>6s}")
    for lvl, C, Co in cases:
        L = pyr.levels[lvl]
        km, mask = L.kmap3, L.geom.mask
        V = L.geom.capacity
        f = jnp.asarray(rng.normal(0, 1, (V, 2 * C)), dt)
        f = jnp.where(mask[:, None], f, 0)
        g = jnp.asarray(rng.normal(0, 1, (V, 2 * Co)), dt)
        t_, w_ = DISPATCH_NARROW if 2 * min(C, 128) <= 128 else DISPATCH_WIDE
        p = km.pre.get((t_, w_)) if km.pre else None

        def dv1(ff, gg):
            return conv_columns_pallas_dw(
                ff, gg, km.col_idx, km.hit, mask, groups=2,
                blk=km.blk, col_r=km.col_r, hit_r=km.hit_r,
                nvalid=km.nvalid)

        def dv2(ff, gg):
            return conv_columns_pallas_dw_v2(
                ff, gg, km.col_idx, km.hit, mask, groups=2, tile=t_,
                wrows=w_, col_r=km.col_r, hit_r=km.hit_r, pre=p,
                nvalid=km.nvalid)

        t1 = timed(jax.jit(dv1), f, g)
        t2 = timed(jax.jit(dv2), f, g)
        print(f"L{lvl} C={C:3d}->{Co:3d} V={V:6d} {t1*1e3:8.2f} "
              f"{t2*1e3:9.2f} {t1/t2:6.2f}")


if __name__ == "__main__":
    main()
