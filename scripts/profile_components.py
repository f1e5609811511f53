"""Component-level TPU timings: quantize, pyramid, kmaps, UNet forward,
solver step — to target optimization work. Not part of the library."""

import json
import os
import sys
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION",
                      os.environ.get("PROF_PRECISION", "default"))

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.diffusion import DiffusionTask
from lidiff_tpu.ops import grid as G

N = int(os.environ.get("PROF_N", 60000))
NP_ = N // 10


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return out


def main():
    cfg = finalize_config({
        "experiment": {"id": "prof"},
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
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, NP_)
    r = rng.uniform(3.5, 50.0, NP_)
    part = np.stack([r * np.cos(az), r * np.sin(az),
                     rng.uniform(-2, 2, NP_)], -1).astype(np.float32)[None]
    x = jnp.asarray(np.tile(part, (1, 10, 1))
                    + rng.normal(0, 1, (1, N, 3)).astype(np.float32))
    res, caps = task.resolution, task.full_caps

    q = jax.jit(lambda p: G.quantize(p, res, caps[0]))
    geom, feats, p2v = timeit("quantize(180k-ish)", q, x)

    pool = jax.jit(lambda g: G.pool_geom(g, caps[1]))
    pooled, c2p = timeit("pool L0->L1", pool, geom)

    km = jax.jit(lambda g: G.build_kernel_map(g, g, G.cube_offsets(3, 1)))
    timeit("kmap3 L0 (27 taps)", km, geom)

    kd = jax.jit(lambda a, b: G.build_kernel_map(a, b, G.cube_offsets(2, 1)))
    timeit("down kmap L0->L1 (8 taps)", kd, geom, pooled)

    pyr_fn = jax.jit(task.pyramid_full)
    pyr = timeit("build_pyramid FULL", pyr_fn, x)

    part_j = jnp.asarray(part)
    pyr_p = jax.jit(task.pyramid_part)(part_j)
    variables = task.init(jax.random.PRNGKey(0), 1, 2048, 256)
    feats_c = task.model.apply(variables, pyr_p, False,
                               method=type(task.model).encode_partial)
    geom_c = pyr_p.levels[-1].geom
    t0 = jnp.zeros((1,), jnp.int32)

    den = jax.jit(lambda v, py, fc, gc, t: task.model.apply(
        v, py, fc, gc, t, False, method=type(task.model).denoise))
    timeit("denoiser forward (1 pass)", den, variables, pyr, feats_c,
           geom_c, t0)

    enc = jax.jit(lambda v, py: task.model.apply(
        v, py, False, method=type(task.model).encode_partial))
    timeit("partial encoder", enc, variables, pyr_p)

    print("done", flush=True)


if __name__ == "__main__":
    main()
