"""Time the sampling-step pieces exactly as composed in DiffusionTask.sample
(in-executable repeats at PROF_N points)."""

import os
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE",
                      os.environ.get("PROF_DTYPE", "bfloat16"))

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.diffusion import DiffusionModel, DiffusionTask

N = int(os.environ.get("PROF_N", 60000))
K = int(os.environ.get("PROF_K", 5))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/K*1000:.1f} ms/iter",
          flush=True)


def main():
    cfg = finalize_config({
        "experiment": {"id": "p5"},
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
    az = rng.uniform(0, 2 * np.pi, N // 10)
    r = rng.uniform(3.5, 50.0, N // 10)
    part = jnp.asarray(np.stack(
        [r * np.cos(az), r * np.sin(az), rng.uniform(-2, 2, N // 10)],
        -1).astype(np.float32)[None])
    x = jnp.asarray(np.asarray(np.tile(part, (1, 10, 1)))
                    + rng.normal(0, 1, (1, N, 3)).astype(np.float32))
    variables = task.init(jax.random.PRNGKey(0), 1, 2048, 256)

    pyr_c = jax.jit(task.pyramid_part)(part)
    pyr_u = jax.jit(task.pyramid_part_tiny)(jnp.zeros_like(part))
    feats_c = task.model.apply(variables, pyr_c, False,
                               method=DiffusionModel.encode_partial)
    feats_u = task.model.apply(variables, pyr_u, False,
                               method=DiffusionModel.encode_partial)
    geom_c = pyr_c.levels[-1].geom
    geom_u = pyr_u.levels[-1].geom
    tvec = jnp.full((1,), 500, jnp.int32)

    def rep(body):
        def f(p):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: body(acc + 0.0 * i), p)
        return jax.jit(f)

    def fwd_cond(p):
        pyr = task.pyramid_full(p)
        e = task.model.apply(variables, pyr, feats_c, geom_c, tvec, False,
                             method=DiffusionModel.denoise)
        return p + 1e-9 * e

    def fwd_uncond(p):
        pyr = task.pyramid_full(p)
        e = task.model.apply(variables, pyr, feats_u, geom_u, tvec, False,
                             method=DiffusionModel.denoise)
        return p + 1e-9 * e

    def geom_only(p):
        pyr = task.pyramid_full(p)
        return p + 1e-9 * pyr.vox_feats[: p.shape[1]][None]

    def both(p):
        pyr = task.pyramid_full(p)
        ec = task.model.apply(variables, pyr, feats_c, geom_c, tvec, False,
                              method=DiffusionModel.denoise)
        eu = task.model.apply(variables, pyr, feats_u, geom_u, tvec, False,
                              method=DiffusionModel.denoise)
        return p + 1e-9 * (eu + 6.0 * (ec - eu))

    timeit("geometry only", rep(geom_only), x)
    timeit("geometry+cond fwd", rep(fwd_cond), x)
    timeit("geometry+uncond fwd", rep(fwd_uncond), x)
    timeit("full pair (shared geom)", rep(both), x)


if __name__ == "__main__":
    main()
