"""Ablation timings of the denoiser forward at PROF_N points:
full / no-KNN / no-gather-conv / BN-off to locate the dominant cost."""

import os
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE",
                      os.environ.get("PROF_DTYPE", "bfloat16"))

import jax
import jax.numpy as jnp
import numpy as np

import lidiff_tpu.models.blocks as blocks_mod
import lidiff_tpu.models.minkunet as mink_mod
import lidiff_tpu.ops.knn as knn_mod
import lidiff_tpu.ops.sparse_conv as sc_mod
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


def build(task, variables, part, feats_c, geom_c, tvec):
    def fwd(p):
        pyr = task.pyramid_full(p)
        e = task.model.apply(variables, pyr, feats_c, geom_c, tvec, False,
                             method=DiffusionModel.denoise)
        return p + 1e-9 * e
    def rep(p):
        return jax.lax.fori_loop(0, K, lambda i, acc: fwd(acc + 0.0 * i), p)
    return jax.jit(rep)


def main():
    cfg = finalize_config({
        "experiment": {"id": "p6"},
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
    feats_c = task.model.apply(variables, pyr_c, False,
                               method=DiffusionModel.encode_partial)
    geom_c = pyr_c.levels[-1].geom
    tvec = jnp.full((1,), 500, jnp.int32)

    timeit("full fwd", build(task, variables, part, feats_c, geom_c, tvec),
           x)

    # ablate KNN match
    orig_match = mink_mod.match_features
    mink_mod.match_features = lambda qc, qm, rc, rm, rf, block=8192: \
        jnp.zeros((qc.shape[0], rf.shape[-1]), rf.dtype)
    timeit("fwd no-knn", build(task, variables, part, feats_c, geom_c,
                               tvec), x)
    mink_mod.match_features = orig_match

    # ablate conv gathers: center tap only
    orig_cols = sc_mod.sparse_conv_columns
    def center_only(feats, kmap, weights, out_mask):
        out = jnp.dot(feats.astype(sc_mod.COMPUTE_DTYPE),
                      weights[13].astype(sc_mod.COMPUTE_DTYPE),
                      preferred_element_type=feats.dtype)
        return jnp.where(out_mask[:, None], out, 0)
    sc_mod.sparse_conv_columns = center_only
    timeit("fwd center-tap-conv", build(task, variables, part, feats_c,
                                        geom_c, tvec), x)
    sc_mod.sparse_conv_columns = orig_cols

    # ablate BN
    orig_mm = sc_mod.masked_moments
    sc_mod.masked_moments = lambda f, m, a=None: (
        jnp.zeros((f.shape[-1],)), jnp.ones((f.shape[-1],)),
        jnp.float32(1.0))
    import lidiff_tpu.models.blocks as bm
    bm.masked_moments = sc_mod.masked_moments
    timeit("fwd no-bn-stats", build(task, variables, part, feats_c, geom_c,
                                    tvec), x)


if __name__ == "__main__":
    main()
