"""On-TPU A/B: refine train step with exact vs grid chamfer index pass.

The refine loss (models/refine.py:72, reference models_refine.py:72) is a
chamfer between the upsampled noisy cloud (num_points * up_factor) and the
GT map sample (2 * num_points).  At the bench operating point (180k x 6 up,
360k GT) the exact blocked 1-NN is O(N*M) GEMM work that wastes 125/128 of
every MXU pass (K=3); the grid path quantizes to 2.5 cm and rides the
production block-pruned Pallas 1-NN instead (ops/chamfer.py docstring).

Usage (real TPU):
    python scripts/profile_refine_chamfer_ab.py
Env:
    AB_NUM_POINTS (180000)  AB_REPS (3)  AB_EXACT (1: also run exact)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lidiff_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.refine import RefineTask

N = int(os.environ.get("AB_NUM_POINTS", 180_000))
REPS = int(os.environ.get("AB_REPS", 3))
RUN_EXACT = os.environ.get("AB_EXACT", "1") == "1"

cfg = finalize_config({
    "experiment": {"id": "ab_refine"},
    "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
             "split": "train", "train": [], "validation": [], "test": [],
             "num_points": N, "max_range": 50.0,
             "dataset_norm": False, "std_axis_norm": False},
    "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
              "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
              "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
    "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
             "beta_func": "linear", "t_steps": 1000, "s_steps": 50,
             "reg_weight": 5.0},
    "model": {"out_dim": 96},
})

rng = np.random.default_rng(0)
az = rng.uniform(0, 2 * np.pi, N)
r = rng.uniform(3, 48, N)
pts = np.stack([r * np.cos(az), r * np.sin(az),
                rng.uniform(-2.5, 2.5, N)], -1).astype(np.float32)
xi = jnp.asarray(pts)[None]
batch = {"pcd_noise": xi, "pcd_full": jnp.concatenate([xi, xi], axis=1)}

task = RefineTask(cfg)
rvars = task.init(jax.random.PRNGKey(5), batch_size=1, n_points=2048)
opt = optax.adam(1e-4)


def measure(method: str):
    os.environ["LIDIFF_CHAMFER"] = method
    params, bs = rvars["params"], rvars["batch_stats"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch_stats, key):
        (_, (nbs, m)), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True)(params, batch_stats, batch, key)
        ups, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, ups), opt_state, nbs, m

    k = jax.random.PRNGKey(7)
    t0 = time.time()
    params, opt_state, bs, m = step(params, opt_state, bs, k)
    jax.block_until_ready(m)
    print(f"[{method}] compile+first: {time.time() - t0:.1f}s "
          f"cd_loss={float(m['cd_loss']):.4f}", flush=True)
    t0 = time.time()
    for i in range(REPS):
        params, opt_state, bs, m = step(params, opt_state, bs,
                                        jax.random.fold_in(k, i))
    jax.block_until_ready(m)
    dt = (time.time() - t0) / REPS
    print(f"[{method}] {1.0 / dt:.3f} steps/s ({dt * 1e3:.0f} ms/step) "
          f"cd_loss={float(m['cd_loss']):.4f}", flush=True)
    return 1.0 / dt, float(m["cd_loss"])


print(f"devices={jax.devices()} N={N} up=6 gt={2 * N}", flush=True)
grid_sps, grid_cd = measure("grid")
if RUN_EXACT:
    exact_sps, exact_cd = measure("exact")
    print(f"speedup: {grid_sps / exact_sps:.2f}x  "
          f"cd delta: {abs(grid_cd - exact_cd):.2e} "
          f"({abs(grid_cd - exact_cd) / max(exact_cd, 1e-9):.2%} rel)",
          flush=True)
