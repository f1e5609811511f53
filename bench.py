"""Benchmark: denoise steps/sec/chip on the flagship completion workload.

Measures the full classifier-free denoise step at the reference operating
point (num_points=180000, res 0.05, 50-step DPM-Solver++(2M,SDE)): per-step
re-voxelization + two conditional-UNet forwards + solver update, jitted as
one lax.scan. Prints ONE JSON line.

North star (BASELINE.md): 50-step completion of a full scan < 1 s/chip,
i.e. >= 50 denoise steps/sec/chip. vs_baseline = steps_per_sec / 50.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")  # MXU fast path

import jax
import jax.numpy as jnp
import numpy as np


def _enable_compile_cache():
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    # moderate but realistic synthetic scan: ring-structured LiDAR-like
    # geometry so voxel occupancy is surface-like, not volumetric noise
    n_points = int(os.environ.get("BENCH_NUM_POINTS", 180_000))
    s_steps = int(os.environ.get("BENCH_STEPS", 50))
    n_part = n_points // 10

    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.diffusion.dpm_solver import make_dpm_solver
    from lidiff_tpu.models.diffusion import DiffusionTask

    cfg = finalize_config({
        "experiment": {"id": "bench"},
        "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [], "test": [],
                 "num_points": n_points, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": s_steps,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
    })
    task = DiffusionTask(cfg)
    solver = make_dpm_solver("linear", 1000, s_steps, 3.5e-5, 0.007)

    # synthetic LiDAR scan: points on concentric rings with elevation bands
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, n_part)
    el = rng.choice(np.linspace(-0.4, 0.05, 64), n_part)
    r = rng.uniform(3.5, 50.0, n_part)
    part = np.stack([r * np.cos(az) * np.cos(el),
                     r * np.sin(az) * np.cos(el),
                     r * np.sin(el)], -1).astype(np.float32)[None]
    x_init = np.tile(part, (1, 10, 1))

    variables = task.init(jax.random.PRNGKey(0), batch_size=1,
                          n_full=2048, n_part=256)

    # chunked sampler: bounds single device-call duration (the tunneled
    # backend kills very long executions) at negligible dispatch cost
    chunk = int(os.environ.get("BENCH_CHUNK", 5))
    prepare, run_chunk, finish, n_steps = task.make_chunked_sampler(
        solver=solver, chunk=chunk)

    def sample(v, xi, p, k):
        ctx = prepare(v, xi, p, k)
        for i0 in range(0, n_steps, chunk):
            ctx = run_chunk(v, ctx, jnp.int32(i0))
        return finish(ctx)

    xi = jnp.asarray(x_init)
    pp = jnp.asarray(part)
    k = jax.random.PRNGKey(1)

    t0 = time.time()
    out = sample(variables, xi, pp, k)
    out.block_until_ready()
    compile_and_first = time.time() - t0

    reps = int(os.environ.get("BENCH_REPS", 2))
    t0 = time.time()
    for i in range(reps):
        out = sample(variables, xi, pp, jax.random.fold_in(k, i))
    out.block_until_ready()
    elapsed = (time.time() - t0) / reps

    steps_per_sec = s_steps / elapsed
    result = {
        "metric": "denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 50.0, 4),
        "detail": {
            "e2e_completion_latency_s": round(elapsed, 3),
            "num_points": n_points,
            "s_steps": s_steps,
            "compile_plus_first_run_s": round(compile_and_first, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
