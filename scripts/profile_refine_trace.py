"""Device-trace ONE warm refine train step and print the budget table.

Attributes the refine-train step time (VERDICT r4 Weak #2: 0.083 steps/s
round 4, unattributed) across the refine UNet fwd+bwd, the chamfer grid
matcher calls, lexsorts, and scatter/gather — same Chrome-trace parsing as
scripts/profile_trace.py.

Usage (on TPU): python scripts/profile_refine_trace.py
Env: PROF_NUM_POINTS (180000), PROF_LOGDIR (/tmp/lidiff_refine_trace)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE", "bfloat16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lidiff_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from scripts.profile_trace import (aggregate, load_latest_trace,
                                   print_report)
from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.refine import RefineTask

N = int(os.environ.get("PROF_NUM_POINTS", 180_000))
LOG_DIR = os.environ.get("PROF_LOGDIR", "/tmp/lidiff_refine_trace")

cfg = finalize_config({
    "experiment": {"id": "refine_trace"},
    "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
             "split": "train", "train": [], "validation": [], "test": [],
             "num_points": N, "max_range": 50.0,
             "dataset_norm": False, "std_axis_norm": False},
    "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
              "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
              "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
    "diff": {"beta_start": 3.5e-5, "beta_end": 0.007, "beta_func": "linear",
             "t_steps": 1000, "s_steps": 50, "reg_weight": 5.0},
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
print(f"[refine-trace] warm in {time.time() - t0:.0f}s", flush=True)

t0 = time.time()
jax.profiler.start_trace(LOG_DIR)
params, opt_state, bs, m = step(params, opt_state, bs,
                                jax.random.fold_in(k, 1))
jax.block_until_ready(m)
jax.profiler.stop_trace()
wall = time.time() - t0
print(f"[refine-trace] step wall {wall:.2f}s (incl. trace overhead)",
      flush=True)

trace = load_latest_trace(LOG_DIR)
buckets, per_name, busy, span = aggregate(trace)
print_report(buckets, per_name, busy, span, 1, top=30)
out = {
    "n_points": N, "wall_ms_per_step": wall * 1e3,
    "busy_ms_per_step": busy / 1e3, "span_ms_per_step": span / 1e3,
    "buckets_ms_per_step": {b: us / 1e3 for b, us in buckets.items()},
    "top": [{"name": kk, **{x: rec[x] for x in ("us", "count", "bucket")}}
            for kk, rec in sorted(per_name.items(),
                                  key=lambda kv: -kv[1]["us"])[:60]],
}
with open(os.path.join(LOG_DIR, "budget.json"), "w") as fp:
    json.dump(out, fp, indent=1)
print(f"[refine-trace] wrote {os.path.join(LOG_DIR, 'budget.json')}")
