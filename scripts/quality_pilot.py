"""Round-5 quality pilot: find the training protocol that makes the
overfit checkpoint BEAT the copy-the-input baseline (VERDICT r4 Missing #1).

Two hypotheses from the r04 failure (trained CD 0.898 vs input_tiled 0.298):
  1. Undertrained: 400 steps left the noise-prediction MSE near 1.0 (the
     model predicted ~zero noise, so sampling barely moved the points off
     x_init + residual noise).
  2. Guidance poisoning: with B=1 the classifier-free drop never fires
     (reference models.py:195-200 guards `or shape[0]==1`), so the
     unconditioned branch is UNTRAINED, yet sampling mixes it with w=6:
     eps = eps_u + 6*(eps_c - eps_u) amplifies garbage by -5.

This pilot trains with a manual 10% conditioning drop (exactly what the
reference does for batch>=2: zero the partial cloud for the whole batch),
cosine LR decay, and probes completion CD during training at both w=6 and
w=1.0 so the two hypotheses separate.

Env knobs: QP_NF (16384), QP_RES (0.1), QP_STEPS (6000), QP_SSTEPS (50),
QP_LR (2e-3). Writes /tmp/quality_pilot.json and logs probes as it goes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lidiff_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

REF_SCAN = "/root/reference/lidiff/Datasets/test/000123.ply"
NF = int(os.environ.get("QP_NF", 16384))
RES = float(os.environ.get("QP_RES", 0.1))
STEPS = int(os.environ.get("QP_STEPS", 6000))
S_STEPS = int(os.environ.get("QP_SSTEPS", 50))
LR = float(os.environ.get("QP_LR", 2e-3))
UNCOND_PROB = 0.1
NP_PART = NF // 10
PROBES = sorted({400, 1000, 2000, 4000, STEPS} | {STEPS})

T0 = time.time()


def log(msg):
    print(f"[pilot +{time.time() - T0:.0f}s] {msg}", flush=True)


def load_scene():
    from lidiff_tpu.ops.fps import fps
    from lidiff_tpu.utils.ply import read_ply
    pts = read_ply(REF_SCAN)["points"].astype(np.float32)
    d = np.linalg.norm(pts, axis=1)
    pts = pts[(d > 3.5) & (d < 50.0)]
    gt = fps(pts, NF).astype(np.float32)
    part = fps(gt, NP_PART).astype(np.float32)
    return gt, part


def build_cfg():
    from lidiff_tpu.config import finalize_config
    return finalize_config({
        "experiment": {"id": "quality_pilot"},
        "data": {"data_dir": "", "resolution": RES, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [], "test": [],
                 "num_points": NF, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": UNCOND_PROB, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": LR,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": S_STEPS,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
    })


def chamfer(a, b):
    from lidiff_tpu.utils.metrics import ChamferDistance
    cd = ChamferDistance()
    cd.update(a, b)
    return float(cd.compute()[0])


def main():
    from lidiff_tpu.models.diffusion import DiffusionTask
    from lidiff_tpu.ops import sparse_conv as sc

    gt, part = load_scene()
    log(f"scene gt={gt.shape} part={part.shape}")
    cfg = build_cfg()
    task = DiffusionTask(cfg)

    full_j = jnp.asarray(gt[None])
    part_j = jnp.asarray(part[None])
    zeros_part = jnp.zeros_like(part_j)

    sc.set_compute_dtype("float32")
    variables = task.init(jax.random.PRNGKey(0), batch_size=1,
                          n_full=2048, n_part=256)
    params, stats = variables["params"], variables["batch_stats"]

    sched = optax.cosine_decay_schedule(LR, STEPS, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, key, part_in):
        batch = {"pcd_full": full_j, "pcd_part": part_in}
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True)(params, stats, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), stats, opt_state,
                loss, metrics["loss_mse"])

    x_init = jnp.tile(part_j, (1, 10, 1))
    cd_input = chamfer(gt, np.asarray(x_init)[0])
    log(f"input_tiled CD = {cd_input:.4f}  <-- the bar")

    def probe(params, stats, tag):
        vars_ = {"params": params, "batch_stats": stats}
        out = {}
        for w in (6.0, 1.0):
            t0 = time.time()
            pred = np.asarray(task.sample_chunked(
                vars_, x_init, jax.random.PRNGKey(5), part=part_j,
                w_uncond=w, chunk=5))[0]
            pred = pred[np.isfinite(pred).all(axis=1)]
            cd = chamfer(gt, pred)
            out[f"w{w:g}"] = round(cd, 4)
            log(f"probe[{tag}] w={w:g}: CD={cd:.4f} "
                f"(input bar {cd_input:.4f}) [{time.time() - t0:.0f}s]")
        return out

    key = jax.random.PRNGKey(1)
    results = {"input_tiled_cd": cd_input, "probes": {}}
    mse_hist = []
    t_train0 = time.time()
    for i in range(1, STEPS + 1):
        key, k, kd = jax.random.split(key, 3)
        # manual classifier-free drop (reference batch>=2 semantics):
        # zero the whole partial cloud with prob uncond_prob
        drop = jax.random.uniform(kd, ()) < UNCOND_PROB
        part_in = jnp.where(drop, 0.0, 1.0) * part_j
        params, stats, opt_state, loss, mse = step(
            params, stats, opt_state, k, part_in)
        if i == 1:
            jax.block_until_ready(loss)
            log(f"step 1 done (compile); loss={float(loss):.4f}")
            t_train0 = time.time()
        mse_hist.append(mse)
        if i % 500 == 0:
            rate = (i - 1) / max(time.time() - t_train0, 1e-9)
            log(f"step {i}: loss={float(loss):.4f} "
                f"mse={float(mse):.4f} ({rate:.2f} steps/s)")
        if i in PROBES:
            m10 = float(np.mean([float(x) for x in mse_hist[-10:]]))
            log(f"--- probe at step {i} (mse last10 {m10:.4f})")
            results["probes"][str(i)] = {
                "mse_last10": round(m10, 4),
                **probe(params, stats, f"step{i}")}
            with open("/tmp/quality_pilot.json", "w") as f:
                json.dump(results, f, indent=2)

    log(json.dumps(results, indent=2))
    with open("/tmp/quality_pilot.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
