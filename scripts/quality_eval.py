"""Completion-quality artifact: CD / IoU@{0.5,0.2,0.1} / RMSE / JSD-3D /
JSD-BEV / PR-AUC for f32 vs bf16 vs int8 inference at the SAME seeds, from
one trained checkpoint — the end-metric pin for the bench's bf16 default
and the int8 deployment option (VERDICT r3 Missing #2).

Methodology (a faithful miniature of the reference task; full-dataset
Table-3 parity is impossible here — SemanticKITTI and the published
checkpoints are not in this environment):
  * scene GT = the bundled reference demo scan
    (/root/reference/lidiff/Datasets/test/000123.ply, the same scan the
    reference README uses for its demo), range-cropped 3.5-50 m and FPS'd
    to QE_NF points;
  * partial input = FPS to QE_NF/10 of the GT (exactly the reference's
    preprocess_scan semantics, diff_completion_pipeline.py:92-105);
  * a diffusion model is trained to completion on this scene (the overfit
    protocol of tests/test_learning.py at 64x the scale), then the
    50-step DPM-Solver++(2M,SDE) sampler runs once per precision with
    identical PRNG keys;
  * metrics are the reference eval set (utils/eval_path.py:126-144):
    Chamfer distance, voxel-IoU at {0.5, 0.2, 0.1} m, RMSE, JSD of 3D and
    BEV occupancy histograms, precision/recall/F1 AUC.
  * context rows: the untrained model (floor) and the tiled partial input
    (what zero diffusion steps would give).

Writes QUALITY_r04.json. Env knobs: QE_NF (default 16384), QE_RES (0.1),
QE_TRAIN_STEPS (400), QE_SSTEPS (50), QE_OUT (output path).
Run: python scripts/quality_eval.py        (TPU if ambient, else CPU)
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
NF = int(os.environ.get("QE_NF", 16384))
RES = float(os.environ.get("QE_RES", 0.1))
TRAIN_STEPS = int(os.environ.get("QE_TRAIN_STEPS", 400))
S_STEPS = int(os.environ.get("QE_SSTEPS", 50))
OUT = os.environ.get("QE_OUT", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "QUALITY_r04.json"))
NP_PART = NF // 10


def log(msg):
    print(f"[quality +{time.time() - T0:.0f}s] {msg}", flush=True)


T0 = time.time()


def load_scene():
    """GT scene + partial input from the reference demo scan; synthetic
    two-plane room fallback when the reference tree is absent."""
    from lidiff_tpu.ops.fps import fps
    if os.path.exists(REF_SCAN):
        from lidiff_tpu.utils.ply import read_ply
        pts = read_ply(REF_SCAN)["points"].astype(np.float32)
        d = np.linalg.norm(pts, axis=1)
        pts = pts[(d > 3.5) & (d < 50.0)]
        gt = fps(pts, NF).astype(np.float32)
        src = "000123.ply"
    else:
        rng = np.random.default_rng(0)
        n2 = NF // 2
        xy = rng.uniform(-20, 20, (n2, 2))
        ground = np.concatenate([xy, np.full((n2, 1), -1.5)], 1)
        xz = rng.uniform(-20, 20, (n2, 2))
        wall = np.stack([xz[:, 0], np.full(n2, 8.0), xz[:, 1]], 1)
        gt = np.concatenate([ground, wall]).astype(np.float32)
        src = "synthetic-planes"
    part = fps(gt, NP_PART).astype(np.float32)
    return gt, part, src


def build_cfg():
    from lidiff_tpu.config import finalize_config
    return finalize_config({
        "experiment": {"id": "quality_eval"},
        "data": {"data_dir": "", "resolution": RES, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [], "test": [],
                 "num_points": NF, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 2e-3,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": S_STEPS,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
    })


def eval_metrics(gt: np.ndarray, pred: np.ndarray) -> dict:
    """The reference eval-path metric set (eval_path.py:126-144)."""
    from lidiff_tpu.utils.histogram_metrics import compute_hist_metrics
    from lidiff_tpu.utils.metrics import (ChamferDistance, CompletionIoU,
                                          RMSE, PrecisionRecall)
    pred = pred[np.isfinite(pred).all(axis=1)]
    cd = ChamferDistance(); cd.update(gt, pred)
    iou = CompletionIoU(); iou.update(gt, pred)
    rmse = RMSE(); rmse.update(gt, pred)
    pr = PrecisionRecall(0.05, 2 * 0.05, 100); pr.update(gt, pred)
    p_auc, r_auc, f_auc = pr.compute_auc()
    iou_d = iou.compute()
    return {
        "cd": round(float(cd.compute()[0]), 4),
        "iou_0.5": round(float(iou_d[0.5]), 4),
        "iou_0.2": round(float(iou_d[0.2]), 4),
        "iou_0.1": round(float(iou_d[0.1]), 4),
        "rmse": round(float(rmse.compute()[0]), 4),
        "jsd_3d": round(compute_hist_metrics(gt, pred, bev=False), 4),
        "jsd_bev": round(compute_hist_metrics(gt, pred, bev=True), 4),
        "pr_auc": [round(float(p_auc), 4), round(float(r_auc), 4),
                   round(float(f_auc), 4)],
        "n_pred": int(len(pred)),
    }


def main():
    from lidiff_tpu.models.diffusion import DiffusionTask
    from lidiff_tpu.ops import sparse_conv as sc

    gt, part, src = load_scene()
    log(f"scene {src}: gt={gt.shape} part={part.shape}")
    cfg = build_cfg()
    task = DiffusionTask(cfg)

    full_j = jnp.asarray(gt[None])
    part_j = jnp.asarray(part[None])
    batch = {"pcd_full": full_j, "pcd_part": part_j}

    # train in f32 (precision-neutral checkpoint; the table isolates
    # INFERENCE precision)
    sc.set_compute_dtype("float32")
    variables = task.init(jax.random.PRNGKey(0), batch_size=1,
                          n_full=2048, n_part=256)
    params, stats = variables["params"], variables["batch_stats"]
    untrained = {"params": params, "batch_stats": stats}

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, key):
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True)(params, stats, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    log(f"training {TRAIN_STEPS} steps (compile on first)")
    for i in range(TRAIN_STEPS):
        key, k = jax.random.split(key)
        params, stats, opt_state, loss = step(params, stats, opt_state, k)
        if i == 0:
            jax.block_until_ready(loss)
            log(f"train step 0 done (loss={float(loss):.4f})")
        losses.append(loss)
        if (i + 1) % 100 == 0:
            log(f"train step {i + 1}: loss={float(loss):.4f}")
    losses = [float(x) for x in losses]
    trained = {"params": params, "batch_stats": stats}

    x_init = jnp.tile(part_j, (1, 10, 1))
    sample_key = jax.random.PRNGKey(5)   # SAME key for every precision

    def run_sample(vars_, tag):
        t0 = time.time()
        out = np.asarray(task.sample_chunked(
            vars_, x_init, sample_key, part=part_j, chunk=5))[0]
        log(f"sampled [{tag}] in {time.time() - t0:.1f}s")
        return out

    rows = {}
    # f32 / bf16 / int8 on the SAME trained params and key
    for tag, dtype, quant in (("f32", "float32", False),
                              ("bf16", "bfloat16", False),
                              ("int8", "bfloat16", True)):
        sc.set_compute_dtype(dtype)
        sc.set_conv_quant(quant)
        try:
            pred = run_sample(trained, tag)
        finally:
            sc.set_conv_quant(False)
        rows[tag] = eval_metrics(gt, pred)

    # context rows
    sc.set_compute_dtype("float32")
    rows["untrained_f32"] = eval_metrics(gt, run_sample(untrained,
                                                        "untrained"))
    rows["input_tiled"] = eval_metrics(gt, np.asarray(x_init)[0])

    result = {
        "artifact": "completion_quality",
        "round": 4,
        "scene": src,
        "protocol": {
            "n_full": NF, "n_part": NP_PART, "resolution": RES,
            "s_steps": S_STEPS, "train_steps": TRAIN_STEPS,
            "uncond_w": 6.0, "sampler": "dpm-solver++(2M,SDE)",
            "device": str(jax.devices()[0]),
            "train_loss_first10": round(float(np.mean(losses[:10])), 4),
            "train_loss_last10": round(float(np.mean(losses[-10:])), 4),
        },
        "metrics_vs_gt": rows,
        "acceptance": {
            "cd_bf16_vs_f32_pct": round(
                100.0 * (rows["bf16"]["cd"] - rows["f32"]["cd"])
                / max(rows["f32"]["cd"], 1e-9), 2),
            "cd_int8_vs_f32_pct": round(
                100.0 * (rows["int8"]["cd"] - rows["f32"]["cd"])
                / max(rows["f32"]["cd"], 1e-9), 2),
            "gate": "BASELINE.md: CD@0.2-resolution within 1% across "
                    "precisions (bf16 is the bench default)",
        },
    }
    out_path = os.path.abspath(OUT)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {out_path}")
    print(json.dumps(result["metrics_vs_gt"], indent=2))


if __name__ == "__main__":
    main()
