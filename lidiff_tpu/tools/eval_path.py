"""Full-sequence evaluation harness (CLI).

Re-design of /root/reference/lidiff/utils/eval_path.py: run completion (or
read pre-saved .ply results) over a sequence, rebuild per-scan ground truth
from map_clean.npy (range crop, scan frame, z in (-4, 4.4), 10 m viewpoint
filter), and accumulate JSD-3D/BEV, RMSE, IoU@{0.5,0.2,0.1}, Chamfer, and
PR-AUC; dump res_log.yaml (JSON body, same as the reference,
eval_path.py:159-170).
"""

from __future__ import annotations

import json
import os

import click
import numpy as np

from lidiff_tpu.data import preprocess
from lidiff_tpu.data.collation import viewpoint_filter
from lidiff_tpu.utils import ply
from lidiff_tpu.utils.histogram_metrics import compute_hist_metrics
from lidiff_tpu.utils.metrics import (ChamferDistance, CompletionIoU,
                                      PrecisionRecall, RMSE)
from lidiff_tpu.utils.natsort import natsorted


def get_scan_completion(scan_path: str, saved_path: str, diff_completion,
                        max_range: float):
    points = preprocess.read_scan(scan_path)
    dist = np.linalg.norm(points, axis=-1)
    input_points = points[dist < max_range]
    if diff_completion is None:
        pred_file = os.path.join(
            saved_path,
            os.path.basename(scan_path).split(".")[0] + ".ply")
        pred = ply.read_ply(pred_file)["points"]
        pred = pred[np.linalg.norm(pred, axis=-1) < max_range]
    else:
        pred = diff_completion.complete_scan_diff(points)
    return pred, input_points


def get_ground_truth(pose: np.ndarray, cur_scan: np.ndarray,
                     seq_map: np.ndarray, max_range: float) -> np.ndarray:
    gt = preprocess.crop_map_to_scan(seq_map, pose, max_range,
                                     z_min=-4.0, z_max=4.4)
    keep = viewpoint_filter(gt, cur_scan, voxel=10.0)
    return gt[keep]


@click.command()
@click.option("--path", "-p", type=str, default="",
              help="path to pre-saved completions (skip inference)")
@click.option("--data", type=str,
              default="./Datasets/SemanticKITTI/dataset/sequences/08",
              help="sequence directory")
@click.option("--max_range", "-m", type=float, default=50.0)
@click.option("--denoising_steps", "-t", type=int, default=50)
@click.option("--cond_weight", "-s", type=float, default=6.0)
@click.option("--diff", "-d", type=str, default=None,
              help="diffusion ckpt dir (enables live completion)")
@click.option("--refine", "-r", type=str, default=None)
@click.option("--max_scans", type=int, default=None)
def main(path, data, max_range, denoising_steps, cond_weight, diff, refine,
         max_scans):
    diff_completion = None
    if diff:
        from lidiff_tpu.tools.diff_completion_pipeline import DiffCompletion
        diff_completion = DiffCompletion(diff, refine, denoising_steps,
                                         cond_weight)

    poses = preprocess.load_poses(os.path.join(data, "calib.txt"),
                                  os.path.join(data, "poses.txt"))
    seq_map = np.load(os.path.join(data, "map_clean.npy"))

    iou = CompletionIoU()
    rmse = RMSE()
    cd = ChamferDistance()
    pr = PrecisionRecall(0.05, 0.10, 100)
    jsd_3d, jsd_bev = [], []

    scans = natsorted(os.listdir(os.path.join(data, "velodyne")))
    pairs = list(zip(poses, scans))
    if max_scans:
        pairs = pairs[:max_scans]
    for pose, scan in pairs:
        pred, cur = get_scan_completion(
            os.path.join(data, "velodyne", scan), path, diff_completion,
            max_range)
        gt = get_ground_truth(pose, cur, seq_map, max_range)
        jsd_3d.append(compute_hist_metrics(gt, pred, bev=False))
        jsd_bev.append(compute_hist_metrics(gt, pred, bev=True))
        rmse.update(gt, pred)
        iou.update(gt, pred)
        cd.update(gt, pred)
        pr.update(gt, pred)
        print(f"{scan}: JSD3D {jsd_3d[-1]:.4f} JSDBEV {jsd_bev[-1]:.4f}")

    rmse_mean, rmse_std = rmse.compute()
    ious = iou.compute()
    cd_mean, cd_std = cd.compute()
    p, r, f1 = pr.compute_auc()

    print("\n=================== FINAL RESULTS ===================")
    print(f"JSD 3D: {np.mean(jsd_3d)}")
    print(f"JSD BEV: {np.mean(jsd_bev)}")
    print(f"RMSE: {rmse_mean} +- {rmse_std}")
    for v, x in ious.items():
        print(f"Voxel {v}m IoU: {x}")
    print(f"CD: {cd_mean} +- {cd_std}")
    print(f"Precision {p} Recall {r} F-Score {f1}")

    res = {
        "jsd": float(np.mean(jsd_bev)),
        "jsd_noclip_3d": float(np.mean(jsd_3d)),
        "rmse_mean": rmse_mean, "rmse_std": rmse_std,
        "ious": {str(k): v for k, v in ious.items()},
        "cd_mean": cd_mean, "cd_std": cd_std,
        "pr": p, "re": r, "f1": f1,
    }
    log_dir = path if path else "."
    with open(os.path.join(log_dir, "res_log.yaml"), "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
