"""Measure per-pyramid-level voxel occupancy across the sampling trajectory
on the REAL example scan, to derive honest static capacities.

Addresses the round-1 advisor finding (ADVICE.md #1): with ~1 m point-local
noise at t ~ T, stride-2/4/8 voxels barely merge, so shrink-2.0 capacities
silently drop 50-88% of coarse voxels (spatially biased: highest
lexicographic keys go first).

Uses the reference demo scan (/root/reference/lidiff/Datasets/test/000123.ply,
the pipeline input at README.md:93-99), preprocessed exactly like
DiffCompletion.preprocess_scan (crop 3.5-50 m, FPS to N/10, tile 10x).

Run: python scripts/measure_occupancy.py [--num-points 180000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lidiff_tpu.diffusion.schedules import make_betas
from lidiff_tpu.ops.fps import fps_numpy
from lidiff_tpu.utils.ply import read_ply

SCAN = "/root/reference/lidiff/Datasets/test/000123.ply"


def unique_count(coords: np.ndarray) -> int:
    """Unique rows of int coords via packing into one int64 key."""
    c = coords.astype(np.int64) + 4096
    key = (c[:, 0] << 26) | (c[:, 1] << 13) | c[:, 2]
    return np.unique(key).size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=180000)
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--s-steps", type=int, default=50)
    ap.add_argument("--t-steps", type=int, default=1000)
    args = ap.parse_args()

    pts = read_ply(SCAN)["points"].astype(np.float64)
    dist = np.linalg.norm(pts, axis=1)
    pts = pts[(dist > 3.5) & (dist < 50.0)]
    n_part = args.num_points // 10
    print(f"scan: {pts.shape[0]} pts in crop; FPS to {n_part}")
    idx = fps_numpy(pts.astype(np.float32), n_part)
    part = pts[idx]
    x0 = np.tile(part, (10, 1))                       # [N, 3] anchors

    betas = make_betas("linear", args.t_steps, 3.5e-5, 0.007)
    abar = np.cumprod(1.0 - betas)
    sigma = np.sqrt(1.0 - abar)                       # point-local noise std

    # diffusers-style timestep selection for the sampling run
    ts = np.linspace(0, args.t_steps - 1, args.s_steps + 1).round()[::-1][:-1]
    ts = ts.astype(int)

    rng = np.random.default_rng(0)
    noise = rng.standard_normal(x0.shape)

    strides = [1, 2, 4, 8, 16]
    max_count = {s: 0 for s in strides}
    print(f"{'t':>5} {'sigma':>6} " + " ".join(f"s={s:<6d}" for s in strides))
    rows = []
    for t in ts:
        x_t = x0 + sigma[t] * noise
        c1 = np.round(x_t / args.resolution).astype(np.int64)
        counts = []
        for s in strides:
            cs = (c1 // s) * s if s > 1 else c1
            n = unique_count(cs // s)
            counts.append(n)
            max_count[s] = max(max_count[s], n)
        rows.append((int(t), float(sigma[t]), counts))
        print(f"{t:5d} {sigma[t]:6.3f} " +
              " ".join(f"{c:8d}" for c in counts))

    N = args.num_points
    print("\nmax over trajectory (fraction of N):")
    fracs = [max_count[s] / N for s in strides]
    print("  " + " ".join(f"s={s}: {max_count[s]:7d} ({f:.3f})"
                          for s, f in zip(strides, fracs)))
    out = {
        "num_points": N,
        "resolution": args.resolution,
        "strides": strides,
        "max_counts": [max_count[s] for s in strides],
        "fractions": fracs,
        "per_step": [{"t": t, "sigma": s, "counts": c} for t, s, c in rows],
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "occupancy_stats.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
