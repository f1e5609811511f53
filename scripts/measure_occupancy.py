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


def scene_ref() -> np.ndarray:
    pts = read_ply(SCAN)["points"].astype(np.float64)
    dist = np.linalg.norm(pts, axis=1)
    return pts[(dist > 3.5) & (dist < 50.0)]


def scene_dense(n: int = 400_000, seed: int = 1) -> np.ndarray:
    """Synthetic worst-ish case: urban canyon — ground plane, two long
    facades, cross walls and clutter, all surface-sampled. Much higher
    surface area inside the crop than the reference demo scan, so coarse
    levels merge less."""
    rng = np.random.default_rng(seed)
    parts = []
    n_g = n // 3
    xy = rng.uniform(-50, 50, (n_g, 2))
    parts.append(np.column_stack(
        [xy, rng.normal(-1.7, 0.03, n_g)]))                   # ground
    n_w = n // 6
    for y0 in (-8.0, 8.0):                                    # facades
        x = rng.uniform(-50, 50, n_w)
        z = rng.uniform(-1.7, 6.0, n_w)
        parts.append(np.column_stack(
            [x, np.full(n_w, y0) + rng.normal(0, 0.05, n_w), z]))
    for x0_ in (-25.0, 0.0, 25.0):                            # cross walls
        n_c = n // 12
        y = rng.uniform(-8, 8, n_c)
        z = rng.uniform(-1.7, 4.0, n_c)
        parts.append(np.column_stack(
            [np.full(n_c, x0_) + rng.normal(0, 0.05, n_c), y, z]))
    n_cl = n - sum(len(p) for p in parts)                     # clutter
    parts.append(np.column_stack([rng.uniform(-45, 45, n_cl),
                                  rng.uniform(-7, 7, n_cl),
                                  rng.uniform(-1.7, 2.0, n_cl)]))
    pts = np.concatenate(parts)
    d = np.linalg.norm(pts, axis=1)
    return pts[(d > 3.5) & (d < 50.0)]


def scene_rings(n: int = 400_000, seed: int = 2) -> np.ndarray:
    """Synthetic sparse case: open-road LiDAR rings on flat ground with a
    few poles — concentrated occupancy near the sensor."""
    rng = np.random.default_rng(seed)
    el = rng.choice(np.linspace(-0.42, -0.02, 64), n)
    az = rng.uniform(0, 2 * np.pi, n)
    r = np.minimum(1.7 / np.maximum(-np.tan(el), 1e-3), 120.0)
    pts = np.column_stack([r * np.cos(az), r * np.sin(az),
                           np.full(n, -1.7) + rng.normal(0, 0.02, n)])
    n_p = n // 50
    for px, py in [(10, 3), (-15, -4), (30, 6), (-35, 2)]:
        th = rng.uniform(0, 2 * np.pi, n_p)
        z = rng.uniform(-1.7, 3.5, n_p)
        pts = np.concatenate([pts, np.column_stack(
            [px + 0.2 * np.cos(th), py + 0.2 * np.sin(th), z])])
    d = np.linalg.norm(pts, axis=1)
    return pts[(d > 3.5) & (d < 50.0)]


SCENES = {"ref": scene_ref, "dense": scene_dense, "rings": scene_rings}


def measure_scene(pts, num_points, resolution, s_steps, t_steps,
                  use_fps=True, verbose=True):
    """Worst-case per-level unique-voxel fractions over the sampling
    trajectory (noisy full cloud) and for the clean partial scan."""
    n_part = num_points // 10
    if use_fps and len(pts) > n_part:
        idx = fps_numpy(pts.astype(np.float32), n_part)
        part = pts[idx]
    else:
        rng = np.random.default_rng(0)
        part = pts[rng.choice(len(pts), n_part, replace=len(pts) < n_part)]
    x0 = np.tile(part, (10, 1))

    betas = make_betas("linear", t_steps, 3.5e-5, 0.007)
    abar = np.cumprod(1.0 - betas)
    sigma = np.sqrt(1.0 - abar)
    ts = np.linspace(0, t_steps - 1, s_steps + 1).round()[::-1][:-1]
    ts = ts.astype(int)

    rng = np.random.default_rng(0)
    noise = rng.standard_normal(x0.shape)
    strides = [1, 2, 4, 8, 16]
    max_count = {s: 0 for s in strides}
    rows = []
    for t in ts:
        x_t = x0 + sigma[t] * noise
        c1 = np.round(x_t / resolution).astype(np.int64)
        counts = []
        for s in strides:
            cs = (c1 // s) if s > 1 else c1
            counts.append(unique_count(cs))
            max_count[s] = max(max_count[s], counts[-1])
        rows.append((int(t), float(sigma[t]), counts))
        if verbose:
            print(f"{t:5d} {sigma[t]:6.3f} " +
                  " ".join(f"{c:8d}" for c in counts))
    # clean partial (conditions the diffusion, never noised)
    cp = np.round(part / resolution).astype(np.int64)
    part_fracs = [unique_count(cp // s if s > 1 else cp) / n_part
                  for s in strides]
    fracs = [max_count[s] / num_points for s in strides]
    return fracs, part_fracs, max_count, rows, strides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=180000)
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--s-steps", type=int, default=50)
    ap.add_argument("--t-steps", type=int, default=1000)
    ap.add_argument("--scene", choices=list(SCENES) + ["all"],
                    default="ref")
    ap.add_argument("--summary", action="store_true",
                    help="sweep scenes x point counts; print worst-case "
                    "fraction table for config._FRACTION_TABLE")
    args = ap.parse_args()

    if args.summary:
        worst = {}
        for name in (SCENES if args.scene == "all" else [args.scene]):
            if name == "ref" and not os.path.exists(SCAN):
                continue
            pts = SCENES[name]()
            for N in (20_000, 60_000, 180_000):
                fr, pf, _, _, strides = measure_scene(
                    pts, N, args.resolution, 10, args.t_steps,
                    use_fps=(name == "ref"), verbose=False)
                key = N
                worst.setdefault(key, ([0.0] * 5, [0.0] * 5))
                worst[key] = (
                    [max(a, b) for a, b in zip(worst[key][0], fr)],
                    [max(a, b) for a, b in zip(worst[key][1], pf)])
                print(f"{name:6s} N={N:7d} full={np.round(fr, 3)} "
                      f"part={np.round(pf, 3)}")
        print("\nworst case per point-count regime "
              "(full trajectory / clean partial):")
        for N, (fr, pf) in sorted(worst.items()):
            print(f"  N<={N}: full={np.round(fr, 3).tolist()} "
                  f"part={np.round(pf, 3).tolist()}")
        return

    pts = SCENES[args.scene]()
    n_part = args.num_points // 10
    print(f"scene {args.scene}: {pts.shape[0]} pts in crop; "
          f"sample to {n_part}")
    fracs, part_fracs, max_count, rows, strides = measure_scene(
        pts, args.num_points, args.resolution, args.s_steps, args.t_steps,
        use_fps=(args.scene == "ref"))

    N = args.num_points
    print("\nmax over trajectory (fraction of N):")
    print("  " + " ".join(f"s={s}: {max_count[s]:7d} ({f:.3f})"
                          for s, f in zip(strides, fracs)))
    out = {
        "num_points": N,
        "resolution": args.resolution,
        "strides": strides,
        "max_counts": [max_count[s] for s in strides],
        "fractions": fracs,
        "part_fractions": part_fracs,
        "scene": args.scene,
        "per_step": [{"t": t, "sigma": s, "counts": c} for t, s, c in rows],
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "occupancy_stats.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
