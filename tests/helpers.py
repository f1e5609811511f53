"""Shared test fixtures: a synthetic mini SemanticKITTI sequence tree."""

from __future__ import annotations

import os

import numpy as np


def make_kitti_tree(root: str, seq: str = "00", n_scans: int = 4,
                    n_points: int = 3000, seed: int = 0) -> str:
    """Create root/dataset/sequences/<seq>/{velodyne,labels,calib.txt,
    poses.txt,map_clean.npy} with drivable synthetic geometry."""
    rng = np.random.default_rng(seed)
    sdir = os.path.join(root, "dataset", "sequences", seq)
    os.makedirs(os.path.join(sdir, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "labels"), exist_ok=True)

    # identity-ish calib
    with open(os.path.join(sdir, "calib.txt"), "w") as f:
        eye = "1 0 0 0 0 1 0 0 0 0 1 0"
        for key in ["P0", "P1", "P2", "P3", "Tr"]:
            f.write(f"{key}: {eye}\n")

    poses = []
    with open(os.path.join(sdir, "poses.txt"), "w") as f:
        for i in range(n_scans):
            # forward motion along x
            f.write(f"1 0 0 {i * 2.0} 0 1 0 0 0 0 1 0\n")
            P = np.eye(4)
            P[0, 3] = i * 2.0
            poses.append(P)

    all_world = []
    for i in range(n_scans):
        # ring-like ground + some structure, in the scan frame
        az = rng.uniform(0, 2 * np.pi, n_points)
        r = rng.uniform(4.0, 45.0, n_points)
        z = rng.uniform(-1.8, 2.0, n_points)
        pts = np.stack([r * np.cos(az), r * np.sin(az), z],
                       -1).astype(np.float32)
        scan = np.concatenate([pts, np.ones((n_points, 1), np.float32)], 1)
        scan.tofile(os.path.join(sdir, "velodyne", f"{i:06d}.bin"))
        labels = rng.choice([40, 50, 70, 10], n_points).astype(np.uint32)
        # a few moving + outlier points
        labels[: n_points // 20] = 252
        labels[n_points // 20: n_points // 10] = 0
        labels.astype(np.uint32).tofile(
            os.path.join(sdir, "labels", f"{i:06d}.label"))
        # accumulate world-frame static points for the map
        keep = (labels < 252) & (labels > 1)
        p = pts[keep]
        p = p[np.linalg.norm(p, axis=-1) > 3.5]
        h = np.concatenate([p, np.ones((len(p), 1))], 1)
        all_world.append((h @ poses[i].T)[:, :3])

    np.save(os.path.join(sdir, "map_clean.npy"),
            np.concatenate(all_world, 0).astype(np.float32))
    return sdir
