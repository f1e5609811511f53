"""Ground-truth map builder (CLI).

Re-design of /root/reference/lidiff/map_from_scans.py: for each sequence,
pose-transform every scan into the world frame, drop moving/outlier classes
and points < 3.5 m, aggregate, dedup at `voxel_size` (first point per
voxel), and save `map_clean.npy`.

Unlike the reference (which re-dedups the WHOLE growing map after every
scan, O(map) per scan on GPU), we keep a persistent voxel hash set on the
host and only insert new points — O(scan) per scan, exact same result.
"""

from __future__ import annotations

import os

import click
import numpy as np

from lidiff_tpu.data import preprocess
from lidiff_tpu.utils.natsort import natsorted

SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "08", "09", "10"]


def build_map(seq_dir: str, voxel_size: float,
              progress: bool = True) -> np.ndarray:
    poses = preprocess.load_poses(os.path.join(seq_dir, "calib.txt"),
                                  os.path.join(seq_dir, "poses.txt"))
    scans = natsorted(os.listdir(os.path.join(seq_dir, "velodyne")))
    seen: set[tuple] = set()
    chunks: list[np.ndarray] = []
    for i, (pose, fname) in enumerate(zip(poses, scans)):
        p = preprocess.read_scan(os.path.join(seq_dir, "velodyne", fname))
        lbl = preprocess.read_labels(
            os.path.join(seq_dir, "labels", fname.replace(".bin", ".label")))
        p = p[preprocess.static_mask(lbl)]
        p = p[np.linalg.norm(p, axis=-1) > 3.5]
        p = preprocess.apply_transform(p, pose).astype(np.float32)

        cells = np.floor(p / voxel_size).astype(np.int64)
        # incremental dedup: keep first point of each previously unseen cell
        keep = np.zeros(len(p), bool)
        local: set[tuple] = set()
        for j, c in enumerate(map(tuple, cells)):
            if c not in seen and c not in local:
                local.add(c)
                keep[j] = True
        seen.update(local)
        chunks.append(p[keep])
        if progress and i % 100 == 0:
            print(f"  scan {i}/{len(scans)}, map size "
                  f"{sum(len(c) for c in chunks)}")
    return np.concatenate(chunks, 0)


@click.command()
@click.option("--path", "-p", type=str, required=True,
              help="path to .../dataset/sequences")
@click.option("--voxel_size", "-v", type=float, default=0.1)
@click.option("--seqs", "-s", type=str, default=",".join(SEQS))
def main(path, voxel_size, seqs):
    for seq in seqs.split(","):
        seq_dir = os.path.join(path, seq)
        print(f"building map for sequence {seq}")
        m = build_map(seq_dir, voxel_size)
        np.save(os.path.join(seq_dir, "map_clean.npy"), m)
        print(f"saved {len(m)} points")


if __name__ == "__main__":
    main()
