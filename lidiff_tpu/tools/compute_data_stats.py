"""Compute dataset normalization statistics.

Generates `utils/data_stats_range_{R}m.yml` consumed by the diffusion
dataset when `data.dataset_norm` is on (reference
SemanticKITTITemporal.py:38-48 reads mean_axis/std_axis/std keys; the
reference repo does not ship the file itself)."""

from __future__ import annotations

import os

import click
import numpy as np
import yaml

from lidiff_tpu.data import preprocess
from lidiff_tpu.utils.natsort import natsorted


@click.command()
@click.option("--path", "-p", type=str, required=True,
              help="path to .../dataset/sequences")
@click.option("--seqs", "-s", type=str,
              default="00,01,02,03,04,05,06,07,09,10")
@click.option("--max_range", "-m", type=float, default=50.0)
@click.option("--stride", type=int, default=10,
              help="use every Nth scan")
@click.option("--out", "-o", type=str, default=None)
def main(path, seqs, max_range, stride, out):
    n = 0
    s1 = np.zeros(3)
    s2 = np.zeros(3)
    for seq in seqs.split(","):
        vdir = os.path.join(path, seq, "velodyne")
        for fname in natsorted(os.listdir(vdir))[::stride]:
            p = preprocess.read_scan(os.path.join(vdir, fname))
            d = np.linalg.norm(p, axis=-1)
            p = p[(d < max_range) & (d > 3.5)]
            s1 += p.sum(0)
            s2 += (p ** 2).sum(0)
            n += len(p)
    mean = s1 / n
    var = s2 / n - mean ** 2
    std_axis = np.sqrt(np.maximum(var, 0))
    stats = {
        "mean_axis": {k: float(v) for k, v in zip("xyz", mean)},
        "std_axis": {k: float(v) for k, v in zip("xyz", std_axis)},
        "std": float(std_axis.mean()),
        "n_points": int(n),
        "max_range": float(max_range),
    }
    out = out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "utils",
        f"data_stats_range_{int(max_range)}m.yml")
    with open(out, "w") as f:
        yaml.safe_dump(stats, f)
    print(f"wrote {out}: {stats}")


if __name__ == "__main__":
    main()
