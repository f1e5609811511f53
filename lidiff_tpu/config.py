"""Config loading with the reference YAML schema.

Same schema as /root/reference/lidiff/config/config.yaml and
config_refine.yaml (experiment/data/train/diff/model sections), plus a
TPU section for static capacities and mesh settings.  The reference loads
raw dicts via yaml.safe_load (train.py:43) with a TRAIN_DATABASE env
override (train.py:45-46); we keep both behaviors and add validation plus
derived defaults.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml


class Cfg(dict):
    """Dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Cfg(v) if isinstance(v, dict) and not isinstance(v, Cfg) else v

    def __setattr__(self, k, v):
        self[k] = v


def _round8(x: int) -> int:
    return max(8, (int(x) + 7) // 8 * 8)


# Measured per-level occupancy (unique voxels / num_points), worst case over
# the 50-step sampling trajectory on the reference demo scan
# (scripts/measure_occupancy.py; /root/reference/lidiff/Datasets/test/
# 000123.ply, crop+FPS+10x tile per diff_completion_pipeline.py:92-105):
#   noisy full cloud : [0.999, 0.990, 0.929, 0.641, 0.226]
#   clean partial    : [1.000, 1.000, 0.995, 0.712, 0.324]
# With ~1 m point-local noise at t~T, stride-2/4 levels barely merge voxels,
# so the old shrink-2.0 defaults silently dropped 50-80% of coarse voxels
# (spatially biased — the highest lexicographic keys go first).  Defaults
# below cover both regimes with margin.
DEFAULT_FRACTIONS = (1.0, 1.0, 1.0, 0.8, 0.4)


def derive_capacities(num_points: int, fractions=None,
                      num_levels: int = 5) -> list[int]:
    """Static voxel capacities per pyramid level, as measured-occupancy
    fractions of the point count (see DEFAULT_FRACTIONS)."""
    if fractions is None:
        fractions = DEFAULT_FRACTIONS
    fractions = list(fractions) + [fractions[-1]] * num_levels
    return [_round8(max(int(num_points * fractions[i]), 1024))
            for i in range(num_levels)]


DEFAULT_TPU = {
    "full_capacities": None,     # derived from data.num_points if None
    "part_capacities": None,     # derived from data.num_points / 10
    "capacity_fractions": None,  # per-level fractions of num_points
    "num_levels": 5,
    "knn_block": 2048,
    "compute_dtype": "float32",  # or "bfloat16" for the fast path
    "mesh_axis": "data",
    "remat": True,
}


def load_config(path: str) -> Cfg:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if os.environ.get("TRAIN_DATABASE"):
        cfg["data"]["data_dir"] = os.environ["TRAIN_DATABASE"]
    return finalize_config(cfg)


def finalize_config(cfg: dict) -> Cfg:
    cfg = dict(cfg)
    tpu = dict(DEFAULT_TPU)
    tpu.update(cfg.get("tpu", {}) or {})
    n = int(cfg["data"]["num_points"])
    if tpu["full_capacities"] is None:
        tpu["full_capacities"] = derive_capacities(
            n, tpu["capacity_fractions"], tpu["num_levels"])
    if tpu["part_capacities"] is None:
        tpu["part_capacities"] = derive_capacities(
            max(n // 10, 1024), tpu["capacity_fractions"],
            tpu["num_levels"])
    cfg["tpu"] = tpu
    return Cfg(cfg)


def save_config(cfg: dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_plain(cfg), f, sort_keys=False)


def _plain(x: Any):
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    return x
