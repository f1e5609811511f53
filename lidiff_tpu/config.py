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


def derive_capacities(num_points: int, shrink: float = 2.0,
                      num_levels: int = 5) -> list[int]:
    """Static voxel capacities per pyramid level.

    Level 0 can never exceed the point count; deeper levels shrink
    conservatively (real LiDAR surfaces shrink ~3-4x per stride doubling;
    we default to 2x with a floor)."""
    caps = []
    c = float(num_points)
    for _ in range(num_levels):
        caps.append(_round8(max(int(c), 1024)))
        c = c / shrink
    return caps


DEFAULT_TPU = {
    "full_capacities": None,     # derived from data.num_points if None
    "part_capacities": None,     # derived from data.num_points / 10
    "capacity_shrink": 2.0,
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
            n, tpu["capacity_shrink"], tpu["num_levels"])
    if tpu["part_capacities"] is None:
        tpu["part_capacities"] = derive_capacities(
            max(n // 10, 1024), tpu["capacity_shrink"], tpu["num_levels"])
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
