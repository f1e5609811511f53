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
    """Round capacities up to a multiple of 128: the Pallas conv /
    kernel-map tiles are 128 rows, so 128-aligned capacities make every
    padded shape equal the true shape (no per-call pad copies)."""
    return max(128, (int(x) + 127) // 128 * 128)


# Measured per-level occupancy (unique voxels / num_points), worst case over
# the 50-step sampling trajectory on the reference demo scan
# (scripts/measure_occupancy.py; /root/reference/lidiff/Datasets/test/
# 000123.ply, crop+FPS+10x tile per diff_completion_pipeline.py:92-105):
#   noisy full cloud : [0.999, 0.990, 0.929, 0.641, 0.226]   (180k points)
#   clean partial    : [1.000, 1.000, 0.995, 0.712, 0.324]
# With ~1 m point-local noise at t~T, stride-2/4 levels barely merge voxels,
# so the old shrink-2.0 defaults silently dropped 50-80% of coarse voxels
# (spatially biased — the highest lexicographic keys go first).
#
# Coarse-level fractions are SCALE-DEPENDENT: fewer points over the same
# 50 m crop merge even less. Tables are the WORST CASE over three scene
# families x three point counts (real demo scan 000123.ply, a synthetic
# dense urban canyon, a synthetic sparse ring road — run
# `python scripts/measure_occupancy.py --scene all --summary`), plus
# margin:
#   N=20k : full worst [1, 1, .996, .966, .772]
#   N=60k : full worst [1, .998, .982, .876, .508]
#   N=180k: full worst [.999, .991, .939, .699, .309]
_FRACTION_TABLE = (
    # below the measured range (20k) voxels barely merge at ANY level —
    # seen: L4 overflow on a 3k-point smoke at the 0.85 row
    (20_000, (1.0, 1.0, 1.0, 1.0, 1.0)),
    (50_000, (1.0, 1.0, 1.0, 1.0, 0.85)),
    (120_000, (1.0, 1.0, 1.0, 0.95, 0.6)),
    (10 ** 12, (1.0, 1.0, 1.0, 0.8, 0.4)),
)
DEFAULT_FRACTIONS = _FRACTION_TABLE[-1][1]

# The partial scan is CLEAN (never noised: it conditions the diffusion,
# reference models.py:192-200), so its coarse levels merge more than the
# noisy full cloud's — but the effect is scale- and scene-dependent too
# (small partial banks barely merge at all; dense urban scenes merge less
# than the demo scan). Worst case measured over the same sweep (keyed by
# the PARTIAL point count = num_points/10):
#   n_part=2k : part worst [1, 1, 1, 1, 1]
#   n_part=6k : part worst [1, 1, 1, 1, .79]
#   n_part=18k: part worst [1, 1, .995, .762, .541]
# Its bank size directly scales the per-stage 1-NN match cost
# (ops/knn.py), so the large-scan caps stay as tight as the data allows.
_PART_FRACTION_TABLE = (
    (5_000, (1.0, 1.0, 1.0, 1.0, 1.0)),
    (12_000, (1.0, 1.0, 1.0, 1.0, 0.9)),
    (10 ** 12, (1.0, 1.0, 1.0, 0.85, 0.62)),
)


def derive_capacities(num_points: int, fractions=None,
                      num_levels: int = 5, clean: bool = False) -> list[int]:
    """Static voxel capacities per pyramid level, as measured-occupancy
    fractions of the point count (see _FRACTION_TABLE; `clean` selects the
    un-noised partial-scan table)."""
    if fractions is None:
        table = _PART_FRACTION_TABLE if clean else _FRACTION_TABLE
        fractions = next(f for lim, f in table if num_points <= lim)
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
            tpu["num_levels"], clean=True)
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
