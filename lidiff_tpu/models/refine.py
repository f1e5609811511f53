"""Refinement task: regress `up_factor` sub-voxel offsets per point.

Re-design of `RefineDiffusion` (/root/reference/lidiff/models/
models_refine.py:18-139): a plain MinkUNet predicts 3*up_factor offsets per
point; the upsampled cloud (point + each offset) is trained with a Chamfer
loss against the dense ground truth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lidiff_tpu.models.minkunet import MinkUNet
from lidiff_tpu.ops.chamfer import chamfer_distance
from lidiff_tpu.ops.grid import build_pyramid


class RefineTask:
    def __init__(self, cfg, axis_name: Optional[str] = None):
        self.cfg = cfg
        self.up_factor = int(cfg["train"]["up_factor"])
        self.model = MinkUNet(out_channels=3 * self.up_factor,
                              axis_name=axis_name)
        self.resolution = float(cfg["data"]["resolution"])
        self.caps = list(cfg["tpu"]["full_capacities"])
        self.num_levels = int(cfg["tpu"]["num_levels"])

    def pyramid(self, points):
        return build_pyramid(points, self.resolution, self.caps,
                             self.num_levels)

    def init(self, key, batch_size: int = 1, n_points: int = 1024):
        # one jitted graph instead of hundreds of eager ops (remote-compile
        # cold start; see DiffusionTask.init)
        @jax.jit
        def _init(key):
            pts = jax.random.normal(key, (batch_size, n_points, 3))
            return self.model.init(key, self.pyramid(pts), False)

        return _init(key)

    def forward(self, variables, points, train: bool = False,
                mutable=False):
        """points: [B, N, 3] -> offsets [B, N, up_factor, 3]."""
        pyr = self.pyramid(points)
        out = self.model.apply(variables, pyr, train, mutable=mutable)
        if mutable:
            out, mut = out
            return out.reshape(points.shape[0], points.shape[1],
                               self.up_factor, 3), mut
        return out.reshape(points.shape[0], points.shape[1],
                           self.up_factor, 3)

    def upsample(self, points, offsets):
        """(reference models_refine.py:68-70) point + offset_k for each k."""
        up = points[:, :, None, :] + offsets
        return up.reshape(points.shape[0], -1, 3)

    def loss_fn(self, params, batch_stats, batch: dict, key=None):
        """Chamfer loss between the upsampled noisy cloud and the dense GT
        (models_refine.py:72)."""
        noisy = batch["pcd_noise"]
        gt = batch["pcd_full"]
        offsets, mut = self.forward({"params": params,
                                     "batch_stats": batch_stats},
                                    noisy, train=True,
                                    mutable=["batch_stats"])
        up = self.upsample(noisy, offsets)
        loss = chamfer_distance(up, gt)
        return loss, (mut["batch_stats"], {"cd_loss": loss})
