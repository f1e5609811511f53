"""Trainer integration: a few real optimizer steps on the synthetic KITTI
tree through the Trainer + mesh path, checkpoint save/restore roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.config import finalize_config
from lidiff_tpu.data.datasets import dataloaders
from lidiff_tpu.models.diffusion import DiffusionTask
from lidiff_tpu.parallel import mesh as pmesh
from lidiff_tpu.training.trainer import Trainer
from tests.helpers import make_kitti_tree

pytestmark = pytest.mark.slow

NF = 512


def _cfg(data_dir):
    return finalize_config({
        "experiment": {"id": "train_smoke"},
        "data": {"data_dir": data_dir, "resolution": 0.1,
                 "dataloader": "KITTI", "split": "train", "train": ["00"],
                 "validation": ["00"], "test": [], "num_points": NF,
                 "max_range": 50.0, "dataset_norm": False,
                 "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 1, "max_epoch": 1, "lr": 1e-3,
                  "batch_size": 2, "decay_lr": 1e-4, "up_factor": 2},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 50, "s_steps": 2,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
        "tpu": {"full_capacities": [NF, 256, 256, 256, 256],
                "part_capacities": [64, 64, 64, 64, 64]},
    })


def test_trainer_steps_and_checkpoint(tmp_path):
    root = str(tmp_path / "kitti")
    make_kitti_tree(root, "00", n_scans=4, n_points=1500)
    cfg = _cfg(root)
    # 2-device DP with sync BN
    task = DiffusionTask(cfg, axis_name=pmesh.DATA_AXIS)
    data = dataloaders["KITTI"](cfg)
    exp = str(tmp_path / "exp")
    trainer = Trainer(task, cfg, exp, n_devices=2, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), 2, NF, NF // 10)

    key = jax.random.PRNGKey(1)
    losses = []
    for i, batch in enumerate(data.train_dataloader()):
        if i >= 2:
            break
        key, k = jax.random.split(key)
        batch = {k2: jnp.asarray(v) for k2, v in batch.items()
                 if k2 != "filename"}
        state, metrics = trainer.train_step(state, batch, k)
        losses.append(float(metrics["loss"]))
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)

    trainer.save(0, state)
    # the payload carries the epoch alongside the training state
    # (epoch-aware resume); the restore template must match it
    restored, step = trainer.ckpt.restore(
        template=jax.tree_util.tree_map(np.asarray, {**state, "epoch": 0}))
    assert restored is not None
    assert restored["epoch"] == 0
    p0 = jax.tree_util.tree_leaves(state["params"])[0]
    r0 = jax.tree_util.tree_leaves(restored["params"])[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(r0))
    h = trainer.ckpt.load_hparams()
    assert h["experiment"]["id"] == "train_smoke"


def test_lr_schedule():
    from lidiff_tpu.training.trainer import make_optimizer
    opt, sched = make_optimizer(1e-4, decay_every_epochs=5,
                                steps_per_epoch=10)
    assert sched(0) == pytest.approx(1e-4)
    assert sched(49) == pytest.approx(1e-4)      # epoch 4
    assert sched(50) == pytest.approx(5e-5)      # epoch 5
    assert sched(100) == pytest.approx(2.5e-5)   # epoch 10
