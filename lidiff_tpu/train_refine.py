"""Refinement-network training CLI
(reference /root/reference/lidiff/train_refine.py)."""

from __future__ import annotations

import os
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.config import load_config, save_config
from lidiff_tpu.data.datasets import dataloaders_refine
from lidiff_tpu.models.refine import RefineTask
from lidiff_tpu.parallel import mesh as pmesh
from lidiff_tpu.training.trainer import CheckpointManager, Trainer


@click.command()
@click.option("--config", "-c", type=str,
              default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "config/config_refine.yaml"))
@click.option("--weights", "-w", type=str, default=None)
@click.option("--checkpoint", "-ckpt", type=str, default=None)
@click.option("--test", "-t", is_flag=True)
@click.option("--max_steps", type=int, default=None)
def main(config, weights, checkpoint, test, max_steps):
    np.random.seed(42)
    cfg = load_config(config)

    # reference semantics: train.n_gpus is the DDP world size (capped at
    # the devices present; see training/trainer.py)
    n_dev = min(int(cfg["train"].get("n_gpus", 1)), len(jax.devices()))
    axis = pmesh.DATA_AXIS if n_dev > 1 else None
    task = RefineTask(cfg, axis_name=axis)
    data = dataloaders_refine[cfg["data"]["dataloader"]](cfg)

    exp_dir = os.path.join("experiments", cfg["experiment"]["id"])
    os.makedirs(exp_dir, exist_ok=True)
    save_config(cfg, os.path.join(exp_dir, "hparams.yaml"))

    loader = data.train_dataloader()
    trainer = Trainer(task, cfg, exp_dir, steps_per_epoch=max(len(loader), 1))

    # RefineTask.init signature: (key, batch_size, n_points)
    def init_state(key):
        variables = task.init(key, batch_size=max(
            1, int(cfg["train"]["batch_size"]) // trainer.n_dev),
            n_points=int(cfg["data"]["num_points"]))
        params = variables["params"]
        state = {"params": params,
                 "batch_stats": variables.get("batch_stats", {}),
                 "opt_state": trainer.opt.init(params), "step": 0}
        return pmesh.replicate(trainer.mesh, state)

    key = jax.random.PRNGKey(42)
    state = init_state(key)

    src = checkpoint or weights
    if src:
        trainer.ckpt = CheckpointManager(os.path.join(src, "checkpoints"))
        state = trainer.maybe_restore(state)
        trainer.ckpt = CheckpointManager(
            os.path.join(exp_dir, "checkpoints"))
        if weights and not checkpoint:
            trainer.global_step = 0

    if test:
        print("TESTING MODE")
        run_test(task, cfg, state, data)
        return

    print(f"TRAINING MODE ({n_dev} devices)")
    latest = {"state": state}
    trainer.install_signal_checkpointing(lambda: latest["state"])
    step = trainer.global_step
    # sanity validation step before training (reference
    # train_refine.py:56-82: num_sanity_val_steps=1) — catches a broken
    # val path before hours of training, exactly Lightning's rationale
    try:
        run_validation(task, cfg, state, data, trainer, step,
                       max_batches=1, tag="sanity")
    except Exception as e:
        print(f"sanity validation failed: {e}")
    # epoch-aware resume (see train.py): mid-epoch signal checkpoints
    # record epoch=-1 and fall back to step arithmetic
    if checkpoint and trainer.last_epoch >= 0:
        start_epoch = trainer.last_epoch + 1
    else:
        start_epoch = step // max(trainer.steps_per_epoch, 1)
    for epoch in range(start_epoch, int(cfg["train"]["max_epoch"])):
        for batch in loader:
            key, k = jax.random.split(key)
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()
                     if k2 != "filename"}
            t0 = time.time()
            state, metrics = trainer.train_step(state, batch, k)
            latest["state"] = state
            step += 1
            if step % 10 == 0:
                m = {f"train/{k2}": float(v) for k2, v in metrics.items()}
                m["train/step_time"] = time.time() - t0
                trainer.logger.log(step, m)
                print(f"epoch {epoch} step {step} "
                      + " ".join(f"{k2}={v:.4f}" for k2, v in m.items()))
            if max_steps and step >= max_steps:
                break
        trainer.save(epoch, state)
        # val every 5 epochs on a few batches (reference
        # train_refine.py:56-82: check_val_every_n_epoch=5,
        # limit_val_batches=0.05)
        if (epoch + 1) % 5 == 0:
            try:
                run_validation(task, cfg, state, data, trainer, step)
            except Exception as e:
                print(f"validation failed: {e}")
        if max_steps and step >= max_steps:
            break
    trainer.logger.flush()


def run_validation(task, cfg, state, data, trainer, step,
                   max_batches: int | None = None, tag: str = "val"):
    """Refine validation (reference models_refine.py:78-103): forward the
    noisy val cloud, upsample with the predicted offsets, chamfer against
    GT; logged as val/cd_loss."""
    from lidiff_tpu.ops.chamfer import chamfer_distance
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    loader = data.val_dataloader()
    if max_batches is None:
        # limit_val_batches=0.05 of the split (>=1)
        max_batches = max(1, int(0.05 * len(loader)))
    fwd = jax.jit(lambda v, pts: task.forward(v, pts))
    losses = []
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        noisy = jnp.asarray(batch["pcd_noise"])
        up = task.upsample(noisy, fwd(variables, noisy))
        losses.append(float(chamfer_distance(
            up, jnp.asarray(batch["pcd_full"]))))
    if losses:
        cd = float(np.mean(losses))
        trainer.logger.log(step, {"val/cd_loss": cd})
        print(f"{tag}: cd_loss {cd:.5f} over {len(losses)} batches")


def run_test(task, cfg, state, data):
    from lidiff_tpu.ops.chamfer import chamfer_distance
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    fwd = jax.jit(lambda v, pts: task.forward(v, pts))
    losses = []
    for batch in data.test_dataloader():
        noisy = jnp.asarray(batch["pcd_noise"])
        offs = fwd(variables, noisy)
        up = task.upsample(noisy, offs)
        loss = float(chamfer_distance(up, jnp.asarray(batch["pcd_full"])))
        losses.append(loss)
        print(f"test cd_loss {loss:.5f}")
    print(f"mean test cd_loss {np.mean(losses):.5f}")


if __name__ == "__main__":
    main()
