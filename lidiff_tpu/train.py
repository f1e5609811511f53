"""Diffusion training CLI (reference /root/reference/lidiff/train.py).

Usage: python -m lidiff_tpu.train -c lidiff_tpu/config/config.yaml
       [-w weights_ckpt_dir] [-ckpt resume_dir] [-t]
"""

from __future__ import annotations

import os
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.config import finalize_config, load_config, save_config
from lidiff_tpu.data.datasets import dataloaders
from lidiff_tpu.models.diffusion import DiffusionTask
from lidiff_tpu.parallel import mesh as pmesh
from lidiff_tpu.training.trainer import CheckpointManager, Trainer
from lidiff_tpu.utils.metrics import ChamferDistance, PrecisionRecall


def set_deterministic(seed: int = 42):
    np.random.seed(seed)


@click.command()
@click.option("--config", "-c", type=str,
              default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "config/config.yaml"))
@click.option("--weights", "-w", type=str, default=None,
              help="checkpoint dir to load weights from (no resume)")
@click.option("--checkpoint", "-ckpt", type=str, default=None,
              help="experiment dir to resume training from")
@click.option("--test", "-t", is_flag=True)
@click.option("--max_steps", type=int, default=None,
              help="cap on total optimizer steps (smoke runs)")
def main(config, weights, checkpoint, test, max_steps):
    set_deterministic()
    cfg = load_config(config)

    if weights is not None and test:
        # graft inference params from the current config onto the ckpt
        # hparams (reference train.py:52-71; we fix its missing-key bug by
        # using .get with defaults)
        wc = CheckpointManager(os.path.join(weights, "checkpoints"))
        ckpt_cfg = wc.load_hparams() or dict(cfg)
        # ("train", "uncond_w") realizes the reference's INTENT: its graft
        # block sets uncond_min_w/uncond_max_w — keys absent from every
        # shipped config (the latent bug train.py:55-56) — while the
        # working guidance knob is uncond_w
        for sec, key in [("train", "num_workers"), ("train", "n_gpus"),
                         ("train", "batch_size"), ("train", "uncond_w"),
                         ("data", "num_points"),
                         ("data", "data_dir"), ("diff", "s_steps"),
                         ("experiment", "id")]:
            ckpt_cfg.setdefault(sec, {})[key] = cfg[sec][key]
        ckpt_cfg["data"].setdefault("dataset_norm", False)
        ckpt_cfg["data"].setdefault("std_axis_norm", False)
        ckpt_cfg["data"].setdefault("max_range", 50.0)
        cfg = finalize_config(ckpt_cfg)

    # reference semantics: train.n_gpus is the DDP world size
    # (reference train.py:88-101), capped at the devices present
    n_dev = min(int(cfg["train"].get("n_gpus", 1)), len(jax.devices()))
    axis = pmesh.DATA_AXIS if n_dev > 1 else None
    task = DiffusionTask(cfg, axis_name=axis)
    data = dataloaders[cfg["data"]["dataloader"]](cfg)

    exp_dir = os.path.join("experiments", cfg["experiment"]["id"])
    os.makedirs(exp_dir, exist_ok=True)
    save_config(cfg, os.path.join(exp_dir, "hparams.yaml"))

    loader = data.train_dataloader()
    trainer = Trainer(task, cfg, exp_dir, steps_per_epoch=max(len(loader), 1))

    B = int(cfg["train"]["batch_size"])
    N = int(cfg["data"]["num_points"])
    key = jax.random.PRNGKey(42)
    state = trainer.init_state(key, B, N, N // 10)

    src = checkpoint or weights
    if src:
        trainer.ckpt = CheckpointManager(os.path.join(src, "checkpoints"))
        state = trainer.maybe_restore(state)
        trainer.ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
        if weights and not checkpoint:
            trainer.global_step = 0          # weights-only load

    if test:
        print("TESTING MODE")
        run_test(task, cfg, state, data, exp_dir)
        return

    print(f"TRAINING MODE ({n_dev} devices)")
    latest = {"state": state}
    trainer.install_signal_checkpointing(lambda: latest["state"])
    step = trainer.global_step
    # resume at the epoch after the restored one (Lightning resumes at the
    # saved epoch; without this a run resumed at epoch 15/20 would train
    # 20 more epochs and misalign the LR-decay boundaries); mid-epoch
    # signal checkpoints record epoch=-1 and fall back to step arithmetic
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
                dropped = (m.get("train/overflow_vox", 0)
                           + m.get("train/overflow_window", 0))
                if dropped:
                    print(f"WARNING: step {step}: {int(dropped)} voxels/"
                          "conv taps dropped (capacity or DMA window "
                          "exceeded) — re-derive tpu.full_capacities / "
                          "part_capacities with scripts/measure_occupancy"
                          ".py for this dataset")
            if max_steps and step >= max_steps:
                break
        trainer.save(epoch, state)
        # val every 5 epochs on ~one batch (reference train.py:96-99:
        # check_val_every_n_epoch=5, limit_val_batches=0.001)
        if (epoch + 1) % 5 == 0:
            try:
                run_validation(task, cfg, state, data, trainer, step)
            except Exception as e:
                print(f"validation failed: {e}")
        if max_steps and step >= max_steps:
            break
    trainer.logger.flush()


def run_validation(task, cfg, state, data, trainer, step,
                   max_batches: int = 1):
    cd = ChamferDistance()
    pr = PrecisionRecall(float(cfg["data"]["resolution"]),
                         2 * float(cfg["data"]["resolution"]), 100)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    key = jax.random.PRNGKey(7)
    for i, batch in enumerate(data.val_dataloader()):
        if i >= max_batches:
            break
        part = jnp.asarray(batch["pcd_part"])
        x_init = jnp.tile(part, (1, 10, 1))
        key, k = jax.random.split(key)
        # chunked sampler: bounds device-call duration (long single
        # executions can trip backend watchdogs; see BENCH_NOTES.md)
        out = np.asarray(task.sample_chunked(variables, x_init, k, part))
        for b in range(out.shape[0]):
            cd.update(np.asarray(batch["pcd_full"][b]), out[b])
            pr.update(np.asarray(batch["pcd_full"][b]), out[b])
    cdm, cds = cd.compute()
    p, r, f = pr.compute_auc()
    trainer.logger.log(step, {"val/cd_mean": cdm, "val/cd_std": cds,
                              "val/precision": p, "val/recall": r,
                              "val/fscore": f})
    print(f"val: CD {cdm:.4f}+-{cds:.4f} P {p:.3f} R {r:.3f} F {f:.3f}")


def _test_output_paths(exp_dir: str, filenames) -> tuple[bool, list[str]]:
    """Reference valid_paths (models.py:264-276): one .ply per scan under
    <exp_dir>/generated_pcd/<seq>/, skipping a batch whose outputs all
    exist already."""
    out_paths, skip = [], []
    for fname in filenames:
        parts = fname.replace("\\", "/").split("/")
        seq = parts[-3] if len(parts) >= 3 else "seq"
        seq_dir = os.path.join(exp_dir, "generated_pcd", seq)
        os.makedirs(seq_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(fname))[0]
        p = os.path.join(seq_dir, f"{base}.ply")
        skip.append(os.path.isfile(p))
        out_paths.append(p)
    return bool(np.all(skip)), out_paths


def postprocess_test_pred(pred: np.ndarray, x_init: np.ndarray,
                          max_range: float) -> np.ndarray:
    """Reference test_step postprocess (models.py:303-310): range crop to
    max_range, then z-stat crop to (mean_z - 2*std_z, max_z) of the
    sampler's INIT cloud (the tiled partial) — removes the floating noise
    the diffusion leaves outside the scene's vertical support."""
    dist = np.sqrt(np.sum(pred ** 2, axis=-1))
    pred = pred[dist < max_range]
    zi = x_init[..., 2]
    max_z = float(zi.max())
    min_z = float(zi.mean() - 2.0 * zi.std())
    return pred[(pred[:, 2] < max_z) & (pred[:, 2] > min_z)]


def run_test(task, cfg, state, data, exp_dir: str = "experiments/test"):
    """Sampling evaluation over the validation split with the reference
    test protocol (models.py:278-335): per-scan postprocess (range +
    z-stat crop of the prediction), .ply dump of the cropped cloud under
    <exp_dir>/generated_pcd/<seq>/<scan>.ply (skipping scans already
    generated), then cumulative CD + PR-AUC vs the GT map crop."""
    from lidiff_tpu.utils.ply import write_ply
    cd = ChamferDistance()
    pr = PrecisionRecall(float(cfg["data"]["resolution"]),
                         2 * float(cfg["data"]["resolution"]), 100)
    max_range = float(cfg["data"]["max_range"])
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(data.val_dataloader()):
        fnames = batch.get("filename",
                           [f"unknown/seq/{i}_{b}.bin"
                            for b in range(len(batch["pcd_part"]))])
        skip, out_paths = _test_output_paths(exp_dir, fnames)
        if skip:
            print(f"Skipping generation from {out_paths[0]} "
                  f"to {out_paths[-1]}")
            continue
        part = jnp.asarray(batch["pcd_part"])
        x_init = jnp.tile(part, (1, 10, 1))
        key, k = jax.random.split(key)
        out = np.asarray(task.sample_chunked(variables, x_init, k, part))
        x_init_np = np.asarray(x_init)
        for b in range(out.shape[0]):
            pred = postprocess_test_pred(out[b], x_init_np[b], max_range)
            print(f"Saving {out_paths[b]}")
            write_ply(out_paths[b], pred)
            cd.update(np.asarray(batch["pcd_full"][b]), pred)
            pr.update(np.asarray(batch["pcd_full"][b]), pred)
        cdm, cds = cd.compute()
        p, r, f = pr.compute_auc()
        print(f"[{i}] CD {cdm:.4f}+-{cds:.4f} P {p:.3f} R {r:.3f} F {f:.3f}")


if __name__ == "__main__":
    main()
