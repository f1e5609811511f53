"""Training harness: optimizer, LR schedule, checkpointing, logging, DP mesh.

Replaces PyTorch Lightning (reference /root/reference/lidiff/train.py:76-121)
with a thin JAX loop: optax Adam + stepped exponential decay (ExponentialLR
gamma 0.5 every 5 epochs, models.py:337-346), orbax checkpoints (every
epoch, keep all — ModelCheckpoint(save_top_k=-1) parity, train.py:80-83),
tensorboardX metric logging, and `parallel.mesh` data parallelism with
cross-replica batch norm.
"""

from __future__ import annotations

import json
import os
import signal
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from lidiff_tpu.parallel import mesh as pmesh


def make_optimizer(lr: float, decay_every_epochs: int = 5,
                   gamma: float = 0.5, steps_per_epoch: int = 1):
    """Adam(0.9, 0.999) with lr * gamma^(epoch // decay_every) —
    the reference's ExponentialLR(0.5) at 5-epoch interval."""
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (gamma ** (epoch // decay_every_epochs))
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.scale_by_learning_rate(schedule),
    ), schedule


class CheckpointManager:
    """Orbax-backed checkpoint manager storing params / batch_stats /
    opt_state / step / hparams."""

    def __init__(self, ckpt_dir: str, keep: Optional[int] = None):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True)
        self.mgr = ocp.CheckpointManager(self.dir, options=opts)

    def save(self, step: int, state: dict, hparams: dict | None = None):
        payload = dict(state)
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        if hparams is not None:
            with open(os.path.join(self.dir, "hparams.json"), "w") as f:
                json.dump(_plain(hparams), f, indent=2)
        self.mgr.wait_until_finished()

    def restore(self, step: int | None = None, template: dict | None = None):
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        if template is not None:
            state = self.mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            state = self.mgr.restore(step)
        return state, step

    def load_hparams(self) -> dict | None:
        p = os.path.join(self.dir, "hparams.json")
        if os.path.isfile(p):
            return json.load(open(p))
        return None


def _plain(x):
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    return x


class MetricLogger:
    """TensorBoard metric writer (tensorboardX) with stdout fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        except Exception:
            self.writer = None
        self.log_dir = log_dir

    def log(self, step: int, metrics: dict):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, float(v), step)
        else:
            # the promised stdout fallback (metrics must never be
            # silently dropped when tensorboardX is absent)
            line = " ".join(f"{k}={float(v):.6g}"
                            for k, v in metrics.items())
            print(f"[metrics step {step}] {line}", flush=True)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()


class Trainer:
    """Generic DP training loop over a task exposing `loss_fn` and `init`.

    The task must be constructed with axis_name=pmesh.DATA_AXIS when
    n_devices > 1 so batch-norm moments sync across replicas.
    """

    def __init__(self, task, cfg, exp_dir: str, n_devices: int | None = None,
                 steps_per_epoch: int = 1):
        self.task = task
        self.cfg = cfg
        self.exp_dir = exp_dir
        self.steps_per_epoch = steps_per_epoch
        if n_devices is None:
            # reference semantics: train.n_gpus is the DDP world size
            # (reference train.py:88-101); default to it rather than
            # grabbing every local device (an 8-device host with
            # batch_size=1 and n_gpus=1 must not shard the batch 8 ways)
            n_devices = min(int(cfg["train"].get("n_gpus", 1)),
                            len(jax.devices()))
        self.mesh = pmesh.make_mesh(n_devices)
        self.n_dev = self.mesh.devices.size
        self.opt, self.schedule = make_optimizer(
            float(cfg["train"]["lr"]), steps_per_epoch=steps_per_epoch)
        self.ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
        self.logger = MetricLogger(os.path.join(exp_dir, "tb"))
        self.step_fn = pmesh.build_train_step(task.loss_fn, self.opt,
                                              self.mesh)
        self.global_step = 0
        self.last_epoch = -1   # epoch of the restored checkpoint, if any

    def init_state(self, key, batch_size: int, n_full: int, n_part: int):
        variables = self.task.init(key, batch_size=max(1, batch_size //
                                                       self.n_dev),
                                   n_full=n_full, n_part=n_part)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.opt.init(params)
        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state, "step": 0}
        return pmesh.replicate(self.mesh, state)

    def maybe_restore(self, state: dict):
        try:    # checkpoints written since the epoch field was added
            restored, step = self.ckpt.restore(
                template={**state, "epoch": 0})
        except Exception:   # older checkpoints: no epoch in the payload
            restored, step = self.ckpt.restore(template=state)
        if restored is not None:
            self.global_step = int(restored.get("step", step or 0))
            self.last_epoch = int(restored.get("epoch", -1))
            restored = {k: v for k, v in restored.items() if k != "epoch"}
            return pmesh.replicate(self.mesh, restored)
        return state

    def train_step(self, state: dict, batch: dict, rng):
        batch = pmesh.shard_batch(self.mesh, batch)
        params, opt_state, bs, metrics = self.step_fn(
            state["params"], state["opt_state"], state["batch_stats"],
            batch, rng)
        self.global_step += 1
        state = {"params": params, "batch_stats": bs,
                 "opt_state": opt_state, "step": self.global_step}
        return state, metrics

    def save(self, epoch: int, state: dict):
        """Checkpoint keyed by global step (unique even for mid-epoch
        signal saves), with the epoch recorded in the payload — reference
        checkpoints are named by epoch (train.py:80-83) and resume is
        epoch-aware."""
        self.ckpt.save(self.global_step,
                       {**state, "step": self.global_step,
                        "epoch": int(epoch)},
                       hparams=self.cfg)

    def install_signal_checkpointing(self, get_state):
        """Failure handling: checkpoint on SIGTERM/SIGINT before exiting
        (the reference only offers crash-and-resume via Lightning,
        SURVEY.md §5). `get_state` returns the latest state dict."""

        def handler(signum, frame):
            try:
                state = get_state()
                if state is not None:
                    self.save(-1, state)
                    print(f"checkpoint saved on signal {signum}")
            finally:
                signal.default_int_handler(signum, frame) \
                    if signum == signal.SIGINT else os._exit(1)

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)
