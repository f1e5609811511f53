"""Device mesh + data-parallel training step.

The TPU-native replacement for the reference's DDP/NCCL stack
(/root/reference/lidiff/train.py:88-101): a 1-D `data` mesh; per-replica
batches; gradients averaged with `psum` over ICI inside `shard_map`; batch
norm runs cross-replica via the same axis (MinkowskiSyncBatchNorm parity,
train.py:90).  The model is small (~40M params) so parameters are fully
replicated — no tensor/pipeline sharding is needed for parity (SURVEY.md
§2.3); batched inference shards scans the same way.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Shard array leaves along their leading (batch) axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return {k: (jax.device_put(v, sh) if hasattr(v, "ndim") else v)
            for k, v in batch.items()}


def build_train_step(loss_fn: Callable, optimizer, mesh: Mesh,
                     donate: bool = True):
    """Data-parallel train step via shard_map.

    loss_fn(params, batch_stats, batch, rng) -> (loss, (new_bs, metrics)).
    The per-replica rng is folded from the step rng and the replica index so
    noise draws differ across shards.

    Returns step(params, opt_state, batch_stats, batch, rng) ->
      (params, opt_state, batch_stats, metrics), jitted over the mesh.
    """

    def replica_step(params, opt_state, batch_stats, batch, rng):
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, idx)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, metrics)), grads = grad_fn(params, batch_stats,
                                                   batch, rng)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        # batch stats computed with cross-replica moments are identical on
        # every replica already (psum inside masked BN); average defensively
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, new_bs, metrics

    step = jax.shard_map(
        replica_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


def build_sample_fn(task, mesh: Mesh, w_uncond: float | None = None,
                    solver=None):
    """Sharded multi-scan batched inference (BASELINE config #5).

    Parameters are replicated; scans shard along the batch axis, each
    replica running one independent full completion loop — the TPU-native
    upgrade of the reference's one-scan-at-a-time GPU loop
    (/root/reference/lidiff/tools/diff_completion_pipeline.py:196-212).

    The per-replica key folds in the replica index, so shard i's scan
    reproduces exactly what the single-device sampler produces for that
    scan with fold_in(key, i) (verified by tests/test_parallel.py).

    Returns fn(variables, x_init [B,N,3], part [B,Np,3], key) -> [B,N,3]
    with B a multiple of the mesh size (B // n_dev scans per replica; size
    static capacities for the per-replica batch).
    """

    def replica(variables, x_init, part, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return task.sample(variables, x_init, key, w_uncond=w_uncond,
                           solver=solver, part=part)

    fn = jax.shard_map(
        replica, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)
