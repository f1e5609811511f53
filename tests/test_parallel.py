"""Multi-device data parallelism on the virtual 8-device CPU mesh:
shard_map train step, sync batch norm, replica consistency."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_masked_bn_syncs_across_replicas():
    from lidiff_tpu.ops.sparse_conv import masked_moments
    mesh = pmesh.make_mesh(4)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(2, 3, (4, 32, 5)).astype(np.float32))
    mask = jnp.asarray(rng.random((4, 32)) > 0.3)

    def f(fe, ma):
        m, v, c = masked_moments(fe[0], ma[0], axis_name=pmesh.DATA_AXIS)
        return m[None], v[None]

    m, v = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec("data"),
                  jax.sharding.PartitionSpec("data")),
        out_specs=(jax.sharding.PartitionSpec("data"),
                   jax.sharding.PartitionSpec("data"))))(feats, mask)
    # every replica must hold the GLOBAL moments
    fm = np.asarray(feats).reshape(-1, 5)
    mm = np.asarray(mask).reshape(-1)
    ref_mean = fm[mm].mean(0)
    ref_var = fm[mm].var(0)
    for r in range(4):
        np.testing.assert_allclose(np.asarray(m[r]), ref_mean, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(v[r]), ref_var, rtol=1e-3)


def test_sharded_batched_inference_matches_single_device():
    """The shard_map'd multi-scan sampler (BASELINE config #5) must give,
    per scan, exactly the single-device sampler's output for that scan and
    per-replica key."""
    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.models.diffusion import DiffusionTask

    NF, NP, NDEV = 128, 32, 4
    cfg = finalize_config({
        "experiment": {"id": "shard-inf"},
        "data": {"data_dir": "", "resolution": 0.25, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [],
                 "test": [], "num_points": NF, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 2},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 100, "s_steps": 2,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96, "cr": 0.5},
        "tpu": {"full_capacities": [256, 256, 128, 128, 128],
                "part_capacities": [64, 64, 64, 64, 64], "remat": False},
    })
    task = DiffusionTask(cfg)
    variables = task.init(jax.random.PRNGKey(0), batch_size=1, n_full=NF,
                          n_part=NP)
    rng = np.random.default_rng(5)
    part = jnp.asarray(rng.normal(0, 3, (NDEV, NP, 3)).astype(np.float32))
    x_init = jnp.tile(part, (1, NF // NP, 1))
    key = jax.random.PRNGKey(9)

    mesh = pmesh.make_mesh(NDEV)
    fn = pmesh.build_sample_fn(task, mesh)
    out = np.asarray(fn(variables, x_init, part, key))
    assert out.shape == (NDEV, NF, 3)
    assert np.isfinite(out).all()

    for i in range(NDEV):
        ref = np.asarray(task.sample(
            variables, x_init[i:i + 1], jax.random.fold_in(key, i),
            part=part[i:i + 1]))
        np.testing.assert_allclose(out[i:i + 1], ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"scan {i}")


def test_graft_dryrun_multichip():
    """Exercise the driver's multichip dryrun in a FRESH subprocess — the
    same way the driver invokes it. In-process it is flaky: the converter
    tests load torch, whose bundled LLVM can segfault XLA:CPU's compile of
    the large 8-device program later in the same process (seen 2026-08-18
    on an avx512-partial host, both in backend_compile and in cache
    deserialize)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root      # drop .axon_site: CPU-only, no tunnel
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=root, env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])


def test_sharded_training_step_realistic_scale():
    """One full-width (cr=1.0) sharded training step at NF=4096 on a
    2-device mesh: catches mesh-scale layout/memory issues the toy dryrun
    (NF=192, cr=0.5) cannot — e.g. a sharding rule that only works because
    every tensor fits in one tile."""
    import optax

    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.models.diffusion import DiffusionTask

    NDEV, NF, NP = 2, 4096, 512
    B = NDEV
    cfg = finalize_config({
        "experiment": {"id": "shard-big"},
        "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [],
                 "test": [], "num_points": NF, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": NDEV,
                  "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": B, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": 8,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},            # full width (cr=1.0)
        "tpu": {"full_capacities": [4096, 4096, 3072, 1024, 512],
                "part_capacities": [512, 512, 512, 256, 128],
                "remat": True},
    })
    task = DiffusionTask(cfg, axis_name=pmesh.DATA_AXIS)
    task0 = DiffusionTask(cfg, axis_name=None)
    variables = task0.init(jax.random.PRNGKey(0), batch_size=1, n_full=NF,
                           n_part=NP)
    mesh = pmesh.make_mesh(NDEV)
    opt = optax.adam(1e-4)
    step = pmesh.build_train_step(task.loss_fn, opt, mesh, donate=False)
    params = pmesh.replicate(mesh, variables["params"])
    bs = pmesh.replicate(mesh, variables["batch_stats"])
    opt_state = pmesh.replicate(mesh, opt.init(variables["params"]))

    rng = np.random.default_rng(0)
    batch = pmesh.shard_batch(mesh, {
        "pcd_full": jnp.asarray(
            rng.normal(0, 10, (B, NF, 3)).astype(np.float32)),
        "pcd_part": jnp.asarray(
            rng.normal(0, 10, (B, NP, 3)).astype(np.float32)),
    })
    params, opt_state, bs, metrics = step(params, opt_state, bs, batch,
                                          jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
