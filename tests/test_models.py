"""End-to-end model smoke tests on tiny shapes: init, forward shape,
training-loss gradients, short sampling loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.diffusion import DiffusionTask
from lidiff_tpu.models.refine import RefineTask

pytestmark = pytest.mark.slow

B, NF, NP = 2, 256, 64

CFG = {
    "experiment": {"id": "test"},
    "data": {"data_dir": "", "resolution": 0.25, "dataloader": "KITTI",
             "split": "train", "train": [], "validation": [], "test": [],
             "num_points": NF, "max_range": 50.0, "dataset_norm": False,
             "std_axis_norm": False},
    "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
              "num_workers": 0, "max_epoch": 1, "lr": 1e-4, "batch_size": B,
              "decay_lr": 1e-4, "up_factor": 2},
    "diff": {"beta_start": 3.5e-5, "beta_end": 0.007, "beta_func": "linear",
             "t_steps": 100, "s_steps": 2, "reg_weight": 5.0},
    "model": {"out_dim": 96},
    "tpu": {"full_capacities": [512, 512, 256, 256, 256],
            "part_capacities": [128, 128, 128, 128, 128]},
}


@pytest.fixture(scope="module")
def task():
    return DiffusionTask(finalize_config(CFG))


@pytest.fixture(scope="module")
def variables(task):
    return task.init(jax.random.PRNGKey(0), batch_size=B, n_full=NF,
                     n_part=NP)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pcd_full": jnp.asarray(rng.normal(0, 3, (B, NF, 3)).astype(np.float32)),
        "pcd_part": jnp.asarray(rng.normal(0, 3, (B, NP, 3)).astype(np.float32)),
    }


def test_init_param_shapes(task, variables):
    params = variables["params"]
    assert "partial_enc" in params and "denoiser" in params
    # denoiser head: Linear(96->20) -> Linear(20->3) (ref minkunet.py:376-380)
    head = params["denoiser"]["head"]
    assert head["Dense_0"]["kernel"].shape == (96, 20)
    assert head["Dense_1"]["kernel"].shape == (20, 3)
    # stage-4 channels 256
    assert "batch_stats" in variables


def test_forward_shape(task, variables):
    batch = _batch()
    pyr_f = task.pyramid_full(batch["pcd_full"])
    pyr_p = task.pyramid_part(batch["pcd_part"])
    t = jnp.zeros((B,), jnp.int32)
    out = task.model.apply(variables, pyr_f, pyr_p, t, False)
    assert out.shape == (B, NF, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_loss_and_grads(task, variables):
    batch = _batch(1)
    def loss(p):
        l, _ = task.loss_fn(p, variables["batch_stats"], batch,
                            jax.random.PRNGKey(1))
        return l
    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0


@pytest.mark.slow
def test_sample_loop_runs(task, variables):
    rng = np.random.default_rng(2)
    part = jnp.asarray(rng.normal(0, 3, (1, NP, 3)).astype(np.float32))
    x_init = jnp.tile(part, (1, NF // NP, 1))
    out = task.sample(variables, x_init, jax.random.PRNGKey(3), part=part)
    assert out.shape == (1, NF, 3)
    assert np.isfinite(np.asarray(out)).all()
    # sampled cloud must stay in the vicinity of the anchors
    assert float(jnp.abs(out - x_init).max()) < 50.0


@pytest.mark.slow
def test_chunked_sampler_matches_scan(task, variables):
    """Chunked sampling must reproduce the single-scan loop exactly (same
    RNG split sequence), for chunk sizes that divide and exceed s_steps."""
    rng = np.random.default_rng(11)
    part = jnp.asarray(rng.normal(0, 3, (1, NP, 3)).astype(np.float32))
    x_init = jnp.tile(part, (1, NF // NP, 1))
    key = jax.random.PRNGKey(5)
    ref = np.asarray(task.sample(variables, x_init, key, part=part))
    for chunk in [1, 2, 8]:
        out = np.asarray(task.sample_chunked(variables, x_init, key,
                                             part=part, chunk=chunk))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"chunk={chunk}")


@pytest.mark.slow
def test_chunked_sampler_cache_keyed_by_solver_value(task, variables):
    """The compiled-sampler cache must key on the solver's VALUE: two
    solvers with equal step counts but different schedules take different
    cache entries (a recycled `id()` must never resurrect a stale compiled
    closure), and a value-equal new instance reuses the cached one."""
    from lidiff_tpu.diffusion.dpm_solver import make_dpm_solver
    rng = np.random.default_rng(17)
    part = jnp.asarray(rng.normal(0, 3, (1, NP, 3)).astype(np.float32))
    x_init = jnp.tile(part, (1, NF // NP, 1))
    key = jax.random.PRNGKey(21)

    s_a = make_dpm_solver("linear", 100, 2, 3.5e-5, 0.007)
    s_b = make_dpm_solver("linear", 100, 2, 3.5e-5, 0.05)   # same S
    out_a = np.asarray(task.sample_chunked(variables, x_init, key,
                                           part=part, solver=s_a))
    out_b = np.asarray(task.sample_chunked(variables, x_init, key,
                                           part=part, solver=s_b))
    assert np.abs(out_a - out_b).max() > 1e-6, \
        "different schedules must not share a cached closure"
    del s_a
    # a fresh, value-equal solver must hit the same cache entry and
    # reproduce the first result exactly
    s_a2 = make_dpm_solver("linear", 100, 2, 3.5e-5, 0.007)
    n_entries = len(task._chunk_cache)
    out_a2 = np.asarray(task.sample_chunked(variables, x_init, key,
                                            part=part, solver=s_a2))
    assert len(task._chunk_cache) == n_entries
    np.testing.assert_array_equal(out_a, out_a2)


@pytest.mark.slow
def test_grouped_classfree_matches_two_passes(task, variables):
    """The fused cond/uncond grouped forward must reproduce two separate
    denoiser passes exactly (same params, same geometry, per-group GEMM
    contractions identical to the ungrouped op)."""
    from lidiff_tpu.models.diffusion import DiffusionModel
    rng = np.random.default_rng(13)
    batch = _batch(13)
    part = batch["pcd_part"]
    pyr_f = task.pyramid_full(batch["pcd_full"])
    pyr_c = task.pyramid_part(part)
    pyr_u = task.pyramid_part_tiny(jnp.zeros_like(part))
    feats_c = task.model.apply(variables, pyr_c, False,
                               method=DiffusionModel.encode_partial)
    feats_u = task.model.apply(variables, pyr_u, False,
                               method=DiffusionModel.encode_partial)
    geom_c = pyr_c.levels[-1].geom
    geom_u = pyr_u.levels[-1].geom
    t = jnp.full((B,), 37, jnp.int32)

    eps_c = task.model.apply(variables, pyr_f, feats_c, geom_c, t, False,
                             method=DiffusionModel.denoise)
    eps_u = task.model.apply(variables, pyr_f, feats_u, geom_u, t, False,
                             method=DiffusionModel.denoise)
    pair = task.model.apply(variables, pyr_f, (feats_c, feats_u),
                            (geom_c, geom_u), t, False,
                            method=DiffusionModel.denoise)
    assert pair.shape == (B, NF, 2, 3)
    np.testing.assert_allclose(np.asarray(pair[..., 0, :]),
                               np.asarray(eps_c), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pair[..., 1, :]),
                               np.asarray(eps_u), rtol=1e-6, atol=1e-6)


def test_bf16_compute_path_close_to_f32(task, variables):
    from lidiff_tpu.ops import sparse_conv as sc
    batch = _batch(7)
    pyr_f = task.pyramid_full(batch["pcd_full"])
    pyr_p = task.pyramid_part(batch["pcd_part"])
    t = jnp.zeros((B,), jnp.int32)
    ref = np.asarray(task.model.apply(variables, pyr_f, pyr_p, t, False))
    sc.set_compute_dtype("bfloat16")
    try:
        low = np.asarray(task.model.apply(variables, pyr_f, pyr_p, t, False))
    finally:
        sc.set_compute_dtype("float32")
    assert np.isfinite(low).all()
    # random-weight outputs are O(1); bf16 path must track f32 loosely
    err = np.abs(low - ref).mean() / (np.abs(ref).mean() + 1e-6)
    assert err < 0.15, err


def test_refine_task():
    cfg = dict(CFG)
    task = RefineTask(finalize_config(cfg))
    variables = task.init(jax.random.PRNGKey(4), batch_size=1, n_points=NF)
    rng = np.random.default_rng(5)
    batch = {
        "pcd_noise": jnp.asarray(rng.normal(0, 3, (1, NF, 3)).astype(np.float32)),
        "pcd_full": jnp.asarray(rng.normal(0, 3, (1, 2 * NF, 3)).astype(np.float32)),
    }
    def loss(p):
        l, _ = task.loss_fn(p, variables["batch_stats"], batch)
        return l
    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l)) and float(l) > 0
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert total > 0
    offs = task.forward(variables, batch["pcd_noise"])
    assert offs.shape == (1, NF, 2, 3)
    assert float(jnp.abs(offs).max()) <= 1.0   # Tanh head (ref :580-585)
