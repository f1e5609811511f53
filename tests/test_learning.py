"""Learning-signal test: gradients through the whole sparse engine must be
USEFUL, not merely finite — training on a fixed tiny scene must drive the
diffusion loss down substantially (a masked-BN or kernel-map bug that only
degrades learning passes every shape/equivalence test but fails here).

Mirrors the reference training objective (models.py:180-217): predict the
per-point noise of q-sampled offsets around a fixed scene, conditioned on
its partial scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidiff_tpu.config import finalize_config
from lidiff_tpu.models.diffusion import DiffusionTask

pytestmark = pytest.mark.slow

B, NF, NP = 1, 256, 64


def _cfg():
    return finalize_config({
        "experiment": {"id": "overfit"},
        "data": {"data_dir": "", "resolution": 0.25, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [],
                 "test": [], "num_points": NF, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.0, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 2e-3,
                  "batch_size": B, "decay_lr": 1e-4, "up_factor": 2},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": 4,
                 "reg_weight": 0.0},
        "model": {"out_dim": 96, "cr": 0.5},
        "tpu": {"full_capacities": [320, 320, 320, 256, 256],
                "part_capacities": [96, 96, 96, 96, 96], "remat": False},
    })


def test_diffusion_overfits_tiny_scene():
    task = DiffusionTask(_cfg())
    rng = np.random.default_rng(3)
    # a fixed structured scene: two planes
    n2 = NF // 2
    xy = rng.uniform(-2, 2, (n2, 2))
    ground = np.concatenate([xy, np.full((n2, 1), -1.0)], 1)
    xz = rng.uniform(-2, 2, (n2, 2))
    wall = np.stack([xz[:, 0], np.full(n2, 1.0), xz[:, 1]], 1)
    full = np.concatenate([ground, wall]).astype(np.float32)[None]
    part = full[:, rng.choice(NF, NP, replace=False)]
    batch = {"pcd_full": jnp.asarray(full), "pcd_part": jnp.asarray(part)}

    variables = task.init(jax.random.PRNGKey(0), batch_size=B, n_full=NF,
                          n_part=NP)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, key):
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True)(params, stats, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(250):
        key, k = jax.random.split(key)
        params, stats, opt_state, loss = step(params, stats, opt_state, k)
        losses.append(float(loss))
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    assert np.isfinite(losses).all()
    # the noise-prediction MSE starts near 1.0 (unit noise); learning the
    # scene's local structure must cut it decisively
    assert last < 0.5 * first, (first, last)

    # learning -> sampling loop closure (reference val-loop semantics,
    # /root/reference/lidiff/models/models.py:219-262): SAMPLING from the
    # overfit model must reconstruct the training scene decisively better
    # than sampling from untrained weights — catches solver/slice-back
    # regressions that leave the training loss intact
    from lidiff_tpu.utils.metrics import ChamferDistance
    x_init = jnp.tile(batch["pcd_part"], (1, NF // NP, 1))

    def chamfer_to_scene(vars_):
        out = np.asarray(task.sample_chunked(
            vars_, x_init, jax.random.PRNGKey(5),
            part=batch["pcd_part"]))[0]
        assert np.isfinite(out).all()
        cd = ChamferDistance()
        cd.update(full[0], out)
        return cd.compute()[0]

    cd_trained = chamfer_to_scene({"params": params, "batch_stats": stats})
    cd_untrained = chamfer_to_scene(variables)
    # measured on this seed: trained ~0.97, untrained ~4.98 — the factor-5
    # gap is the learning signal; the absolute bound catches both samplers
    # degrading together
    assert cd_trained < 0.6 * cd_untrained, (cd_trained, cd_untrained)
    assert cd_trained < 1.5, (cd_trained, cd_untrained)

    # int8 eval-conv quality (LIDIFF_CONV_QUANT=int8): the fake-quant
    # mirror runs the exact per-channel quantization formula of the Pallas
    # int8 kernel on the XLA path, so sampling quality of the quantized
    # deployment point is measurable here — on a TRAINED model, where
    # activation ranges are meaningful. Must stay near the full-precision
    # CD, not merely beat the untrained baseline.
    from lidiff_tpu.ops import sparse_conv as sc
    sc.set_conv_quant(True)
    try:
        cd_quant = chamfer_to_scene({"params": params,
                                     "batch_stats": stats})
    finally:
        sc.set_conv_quant(False)
    # measured on this seed: quant CD within a few % of full precision
    assert cd_quant < 1.25 * cd_trained + 0.05, (cd_quant, cd_trained)
