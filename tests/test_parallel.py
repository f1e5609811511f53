"""Multi-device data parallelism on the virtual 8-device CPU mesh:
shard_map train step, sync batch norm, replica consistency."""

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


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
