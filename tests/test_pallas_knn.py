"""Exact-equivalence of the fused Pallas 1-NN match (ops/pallas_knn.py)
against the XLA path (ops/knn.nn_match_idx), interpret mode on CPU.

The op replaces the reference's PyKeOps argKmin(1) conditioning match
(/root/reference/lidiff/models/minkunet.py:403-418)."""

import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops.knn import nn_match_idx
from lidiff_tpu.ops.pallas_knn import nn_match_idx_pallas


def _mk(rng, vq, vr, b=2, lim=600):
    qc = np.concatenate([
        rng.integers(0, b, (vq, 1)), rng.integers(-lim, lim, (vq, 3))],
        1).astype(np.int32)
    rc = np.concatenate([
        rng.integers(0, b, (vr, 1)), rng.integers(-lim, lim, (vr, 3))],
        1).astype(np.int32)
    qm = rng.random(vq) < 0.9
    rm = rng.random(vr) < 0.9
    return (jnp.asarray(qc), jnp.asarray(qm), jnp.asarray(rc),
            jnp.asarray(rm))


def test_matches_xla_exactly():
    rng = np.random.default_rng(0)
    qc, qm, rc, rm = _mk(rng, 3000, 700)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True)
    # compare only valid queries (invalid rows are unspecified)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_duplicate_coords_tie_break_first():
    """Exact ties must resolve to the FIRST reference index, like
    jnp.argmin in the XLA path (and torch/KeOps argKmin)."""
    rng = np.random.default_rng(1)
    qc, qm, rc, rm = _mk(rng, 512, 300, b=1, lim=5)   # dense ties
    rm = jnp.ones_like(rm)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_cross_batch_never_matches():
    rng = np.random.default_rng(2)
    qc, qm, rc, rm = _mk(rng, 600, 200, b=3)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True)
    g = np.asarray(got)
    qb = np.asarray(qc)[:, 0]
    rb = np.asarray(rc)[:, 0]
    v = np.asarray(qm)
    assert (rb[g[v]] == qb[v]).all()


def test_single_batch_static_path():
    """n_batch=1 statically removes the batch compare; results must still
    match the XLA path exactly."""
    rng = np.random.default_rng(3)
    qc, qm, rc, rm = _mk(rng, 2000, 500, b=1)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True, n_batch=1)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_multi_block_ties_keep_first():
    """Vr spanning several reference blocks: cross-block distance ties must
    keep the earliest block's index (argmin first-index semantics)."""
    rng = np.random.default_rng(4)
    qc, qm, rc, rm = _mk(rng, 700, 5000, b=1, lim=6)  # nr > 2, dense ties
    rm = jnp.ones_like(rm)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True, n_batch=1)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])
