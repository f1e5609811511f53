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


def _lexsort(c):
    return c[np.lexsort((c[:, 3], c[:, 2], c[:, 1], c[:, 0]))]


def _mk_sorted(rng, vq, vr, b=1, lim=1000, r_valid=1.0):
    """Production-like inputs: lex-sorted coords over the real crop range,
    so the block-pruning prolog actually prunes (unsorted inputs keep it
    correct but toothless)."""
    qc = _lexsort(np.concatenate(
        [rng.integers(0, b, (vq, 1)), rng.integers(-lim, lim, (vq, 3))],
        1).astype(np.int32))
    rc = _lexsort(np.concatenate(
        [rng.integers(0, b, (vr, 1)), rng.integers(-lim, lim, (vr, 3))],
        1).astype(np.int32))
    qm = jnp.asarray(rng.random(vq) < 0.95)
    rm = jnp.asarray(rng.random(vr) < r_valid)
    return jnp.asarray(qc), qm, jnp.asarray(rc), rm


def test_pruned_sorted_exact():
    """Sorted full-range inputs (nr>=3 turns block pruning on): results
    must stay bit-identical to the XLA argmin."""
    rng = np.random.default_rng(5)
    qc, qm, rc, rm = _mk_sorted(rng, 4000, 8000, lim=1000)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True, n_batch=1)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_pruned_sorted_multibatch_exact():
    """Batched + sorted: cross-batch blocks auto-prune via the packed-key
    gap; per-query results still match XLA exactly."""
    rng = np.random.default_rng(6)
    qc, qm, rc, rm = _mk_sorted(rng, 3000, 8000, b=2, lim=900,
                                r_valid=0.9)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_exact_at_coord_lim_bound():
    """Coordinates at +-(COORD_LIM-1) — the widest range the f32-exact
    packed argmin supports, and the bound ops/chamfer's grid path clamps
    to.  Regression: at |c| ~ 2000 (a 2.5 cm chamfer grid over 50 m) the
    packed e goes negative and the kernel returned corrupt indices."""
    from lidiff_tpu.ops.pallas_knn import COORD_LIM
    rng = np.random.default_rng(8)
    qc, qm, rc, rm = _mk_sorted(rng, 3000, 9000, lim=COORD_LIM - 1)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True, n_batch=1)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_compact_grid_exact():
    """Compact (nq, maxb) survivor-interval grid (the chamfer-scale path,
    nr > COMPACT_MIN_NR in production; forced here via the test knobs):
    bit-identical to the XLA argmin. maxb=nr guarantees the compact
    branch itself runs (cnt <= nr always)."""
    rng = np.random.default_rng(9)
    qc, qm, rc, rm = _mk_sorted(rng, 4000, 9000, lim=1000)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True, n_batch=1,
                              compact_min_nr=2, maxb=5)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_compact_overflow_falls_back_exact():
    """maxb=1 makes survivor intervals overflow the compact budget: the
    traced lax.cond must route to the full bit-masked grid and stay
    exact."""
    rng = np.random.default_rng(10)
    qc, qm, rc, rm = _mk_sorted(rng, 3000, 9000, b=2, lim=900, r_valid=0.9)
    ref = nn_match_idx(qc, qm, rc, rm)
    got = nn_match_idx_pallas(qc, qm, rc, rm, interpret=True,
                              compact_min_nr=2, maxb=1)
    v = np.asarray(qm)
    np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(ref)[v])


def test_compact_clustered_slabs_exact():
    """Clustered ref slabs (non-trivial survivor intervals spanning empty
    gaps) through the compact grid: never drops a true argmin."""
    rng = np.random.default_rng(11)
    slabs = []
    for x0 in (-900, -300, 500, 950):
        n = 2200
        c = np.stack([np.full(n, 0), rng.integers(x0, x0 + 40, n),
                      rng.integers(-200, 200, n),
                      rng.integers(-30, 30, n)], 1).astype(np.int32)
        slabs.append(c)
    rc = _lexsort(np.concatenate(slabs))
    qc = _lexsort(np.concatenate(
        [np.zeros((2000, 1)), rng.integers(-1000, 1000, (2000, 3))],
        1).astype(np.int32))
    qm = jnp.ones((len(qc),), bool)
    rm = jnp.ones((len(rc),), bool)
    ref = nn_match_idx(jnp.asarray(qc), qm, jnp.asarray(rc), rm)
    got = nn_match_idx_pallas(jnp.asarray(qc), qm, jnp.asarray(rc), rm,
                              interpret=True, n_batch=1,
                              compact_min_nr=2, maxb=5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pruned_clustered_far_queries():
    """Queries far from every ref (big upper bounds -> little pruning) and
    refs clustered in distant slabs (big gaps -> heavy pruning), together:
    the prune decision must never drop a true argmin."""
    rng = np.random.default_rng(7)
    slabs = []
    for x0 in (-900, -300, 500, 950):
        n = 2000
        c = np.stack([np.full(n, 0), rng.integers(x0, x0 + 40, n),
                      rng.integers(-200, 200, n),
                      rng.integers(-30, 30, n)], 1).astype(np.int32)
        slabs.append(c)
    rc = _lexsort(np.concatenate(slabs))
    qc = _lexsort(np.concatenate(
        [np.zeros((2000, 1)), rng.integers(-1000, 1000, (2000, 3))],
        1).astype(np.int32))
    qm = jnp.ones((len(qc),), bool)
    rm = jnp.ones((len(rc),), bool)
    ref = nn_match_idx(jnp.asarray(qc), qm, jnp.asarray(rc), rm)
    got = nn_match_idx_pallas(jnp.asarray(qc), qm, jnp.asarray(rc), rm,
                              interpret=True, n_batch=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
