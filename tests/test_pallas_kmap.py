"""Exact-equivalence of the Pallas kernel-map builder (ops/pallas_kmap.py)
against the search-based ops/grid.build_kmap3_columns, interpret mode.

The op builds the 27-tap neighbor map that drives every ks=3 sparse conv
(the coordinate-manager role of MinkowskiEngine in the reference,
/root/reference/lidiff/models/minkunet.py:13-76)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidiff_tpu.ops.grid import build_kmap3_columns, build_pyramid
from lidiff_tpu.ops.pallas_kmap import build_kmap3_columns_pallas


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 4, (2, 1200, 3)).astype(np.float32)
    caps = [1664, 1280, 896, 512, 384]
    return jax.jit(lambda p: build_pyramid(p, 0.2, caps, 5))(
        jnp.asarray(pts))


@pytest.mark.parametrize("lv", [0, pytest.param(1, marks=pytest.mark.slow),
                                pytest.param(2, marks=pytest.mark.slow),
                                pytest.param(3, marks=pytest.mark.slow), 4])
def test_matches_search_builder(pyramid, lv):
    g = pyramid.levels[lv].geom
    ref = build_kmap3_columns(g)
    got = build_kmap3_columns_pallas(g, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    # col_idx must agree wherever any tap hits (elsewhere it is never read
    # by the conv; the search builder leaves clamped lower bounds there)
    any_hit = np.asarray(ref.hit)[:, 0::3].any(axis=1)
    np.testing.assert_array_equal(np.asarray(got.col_idx)[any_hit],
                                  np.asarray(ref.col_idx)[any_hit])


def test_full_agreement_including_miss_rows(pyramid):
    """Even for all-miss rows the lower bound matches (both compute the
    same clamped lower bound), keeping the conv's monotone-window property
    intact."""
    g = pyramid.levels[0].geom
    ref = build_kmap3_columns(g)
    got = build_kmap3_columns_pallas(g, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.col_idx),
                                  np.asarray(ref.col_idx))
