"""Chamfer distance vs brute-force numpy; gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from lidiff_tpu.ops.chamfer import chamfer_distance, nn_indices


def _np_chamfer(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def test_nn_indices_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    t = rng.normal(size=(80, 3)).astype(np.float32)
    idx = np.asarray(nn_indices(jnp.asarray(q), jnp.asarray(t)))
    d = ((q[:, None] - t[None]) ** 2).sum(-1)
    ref = d.argmin(1)
    # distances must agree (indices may differ on exact ties)
    np.testing.assert_allclose(d[np.arange(100), idx],
                               d[np.arange(100), ref], rtol=1e-4, atol=1e-5)


def test_chamfer_matches_bruteforce():
    rng = np.random.default_rng(1)
    B = 2
    x = rng.normal(size=(B, 96, 3)).astype(np.float32)
    y = rng.normal(size=(B, 64, 3)).astype(np.float32)
    cd = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    ref = np.mean([_np_chamfer(x[b], y[b]) for b in range(B)])
    np.testing.assert_allclose(cd, ref, rtol=1e-4)


def test_chamfer_identical_clouds_zero():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 50, 3)).astype(np.float32)
    assert float(chamfer_distance(jnp.asarray(x), jnp.asarray(x))) < 1e-9


def test_chamfer_grad():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
    g = jax.grad(lambda a: chamfer_distance(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # moving x towards y must reduce the loss
    l0 = float(chamfer_distance(x, y))
    l1 = float(chamfer_distance(x - 0.01 * g, y))
    assert l1 < l0


def test_chamfer_masked():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 64, 3)).astype(np.float32)
    y = rng.normal(size=(1, 48, 3)).astype(np.float32)
    # mask half of x: equivalent to a smaller cloud
    mx = np.zeros((1, 64), bool); mx[:, :32] = True
    cd_masked = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(mx)))
    ref = _np_chamfer(x[0, :32], y[0])
    np.testing.assert_allclose(cd_masked, ref, rtol=1e-4)
