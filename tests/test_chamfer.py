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


def test_grid_exact_indices_on_separated_clouds():
    """With target spacing >> 2*sqrt(3)*res the quantized argmin cannot
    flip: grid indices == exact indices."""
    from lidiff_tpu.ops.chamfer import nn_indices_grid
    rng = np.random.default_rng(5)
    # targets on a coarse lattice (0.5 m), queries jittered off them
    t = (rng.integers(-40, 40, size=(200, 3)) * 0.5).astype(np.float32)
    t = np.unique(t, axis=0)
    q = (t[rng.integers(0, len(t), 300)] +
         rng.normal(scale=0.05, size=(300, 3))).astype(np.float32)
    idx = np.asarray(nn_indices_grid(jnp.asarray(q), jnp.asarray(t)))
    d = ((q[:, None] - t[None]) ** 2).sum(-1)
    ref = d.argmin(1)
    np.testing.assert_array_equal(idx, ref)


def test_grid_matches_exact_loss():
    """Realistic-scale dense clouds: grid chamfer within 1e-3 relative of
    the exact loss, and its gradient still points downhill."""
    rng = np.random.default_rng(6)
    B = 2
    az = rng.uniform(0, 2 * np.pi, (B, 2000))
    r = rng.uniform(3, 45, (B, 2000))
    x = np.stack([r * np.cos(az), r * np.sin(az),
                  rng.uniform(-2, 2, (B, 2000))], -1).astype(np.float32)
    y = (x[:, rng.permutation(2000)[:1500]] +
         rng.normal(scale=0.3, size=(B, 1500, 3))).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    exact = float(chamfer_distance(xj, yj, method="exact"))
    grid = float(chamfer_distance(xj, yj, method="grid"))
    assert abs(grid - exact) <= max(1e-3 * exact, 1e-6), (grid, exact)
    g = jax.grad(lambda a: chamfer_distance(a, yj, method="grid"))(xj)
    assert np.isfinite(np.asarray(g)).all()
    l0 = grid
    l1 = float(chamfer_distance(xj - 0.02 * g, yj, method="grid"))
    assert l1 < l0


def test_grid_unit_scale_clouds():
    """ADVICE r4 (medium): dataset_norm / std_axis_norm configs feed
    unit-scale coordinates to the refine loss; the grid path's adaptive
    resolution must quantize them as finely (relative to extent) as
    metric clouds — an absolute 4 cm grid would be ~50x too coarse here
    and silently degrade the NN picks."""
    rng = np.random.default_rng(8)
    B = 1
    x = rng.normal(scale=0.3, size=(B, 1200, 3)).astype(np.float32)
    y = (x[:, rng.permutation(1200)[:900]] +
         rng.normal(scale=0.01, size=(B, 900, 3))).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    exact = float(chamfer_distance(xj, yj, method="exact"))
    grid = float(chamfer_distance(xj, yj, method="grid"))
    assert abs(grid - exact) <= max(1e-3 * exact, 1e-7), (grid, exact)
    g = jax.grad(lambda a: chamfer_distance(a, yj, method="grid"))(xj)
    assert np.isfinite(np.asarray(g)).all()
    l1 = float(chamfer_distance(xj - 0.02 * g, yj, method="grid"))
    assert l1 < grid


def test_grid_masked_and_batched():
    """Masks drop points from both sides; batches never cross-match.
    Clouds live on a coarse lattice so the adaptive grid (finer than the
    0.5 m spacing by orders of magnitude) cannot flip any argmin and the
    result is EXACTLY the masked exact loss."""
    rng = np.random.default_rng(7)
    y = (rng.integers(-30, 30, size=(2, 48, 3)) * 0.5).astype(np.float32)
    x = (y[:, rng.integers(0, 48, 64)] +
         rng.normal(scale=0.04, size=(2, 64, 3))).astype(np.float32)
    mx = np.zeros((2, 64), bool); mx[:, :40] = True
    my = np.zeros((2, 48), bool); my[:, :30] = True
    got = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(mx), jnp.asarray(my),
                                 method="grid"))
    ref = np.mean([_np_chamfer(x[b, :40], y[b, :30]) for b in range(2)])
    np.testing.assert_allclose(got, ref, rtol=1e-4)
