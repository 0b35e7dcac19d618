"""Geometry utils: grange layout, bilinear/trilinear sampling."""

import numpy as np
import jax.numpy as jnp

from sph_nca_tpu.utils.geometry import bilinear_sample, grange, trilinear_sample
from sph_nca_tpu.utils.seeds import add_radial_seed, radial_seed_weights


def test_grange_positions():
    """pos = gmin + gsize*(idx+0.5)/gshape (reference geometry.py:138-152)."""
    g = np.asarray(grange((4, 4), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])))
    assert g.shape == (4, 4, 2)
    assert np.allclose(g[0, 0], [-1 + 2 * 0.5 / 4, -1 + 2 * 0.5 / 4])
    assert np.allclose(g[3, 0], [-1 + 2 * 3.5 / 4, -1 + 2 * 0.5 / 4])
    # ij indexing: first axis varies x
    assert np.allclose(g[1, 0, 0] - g[0, 0, 0], 0.5)
    assert np.allclose(g[0, 1, 1] - g[0, 0, 1], 0.5)


def test_bilinear_sample_exact_at_grid_centers():
    m = 8
    img = jnp.asarray(np.random.default_rng(0).random((m, m, 3)).astype(np.float32))
    centers = grange((m, m), jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0]))
    p = centers.reshape(-1, 2)
    s = np.asarray(bilinear_sample(p, img, jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0])))
    assert np.allclose(s, np.asarray(img).reshape(-1, 3), atol=1e-6)


def test_bilinear_sample_interpolates_linear_function():
    """Sampling a grid of f(x,y)=2x+3y reproduces f in the interior."""
    m = 16
    centers = grange((m, m), jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0]))
    img = (2 * centers[..., 0] + 3 * centers[..., 1])[..., None]
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(0.1, 0.9, size=(50, 2)).astype(np.float32))
    s = np.asarray(bilinear_sample(p, img, jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0])))
    want = 2 * np.asarray(p)[:, 0] + 3 * np.asarray(p)[:, 1]
    assert np.allclose(s[:, 0], want, atol=1e-5)


def test_bilinear_sample_clamps_outside():
    img = jnp.ones((4, 4, 1))
    p = jnp.asarray([[-5.0, -5.0], [10.0, 10.0]])
    s = np.asarray(bilinear_sample(p, img, jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0])))
    assert np.all(np.isfinite(s))


def test_trilinear_sample_exact_at_centers():
    m = 4
    vol = jnp.asarray(np.random.default_rng(0).random((m, m, m, 2)).astype(np.float32))
    centers = grange((m, m, m), jnp.zeros(3), jnp.ones(3)).reshape(-1, 3)
    s = np.asarray(trilinear_sample(centers, vol, jnp.zeros(3), jnp.ones(3)))
    assert np.allclose(s, np.asarray(vol).reshape(-1, 2), atol=1e-6)


def test_radial_seed():
    """w = clamp(1 - d^2/R^2, 0, 1)^3 (reference nca.py:390-392)."""
    x = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [1.0, 0.0]])
    c = jnp.asarray([0.0, 0.0])
    w = np.asarray(radial_seed_weights(x, c, 0.2))
    assert np.isclose(w[0], 1.0)
    assert np.isclose(w[1], (1 - 0.01 / 0.04) ** 3)
    assert w[2] == 0.0
    A = add_radial_seed(x, jnp.zeros((3, 4)), c, 0.2)
    assert np.allclose(np.asarray(A), w[:, None] * np.ones((3, 4)))
