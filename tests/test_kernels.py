"""SPH kernel function tests: support, normalization integrals, derivatives."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.ops import kernels as K


SMOOTHING = ["poly6", "wendlandC2", "wendlandC4"]


@pytest.mark.parametrize("name", SMOOTHING)
@pytest.mark.parametrize("dim", [2, 3])
def test_smoothing_kernel_integrates_to_one(name, dim):
    """sigma * integral of W over R^dim == 1 (defining property of SPH kernels)."""
    h = 0.3
    kern = K.get_smoothing_kernel(name)
    # Midpoint quadrature on a grid covering the support.
    m = 81
    axes = [np.linspace(-h, h, m) for _ in range(dim)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, dim)
    d2 = jnp.asarray(np.sum(grid**2, axis=-1))
    cell = (2 * h / (m - 1)) ** dim
    total = kern.norm(h, dim) * float(jnp.sum(kern.w(d2, h))) * cell
    assert abs(total - 1.0) < 2e-2


@pytest.mark.parametrize("name", SMOOTHING)
def test_smoothing_kernel_compact_support(name):
    kern = K.get_smoothing_kernel(name)
    h = 0.1
    d2 = jnp.asarray([h * h, (1.5 * h) ** 2, (10 * h) ** 2])
    assert np.allclose(np.asarray(kern.w(d2, h)), 0.0)


def test_poly6_values_match_reference_formula():
    """W = max(h^2-d^2,0)^3 (kernels_impl.py:33-40), norm2d = 4/(pi h^8)."""
    h = 0.1
    d = 0.05
    w = float(K.poly6_w(jnp.asarray(d * d), h))
    assert np.isclose(w, (h * h - d * d) ** 3)
    assert np.isclose(K.poly6_norm(h, 2), 4.0 / (np.pi * h**8))
    assert np.isclose(K.poly6_norm(h, 3), 315.0 / (64.0 * np.pi * h**9))


def test_spiky_grad_matches_reference_formula():
    """gk = 3 (h-d)^2 r/d for 0<d<h (kernels_impl.py:143-156)."""
    h = 0.1
    r = jnp.asarray([0.03, -0.04])  # d = 0.05
    d = 0.05
    gk = np.asarray(K.spiky_grad(r, h))
    expected = 3.0 * (h - d) ** 2 / d * np.asarray(r)
    assert np.allclose(gk, expected, rtol=1e-5)
    # Zero at origin and outside support
    assert np.allclose(np.asarray(K.spiky_grad(jnp.zeros(2), h)), 0.0)
    assert np.allclose(np.asarray(K.spiky_grad(jnp.asarray([h, h]), h)), 0.0)
    assert np.isclose(K.spiky_norm(h, 2), 10.0 / (np.pi * h**5))
    assert np.isclose(K.spiky_norm(h, 3), 15.0 / (np.pi * h**6))


def test_spiky_is_minus_grad_of_spiky_w():
    """gk(r) == -grad_r (h-|r|)^3, the spiky kernel (sign convention check)."""
    h = 0.1

    def spiky_w(r):
        d = jnp.linalg.norm(r)
        return jnp.maximum(h - d, 0.0) ** 3

    r = jnp.asarray([0.03, -0.02])
    autodiff = -jax.grad(spiky_w)(r)
    ours = K.spiky_grad(r, h)
    assert np.allclose(np.asarray(ours), np.asarray(autodiff), rtol=1e-4)


@pytest.mark.parametrize("name", SMOOTHING)
def test_smoothing_kernels_differentiable_everywhere(name):
    """grad through W must be finite even at d=0 and d>=h (used in vjps)."""
    kern = K.get_smoothing_kernel(name)
    h = 0.1

    def f(r):
        return kern.w(jnp.sum(r * r), h)

    for r in [jnp.zeros(2), jnp.asarray([0.05, 0.0]), jnp.asarray([0.2, 0.2])]:
        g = np.asarray(jax.grad(f)(r))
        assert np.all(np.isfinite(g))


def test_spiky_grad_differentiable_everywhere():
    h = 0.1

    def f(r):
        return jnp.sum(K.spiky_grad(r, h) ** 2)

    for r in [jnp.zeros(2), jnp.asarray([0.05, 0.0]), jnp.asarray([0.2, 0.2])]:
        g = np.asarray(jax.grad(f)(r))
        assert np.all(np.isfinite(g))


def test_unknown_kernel_raises():
    with pytest.raises(ValueError):
        K.get_smoothing_kernel("nope")
    with pytest.raises(ValueError):
        K.get_gradient_kernel("nope")
