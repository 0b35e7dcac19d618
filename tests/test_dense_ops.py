"""Dense O(N^2) op tests: independent numpy oracle + SPH consistency properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from sph_nca_tpu.ops import dense


H = 0.25


def _numpy_oracle_volume(x, h):
    """Straight transcription of operators_batch.py:70-76 in numpy."""
    n, dim = x.shape
    norm = (
        4.0 / (np.pi * h**8) if dim == 2 else 315.0 / (64.0 * np.pi * h**9)
    )
    v = np.zeros(n)
    for i in range(n):
        acc = 0.0
        for j in range(n):
            d2 = np.sum((x[j] - x[i]) ** 2)
            acc += max(h * h - d2, 0.0) ** 3
        v[i] = 1.0 / (norm * acc)
    return v


def _numpy_oracle_gradient(x, v, A, h):
    """Straight transcription of operators_batch.py:222-229 in numpy."""
    n, dim = x.shape
    f = A.shape[-1]
    norm = 10.0 / (np.pi * h**5) if dim == 2 else 15.0 / (np.pi * h**6)
    ga = np.zeros((n, f, dim))
    for i in range(n):
        for j in range(n):
            r = x[j] - x[i]
            d = np.linalg.norm(r)
            if d <= 0.0 or d >= h:
                continue
            gk = 3.0 * (h - d) ** 2 / d * r
            ga[i] += (A[j] - A[i])[:, None] * gk[None, :] * v[j]
    return norm * ga


def _numpy_oracle_blur(x, v, A, h):
    """Straight transcription of operators_batch.py:661-667 in numpy."""
    n, dim = x.shape
    norm = (
        4.0 / (np.pi * h**8) if dim == 2 else 315.0 / (64.0 * np.pi * h**9)
    )
    sa = np.zeros_like(A)
    for i in range(n):
        for j in range(n):
            d2 = np.sum((x[j] - x[i]) ** 2)
            w = max(h * h - d2, 0.0) ** 3
            sa[i] += A[j] * w * v[j]
    return norm * sa


@pytest.mark.smoke
@pytest.mark.parametrize("dim", [2, 3])
def test_volume_matches_numpy_oracle(rng, dim):
    x = rng.uniform(-0.5, 0.5, size=(40, dim)).astype(np.float32)
    got = np.asarray(dense.volume(jnp.asarray(x), H))
    want = _numpy_oracle_volume(x, H)
    assert np.allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_gradient_matches_numpy_oracle(rng, dim):
    x = rng.uniform(-0.5, 0.5, size=(40, dim)).astype(np.float32)
    A = rng.normal(size=(40, 5)).astype(np.float32)
    v = np.asarray(dense.volume(jnp.asarray(x), H))
    got = np.asarray(dense.gradient(jnp.asarray(x), jnp.asarray(v), jnp.asarray(A), H))
    want = _numpy_oracle_gradient(x, v, A, H)
    # Oracle runs in float64; the jax path is float32. The spiky
    # normalization (10/(pi h^5) ~ 3e3 at h=0.25) amplifies f32 summation
    # noise on near-cancelling neighborhoods, so tolerance is absolute at
    # the scale of individual pair terms (~1), not the output.
    assert np.allclose(got, want, rtol=1e-2, atol=0.1)


@pytest.mark.parametrize("dim", [2, 3])
def test_blur_matches_numpy_oracle(rng, dim):
    x = rng.uniform(-0.5, 0.5, size=(40, dim)).astype(np.float32)
    A = rng.normal(size=(40, 5)).astype(np.float32)
    v = np.asarray(dense.volume(jnp.asarray(x), H))
    got = np.asarray(dense.blur(jnp.asarray(x), jnp.asarray(v), jnp.asarray(A), H))
    want = _numpy_oracle_blur(x, v, A, H)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradient_of_constant_field_is_zero(rng):
    x = rng.uniform(-0.5, 0.5, size=(50, 2)).astype(np.float32)
    x = jnp.asarray(x)
    v = dense.volume(x, H)
    A = jnp.ones((50, 3))
    ga = np.asarray(dense.gradient(x, v, A, H))
    assert np.allclose(ga, 0.0, atol=1e-5)


def test_gradient_of_linear_field_on_grid():
    """On a dense regular grid, the SPH gradient of a linear field recovers
    the true gradient in the domain interior (the paper's perception op is
    built on this consistency)."""
    m = 40
    lin = np.linspace(-1, 1, m, endpoint=False) + 1.0 / m
    x = np.stack(np.meshgrid(lin, lin, indexing="ij"), -1).reshape(-1, 2)
    x = jnp.asarray(x.astype(np.float32))
    h = 0.25
    v = dense.volume(x, h)
    coef = np.array([0.7, -0.3], dtype=np.float32)
    A = (np.asarray(x) @ coef)[:, None]
    ga = np.asarray(dense.gradient(x, v, jnp.asarray(A), h))
    interior = np.all(np.abs(np.asarray(x)) < 1 - h, axis=-1)
    est = ga[interior, 0, :]
    assert np.allclose(est.mean(0), coef, atol=0.05)
    assert np.max(np.abs(est - coef)) < 0.15


def test_blur_partition_of_unity_on_grid():
    """blur(ones) ~= 1 in the interior of a regular grid (Shepard property:
    sigma sum_j W v_j is a partition of unity when v is SPH volume)."""
    m = 40
    lin = np.linspace(-1, 1, m, endpoint=False) + 1.0 / m
    x = np.stack(np.meshgrid(lin, lin, indexing="ij"), -1).reshape(-1, 2)
    x = jnp.asarray(x.astype(np.float32))
    h = 0.25
    v = dense.volume(x, h)
    sa = np.asarray(dense.blur(x, v, jnp.ones((x.shape[0], 1)), h))
    interior = np.all(np.abs(np.asarray(x)) < 1 - h, axis=-1)
    assert np.allclose(sa[interior], 1.0, atol=0.05)


def test_divergence_of_linear_vector_field_on_grid():
    """div([a x, b y]) == a + b on the grid interior."""
    m = 40
    lin = np.linspace(-1, 1, m, endpoint=False) + 1.0 / m
    xg = np.stack(np.meshgrid(lin, lin, indexing="ij"), -1).reshape(-1, 2)
    x = jnp.asarray(xg.astype(np.float32))
    h = 0.25
    v = dense.volume(x, h)
    a, b = 0.5, -0.2
    A = np.stack([a * xg[:, 0], b * xg[:, 1]], -1)[:, None, :].astype(np.float32)
    da = np.asarray(dense.divergence(x, v, jnp.asarray(A), h))
    interior = np.all(np.abs(xg) < 1 - h, axis=-1)
    assert np.allclose(da[interior, 0], a + b, atol=0.05)


def test_count_matches_bruteforce(rng):
    x = rng.uniform(-0.5, 0.5, size=(60, 2)).astype(np.float32)
    got = np.asarray(dense.count(jnp.asarray(x), H))
    d2 = np.sum((x[None] - x[:, None]) ** 2, -1)
    want = (d2 < H * H).sum(-1)
    assert np.array_equal(got, want)


def test_periodic_displacements_minimum_image():
    x = jnp.asarray([[-0.9, 0.0], [0.9, 0.0]], dtype=jnp.float32)
    r = np.asarray(dense.displacements(x, period=jnp.asarray([2.0, 2.0])))
    # across the wrap the two points are 0.2 apart, not 1.8 (and the
    # shorter image points the other way: +1.8 wraps to -0.2)
    assert np.allclose(r[0, 1], [-0.2, 0.0], atol=1e-5)
    assert np.allclose(r[1, 0], [0.2, 0.0], atol=1e-5)
