"""Native host-side grid analytics (sphgrid.cpp via ctypes)."""

import numpy as np
import pytest

from sph_nca_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_capacity_exact(rng):
    x = rng.uniform(-1, 1, (400, 2)).astype(np.float32)
    h, dims = 0.25, 8
    occ, nbrs = native.capacity(x, h, dims)
    # numpy truth
    ci = np.mod(np.floor(x / h).astype(int), dims)
    cell = ci[:, 0] + dims * ci[:, 1]
    occ_np = int(np.bincount(cell, minlength=dims * dims).max())
    r = x[None] - x[:, None]
    nbrs_np = int((np.sum(r * r, -1) < h * h).sum(-1).max())
    assert (occ, nbrs) == (occ_np, nbrs_np)


def test_capacity_periodic(rng):
    x = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    h, dims = 0.25, 8
    period = np.asarray([2.0, 2.0], np.float32)
    occ, nbrs = native.capacity(x, h, dims, period=period)
    r = x[None] - x[:, None]
    r = r - np.round(r / 2.0) * 2.0
    nbrs_np = int((np.sum(r * r, -1) < h * h).sum(-1).max())
    assert nbrs == nbrs_np


def test_cell_hash_matches_jax(rng):
    import jax.numpy as jnp

    from sph_nca_tpu.ops.hashgrid import cell_index, _strides

    x = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    h, dims = 0.2, 10
    got = native.cell_hash(x, h, dims)
    ci = np.asarray(cell_index(jnp.asarray(x), h, (dims,) * 3))
    want = ci @ _strides((dims,) * 3)
    assert np.array_equal(got, want)


def test_fps_matches_jax(rng):
    import jax.numpy as jnp

    from sph_nca_tpu.utils.meshes import farthest_point_sampling

    x = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    got = native.fps(x, 20)
    want = np.asarray(farthest_point_sampling(jnp.asarray(x), 20))
    assert np.array_equal(got, want)
