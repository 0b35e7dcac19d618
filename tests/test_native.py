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


def _numpy_true_pairs(x, h, period):
    """Run ops/bands._true_pairs with the native library masked off."""
    import sph_nca_tpu.native as nmod
    from sph_nca_tpu.ops import bands

    saved_lib, saved_fail = nmod._lib, nmod._load_failed
    nmod._lib, nmod._load_failed = None, True
    try:
        return bands._true_pairs(x, h, period)
    finally:
        nmod._lib, nmod._load_failed = saved_lib, saved_fail


def _canon_pairs(t):
    pi, pj, dx, d2 = t
    key = np.lexsort((np.round(d2, 12), pj, pi))
    return pi[key], pj[key], dx[key], d2[key]


@pytest.mark.parametrize("periodic", [False, True])
def test_true_pairs_matches_numpy(rng, periodic):
    """sphgrid_true_pairs == ops/bands._true_pairs numpy fallback
    (same pair multiset incl. self pairs and periodic multi-images;
    order differs — native is particle-major)."""
    x = rng.uniform(-1, 1, (500, 3))
    per = np.array([2.0] * 3) if periodic else None
    nat = native.true_pairs(x, 0.3, per)
    assert nat is not None
    a = _canon_pairs(nat)
    b = _canon_pairs(_numpy_true_pairs(x, 0.3, per))
    assert len(a[0]) == len(b[0])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # native emits f32 geometry (the numpy fallback keeps f64)
    np.testing.assert_allclose(a[2], b[2], atol=1e-6)
    np.testing.assert_allclose(a[3], b[3], atol=1e-7)


def test_accum_table_matches_bincount(rng):
    """sphgrid_accum_table == the bincount table fill (multi-image
    duplicates accumulate)."""
    e, d, p, nrows, wcols = 300, 3, 8, 5, 16
    rows = rng.integers(0, nrows, e)
    cols = rng.integers(0, wcols, e)
    ri = rng.integers(0, p, e)
    # force duplicates so accumulation is exercised
    rows[: e // 4] = rows[e // 4 : e // 2]
    cols[: e // 4] = cols[e // 4 : e // 2]
    ri[: e // 4] = ri[e // 4 : e // 2]
    mdv = rng.normal(size=(e, d))
    w6v = rng.normal(size=e)
    got = native.accum_table(rows, cols, ri, mdv, w6v, nrows, wcols, p)
    assert got is not None
    cc = (d + 1) * p
    base = (rows * wcols + cols) * cc + ri
    idx = np.concatenate([base + c * p for c in range(d)] + [base + d * p])
    w = np.concatenate([mdv[:, c] for c in range(d)] + [w6v])
    ref = np.bincount(idx, weights=w, minlength=nrows * wcols * cc).reshape(
        nrows, wcols, cc
    )
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=2e-6,
                               atol=1e-7)


def test_cast_bf16_gsum_matches_ml_dtypes(rng):
    """Native RTE f32->bf16 cast is bit-identical to ml_dtypes, and the
    fused row sum equals the sum of the quantized values."""
    import ml_dtypes

    t = (rng.normal(size=(7, 24, 32)) *
         np.exp(rng.normal(size=(7, 24, 32)) * 4)).astype(np.float32)
    res = native.cast_bf16_gsum(t)
    assert res is not None
    got, gs = res
    ref = t.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), ref.view(np.uint16))
    np.testing.assert_allclose(gs, ref.astype(np.float32).sum(axis=1),
                               rtol=1e-6)


def test_band_build_native_matches_numpy_fallback(rng):
    """build_band_engine through the native fast paths == the pure
    numpy build (f32 tables: identical up to accumulation order)."""
    import sph_nca_tpu.native as nmod
    from sph_nca_tpu.ops.bands import build_band_engine

    x = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    e_nat = build_band_engine(x, 0.3, block_rows=16, table_dtype="float32")
    saved_lib, saved_fail = nmod._lib, nmod._load_failed
    nmod._lib, nmod._load_failed = None, True
    try:
        e_np = build_band_engine(x, 0.3, block_rows=16,
                                 table_dtype="float32")
    finally:
        nmod._lib, nmod._load_failed = saved_lib, saved_fail
    np.testing.assert_allclose(np.asarray(e_nat.Tband),
                               np.asarray(e_np.Tband), rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e_nat.gsum),
                               np.asarray(e_np.gsum), rtol=1e-5, atol=1e-6)
    assert len(e_nat.far_tabs) == len(e_np.far_tabs)
    for a, b in zip(e_nat.far_tabs, e_np.far_tabs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-7)
    np.testing.assert_array_equal(np.asarray(e_nat.slot_of_particle),
                                  np.asarray(e_np.slot_of_particle))


@pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)
def test_far_structure_native_matches_numpy(rng):
    """The native far-structure assembly (far_groups + far_meta, the
    round-4 one-pass replacement for np.unique / per-bucket
    searchsorted chains) produces a bit-identical engine to the numpy
    fallback across dense / periodic / sparse-far geometries — every
    pytree leaf, including group lists, bucket tables and row order."""
    import jax

    import sph_nca_tpu.native as nmod
    from sph_nca_tpu.ops.bands import build_band_engine

    cases = [
        (rng.uniform(0, 1, (5000, 2)).astype(np.float32), 0.04, None),
        (rng.uniform(0, 1, (5000, 2)).astype(np.float32), 0.04, 1.0),
        (rng.uniform(0, 1, (4000, 3)).astype(np.float32), 0.06, None),
        (rng.uniform(0, 1, (128, 2)).astype(np.float32), 0.2, None),
    ]
    for x, h, period in cases:
        e_nat = build_band_engine(x, h, period=period)
        # mask ONLY the far-structure entry point so both legs share the
        # same (native) table fills — the far assembly must then be
        # bit-identical, not merely allclose
        saved = nmod.far_groups
        nmod.far_groups = lambda *a, **k: None
        try:
            e_np = build_band_engine(x, h, period=period)
        finally:
            nmod.far_groups = saved
        la = jax.tree_util.tree_leaves(e_nat)
        lb = jax.tree_util.tree_leaves(e_np)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(
                a.astype(np.float64) if a.dtype.kind == "f" else a,
                b.astype(np.float64) if b.dtype.kind == "f" else b,
            )
