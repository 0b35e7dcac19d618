"""Neighbor-list engine + ops: exactness vs the dense oracle, autodiff parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu import ops
from sph_nca_tpu.ops import dense


def make_cloud(rng, n=200, dim=2, lo=-1.0, hi=1.0):
    return jnp.asarray(rng.uniform(lo, hi, size=(n, dim)).astype(np.float32))


H = 0.2
DIMS = ops.default_dims(H)  # ceil(2/0.2) = 10


def build(x, period=None, h=H, dims=DIMS):
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims, period=period)
    nl = ops.build_neighbor_list(x, h, dims, max_per_cell=mpc, k=k, period=period)
    return nl


@pytest.mark.parametrize("dim", [2, 3])
def test_neighbor_list_is_exact(rng, dim):
    x = make_cloud(rng, 300, dim)
    nl = build(x)
    assert int(nl.num_dropped) == 0
    # neighbor sets match brute force
    xn = np.asarray(x)
    d2 = np.sum((xn[None] - xn[:, None]) ** 2, -1)
    want_counts = (d2 < H * H).sum(-1)
    got_counts = np.asarray(nl.valid.sum(-1))
    assert np.array_equal(got_counts, want_counts)
    # each valid neighbor really is within h, and no duplicates
    idx = np.asarray(nl.idx)
    valid = np.asarray(nl.valid)
    for i in range(x.shape[0]):
        js = idx[i][valid[i]]
        assert len(set(js.tolist())) == len(js)
        assert np.all(d2[i, js] < H * H)
        assert i in js  # self is always a neighbor


def test_neighbor_list_periodic_matches_dense(rng):
    x = make_cloud(rng, 300, 2)
    period = jnp.asarray([2.0, 2.0])
    nl = build(x, period=period)
    assert int(nl.num_dropped) == 0
    got = np.asarray(ops.count(x, H, nl, period=period))
    want = np.asarray(dense.count(x, H, period=period))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [False, True])
def test_all_ops_match_dense_oracle(rng, dim, periodic):
    x = make_cloud(rng, 250, dim)
    period = jnp.asarray([2.0] * dim) if periodic else None
    nl = build(x, period=period)
    A = jnp.asarray(rng.normal(size=(250, 4)).astype(np.float32))
    Av = jnp.asarray(rng.normal(size=(250, 4, dim)).astype(np.float32))

    v_nl = ops.volume(x, H, nl, period=period)
    v_d = dense.volume(x, H, period=period)
    assert np.allclose(np.asarray(v_nl), np.asarray(v_d), rtol=1e-5)

    ga_nl = ops.gradient(x, v_nl, A, H, nl, period=period)
    ga_d = dense.gradient(x, v_d, A, H, period=period)
    assert np.allclose(np.asarray(ga_nl), np.asarray(ga_d), rtol=1e-4, atol=1e-5)

    sa_nl = ops.blur(x, v_nl, A, H, nl, period=period)
    sa_d = dense.blur(x, v_d, A, H, period=period)
    assert np.allclose(np.asarray(sa_nl), np.asarray(sa_d), rtol=1e-4, atol=1e-6)

    da_nl = ops.divergence(x, v_nl, Av, H, nl, period=period)
    da_d = dense.divergence(x, v_d, Av, H, period=period)
    assert np.allclose(np.asarray(da_nl), np.asarray(da_d), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_graph_fast_path_matches_general_ops(rng, periodic):
    x = make_cloud(rng, 250, 2)
    period = jnp.asarray([2.0, 2.0]) if periodic else None
    mpc, k = ops.suggest_capacity(np.asarray(x), H, DIMS, period=period)
    g = ops.build_graph(x, H, DIMS, max_per_cell=mpc, k=k, period=period)
    nl = ops.NeighborList(g.idx, g.valid, jnp.int32(0))
    A = jnp.asarray(rng.normal(size=(250, 6)).astype(np.float32))
    Av = jnp.asarray(rng.normal(size=(250, 6, 2)).astype(np.float32))

    assert np.allclose(
        np.asarray(g.v), np.asarray(dense.volume(x, H, period=period)), rtol=1e-5
    )
    assert np.allclose(
        np.asarray(ops.graph_gradient(g, A)),
        np.asarray(ops.gradient(x, g.v, A, H, nl, period=period)),
        rtol=1e-4,
        atol=1e-5,
    )
    assert np.allclose(
        np.asarray(ops.graph_blur(g, A)),
        np.asarray(ops.blur(x, g.v, A, H, nl, period=period)),
        rtol=1e-4,
        atol=1e-6,
    )
    assert np.allclose(
        np.asarray(ops.graph_divergence(g, Av)),
        np.asarray(ops.divergence(x, g.v, Av, H, nl, period=period)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_autodiff_matches_dense_autodiff(rng):
    """d(loss)/dA and d(loss)/dx through neighbor ops == through dense ops.

    The dense path is the oracle adjoint (the reference hand-derives the same
    gather-form adjoints in operators_batch.py:238-343)."""
    n = 120
    x = make_cloud(rng, n, 2)
    nl = build(x)
    A = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, 3, 2)).astype(np.float32))

    def loss_nl(x, A):
        v = ops.volume(x, H, nl)
        ga = ops.gradient(x, v, A, H, nl)
        sa = ops.blur(x, v, A, H, nl)
        return jnp.sum(ga * w) + jnp.sum(sa * A)

    def loss_dense(x, A):
        v = dense.volume(x, H)
        ga = dense.gradient(x, v, A, H)
        sa = dense.blur(x, v, A, H)
        return jnp.sum(ga * w) + jnp.sum(sa * A)

    gx_nl, gA_nl = jax.grad(loss_nl, argnums=(0, 1))(x, A)
    gx_d, gA_d = jax.grad(loss_dense, argnums=(0, 1))(x, A)
    assert np.allclose(np.asarray(gA_nl), np.asarray(gA_d), rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(gx_nl), np.asarray(gx_d), rtol=1e-3, atol=1e-3)


def test_autodiff_matches_finite_differences(rng):
    """dL/dA finite-difference check on the graph fast path."""
    n = 80
    x = make_cloud(rng, n, 2)
    mpc, k = ops.suggest_capacity(np.asarray(x), H, DIMS)
    g = ops.build_graph(x, H, DIMS, max_per_cell=mpc, k=k)
    A = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, 2, 2)).astype(np.float32))

    def loss(A):
        return jnp.sum(ops.graph_gradient(g, A) * w)

    gA = np.asarray(jax.grad(loss)(A))
    eps = 1e-3
    rng2 = np.random.default_rng(1)
    for _ in range(5):
        i = rng2.integers(n)
        f = rng2.integers(2)
        e = np.zeros_like(np.asarray(A))
        e[i, f] = eps
        fd = (float(loss(A + e)) - float(loss(A - e))) / (2 * eps)
        assert np.isclose(gA[i, f], fd, rtol=2e-2, atol=1e-4)


def test_num_dropped_reports_overflow(rng):
    """With a deliberately tiny K the list must report dropped neighbors."""
    x = make_cloud(rng, 300, 2)
    nl = ops.build_neighbor_list(x, H, DIMS, max_per_cell=64, k=2)
    assert int(nl.num_dropped) > 0


def test_vmap_batching(rng):
    """Ops batch over [B, N, ...] via vmap (replaces ragged pack/sections)."""
    b, n = 3, 150
    xs = jnp.asarray(rng.uniform(-1, 1, size=(b, n, 2)).astype(np.float32))
    mpc, k = ops.suggest_capacity(np.asarray(xs[0]), H, DIMS)
    build_b = jax.vmap(
        lambda x: ops.build_neighbor_list(x, H, DIMS, max_per_cell=mpc + 8, k=k + 8)
    )
    nls = build_b(xs)
    vols = jax.vmap(lambda x, nl: ops.volume(x, H, nl))(xs, nls)
    for i in range(b):
        want = np.asarray(dense.volume(xs[i], H))
        assert np.allclose(np.asarray(vols[i]), want, rtol=1e-4)


def test_build_graph_exact_retries_undersized_k(rng):
    """build_graph(exact=True) must auto-grow capacities until no true
    neighbor is dropped (guards suggest_capacity's sampled estimate)."""
    from sph_nca_tpu.ops.hashgrid import build_graph, build_neighbor_list

    x = jnp.asarray(rng.uniform(-1, 1, (400, 2)).astype(np.float32))
    h = 0.4  # dense neighborhoods; k=8 is deliberately too small
    dims = ops.default_dims(h)
    nl = build_neighbor_list(x, h, dims, max_per_cell=64, k=8)
    assert int(nl.num_dropped) > 0  # the failure mode being guarded
    g = build_graph(x, h, dims, max_per_cell=64, k=8)  # exact by default
    # every true pair within h is present: volumes match the dense oracle
    from sph_nca_tpu.ops import dense
    want = np.asarray(dense.volume(x, h))
    assert np.allclose(np.asarray(g.v), want, rtol=1e-5, atol=1e-7)
