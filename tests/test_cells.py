"""Cell-dense engine: parity with the neighbor-list path and dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu import ops
from sph_nca_tpu.ops import dense
from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.models import SPHNCAConfig, init_params, nca_step
from sph_nca_tpu.models.cell_step import nca_step_cells, rollout_cells
from sph_nca_tpu.models.rollout import rollout
from sph_nca_tpu.utils.geometry import grange


H = 0.2
DIMS = ops.default_dims(H)


def cloud(rng, n=400, dim=2):
    return jnp.asarray(rng.uniform(-1, 1, (n, dim)).astype(np.float32))


@pytest.mark.parametrize("dim", [2, 3])
def test_layout_roundtrip(rng, dim):
    x = cloud(rng, 300, dim)
    eng = build_cell_engine(x, H, DIMS)
    A = jnp.asarray(rng.normal(size=(300, 5)).astype(np.float32))
    S = eng.scatter(A)
    back = eng.gather_back(S)
    assert np.allclose(np.asarray(back), np.asarray(A))
    # padded slots and dummy cell are zero
    total = float(jnp.sum(jnp.abs(S)))
    assert np.isclose(total, float(jnp.sum(jnp.abs(A))), rtol=1e-6)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [False, True])
def test_volume_blur_gradient_match_dense(rng, dim, periodic):
    x = cloud(rng, 350, dim)
    period = jnp.asarray([2.0] * dim) if periodic else None
    eng = build_cell_engine(x, H, DIMS, period=period)
    A = jnp.asarray(rng.normal(size=(350, 4)).astype(np.float32))

    v_d = dense.volume(x, H, period=period)
    v_eng = eng.gather_back(eng.vs[..., None])[:, 0]
    assert np.allclose(np.asarray(v_eng), np.asarray(v_d), rtol=1e-4)

    S = eng.scatter(A)
    sa = eng.gather_back(eng.blur(S))
    sa_d = dense.blur(x, v_d, A, H, period=period)
    assert np.allclose(np.asarray(sa), np.asarray(sa_d), rtol=1e-3, atol=1e-4)

    ga = eng.gradient(S)
    ga_back = ga.reshape(*ga.shape[:2], -1)
    ga_p = eng.gather_back(ga_back).reshape(350, 4, dim)
    ga_d = dense.gradient(x, v_d, A, H, period=period)
    assert np.allclose(
        np.asarray(ga_p), np.asarray(ga_d), rtol=1e-3, atol=5e-3
    )


@pytest.mark.smoke
def test_nca_step_cells_matches_graph_path(rng):
    """With fire_rate=1 the cell step must agree with the graph step."""
    m, h = 24, 0.2
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    eng = build_cell_engine(x, h, dims)

    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray(
        (rng.random((x.shape[0], 8)) * 0.5).astype(np.float32)
    )

    nA_graph = nca_step(params, cfg, g, A, jax.random.key(1), h, fire_rate=1.0)
    S = eng.scatter(A)
    nS = nca_step_cells(params, cfg, eng, S, jax.random.key(2), h,
                        fire_rate=1.0)
    nA_cell = eng.gather_back(nS)
    assert np.allclose(
        np.asarray(nA_cell), np.asarray(nA_graph), rtol=1e-3, atol=1e-4
    )


def test_nca_step_cells_no_alpha_mode(rng):
    """use_alpha=False: padded window slots must not count as alive."""
    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    eng = build_cell_engine(x, h, dims)
    cfg = SPHNCAConfig(channels=8, hidden=32, use_alpha=False)
    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray(rng.random((x.shape[0], 8)).astype(np.float32))
    nA_graph = nca_step(params, cfg, g, A, jax.random.key(1), h, fire_rate=1.0)
    nS = nca_step_cells(params, cfg, eng, eng.scatter(A), jax.random.key(2),
                        h, fire_rate=1.0)
    assert np.allclose(
        np.asarray(eng.gather_back(nS)), np.asarray(nA_graph),
        rtol=1e-3, atol=1e-4,
    )


def test_rollout_cells_matches_graph_rollout(rng):
    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    eng = build_cell_engine(x, h, dims)
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A0 = jnp.asarray((rng.random((x.shape[0], 8)) * 0.5).astype(np.float32))
    key = jax.random.key(3)

    ref = rollout(params, cfg, g, A0, key, 4, h, fire_rate=1.0).final
    out = rollout_cells(params, cfg, eng, eng.scatter(A0), key, 4, h,
                        fire_rate=1.0)
    got = eng.gather_back(out.final)
    assert np.allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_cell_rollout_differentiable(rng):
    m, h = 12, 0.3
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h, ops.default_dims(h))
    cfg = SPHNCAConfig(channels=8, hidden=16, use_alpha=False)
    params = init_params(jax.random.key(0), cfg)
    S0 = eng.scatter(
        jnp.asarray(rng.random((x.shape[0], 8)).astype(np.float32))
    )

    def loss(p):
        out = rollout_cells(p, cfg, eng, S0, jax.random.key(1), 3, h)
        return jnp.mean(out.final**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_cell_divergence_matches_dense(rng):
    from sph_nca_tpu.ops import dense
    from sph_nca_tpu.ops.cells import build_cell_engine

    n, h = 220, 0.3
    x = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32))
    eng = build_cell_engine(np.asarray(x), h)
    want = np.asarray(dense.divergence(x, dense.volume(x, h), V, h))
    Vc = eng.scatter(V.reshape(n, -1)).reshape(*eng.xs.shape[:2], 4, 3)
    got = np.asarray(eng.gather_back(eng.divergence(Vc)))
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cell_count_matches_dense(rng):
    from sph_nca_tpu.ops import dense
    from sph_nca_tpu.ops.cells import build_cell_engine

    n, h = 300, 0.25
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    eng = build_cell_engine(np.asarray(x), h)
    want = np.asarray(dense.count(x, h))
    got = np.asarray(eng.gather_back(eng.count()[..., None]))[:, 0]
    assert np.array_equal(got, want)
