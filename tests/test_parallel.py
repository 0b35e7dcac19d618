"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.parallel import (
    dryrun_train_step,
    factorize,
    make_mesh,
    shard_batch,
    shard_graph,
)


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factorize():
    assert factorize(8) == (2, 4)
    assert factorize(4) == (2, 2)
    assert factorize(1) == (1, 1)
    assert factorize(8, prefer_data=8) == (8, 1)


@needs_8
def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["particle"] == 8
    mesh = make_mesh(data=4)
    assert dict(mesh.shape) == {"data": 4, "particle": 2}


@needs_8
def test_sharded_train_step_runs_and_matches_single_device():
    """The full sharded training step must compile, run, and produce a
    finite loss on an 8-device (2 data x 4 particle) mesh."""
    mesh = make_mesh()
    loss = dryrun_train_step(mesh, n_side=16, steps=4)
    assert np.isfinite(loss)

    # pure-DP mesh gives the same loss (sharding must not change math);
    # batch must divide the data axis
    mesh_dp = make_mesh(data=8)
    loss_dp = dryrun_train_step(mesh_dp, n_side=16, steps=4, batch=8)
    mesh_pp = make_mesh(data=1)
    loss_pp = dryrun_train_step(mesh_pp, n_side=16, steps=4, batch=8)
    assert np.isclose(loss_dp, loss_pp, rtol=1e-4), (loss_dp, loss_pp)


@needs_8
def test_sharded_rollout_matches_unsharded():
    """Particle-axis sharding must be semantics-preserving for rollouts."""
    from sph_nca_tpu import ops
    from sph_nca_tpu.models import SPHNCAConfig, init_params, rollout_batch
    from sph_nca_tpu.utils.geometry import grange

    h = 0.25
    x = grange((16, 16), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    graph = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    cfg = SPHNCAConfig(channels=8, hidden=32)
    params = init_params(jax.random.key(0), cfg)
    A0 = jax.random.uniform(jax.random.key(1), (2, x.shape[0], 8))
    key = jax.random.key(2)

    ref = rollout_batch(params, cfg, graph, A0, key, 4, h).final

    mesh = make_mesh()
    graph_s = shard_graph(graph, mesh)
    A0_s = shard_batch(A0, mesh)
    with mesh:
        out = jax.jit(
            lambda p, g, a: rollout_batch(p, cfg, g, a, key, 4, h).final
        )(params, graph_s, A0_s)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _cell_fixture(npart):
    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.utils.geometry import grange

    m, h = 24, 0.2
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h, n_shards=npart)
    ref_eng = build_cell_engine(x, h)
    cfg = SPHNCAConfig(channels=8, hidden=16)
    params = init_params(jax.random.key(0), cfg)
    A = jax.random.uniform(jax.random.key(1), (x.shape[0], 8))
    return h, eng, ref_eng, cfg, params, A


@needs_8
def test_sharded_cell_engine_rollout_matches():
    """Cell-dense engine sharded over the particle axis (XLA/GSPMD path)
    must be semantics-preserving. fire_rate=1 so the per-slot RNG draws
    are layout-independent."""
    from sph_nca_tpu.models.cell_step import rollout_cells
    from sph_nca_tpu.parallel import shard_cell_engine
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1)
    h, eng, ref_eng, cfg, params, A = _cell_fixture(mesh.shape["particle"])
    ref = ref_eng.gather_back(
        rollout_cells(params, cfg, ref_eng, ref_eng.scatter(A),
                      jax.random.key(2), 3, h, use_pallas=False,
                      fire_rate=1.0).final
    )
    eng_s = shard_cell_engine(eng, mesh)
    S0 = jax.device_put(eng.scatter(A), NamedSharding(mesh, P("particle")))
    with mesh:
        out = jax.jit(
            lambda p, e, S: rollout_cells(
                p, cfg, e, S, jax.random.key(2), 3, h, use_pallas=False,
                fire_rate=1.0,
            ).final
        )(params, eng_s, S0)
    got = eng.gather_back(out)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@needs_8
def test_sharded_pallas_rollout_matches():
    """THE fast path multi-chip: fused Pallas pair kernels under
    shard_map (interpret mode on the CPU mesh) must match the unsharded
    XLA formulation, forward and backward."""
    from sph_nca_tpu.models.cell_step import rollout_cells
    from sph_nca_tpu.parallel import shard_cell_engine
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1)
    h, eng, ref_eng, cfg, params, A = _cell_fixture(mesh.shape["particle"])

    npart = mesh.shape["particle"]

    def xla_loss(p):
        out = rollout_cells(p, cfg, ref_eng, ref_eng.scatter(A),
                            jax.random.key(2), 3, h, use_pallas=False,
                            fire_rate=1.0).final
        return jnp.sum(ref_eng.gather_back(out) ** 2), out

    def unsharded_loss(p):  # same pallas math, one device
        out = rollout_cells(p, cfg, eng, eng.scatter(A),
                            jax.random.key(2), 3, h, use_pallas=True,
                            shards=npart, fire_rate=1.0).final
        return jnp.sum(eng.gather_back(out) ** 2), out

    eng_s = shard_cell_engine(eng, mesh)
    S0 = jax.device_put(eng.scatter(A), NamedSharding(mesh, P("particle")))

    def sh_loss(p):
        out = rollout_cells(p, cfg, eng_s, S0, jax.random.key(2), 3, h,
                            use_pallas=True, mesh=mesh,
                            fire_rate=1.0).final
        return jnp.sum(eng.gather_back(out) ** 2), out

    (lx, out_x), _ = jax.value_and_grad(xla_loss, has_aux=True)(params)
    (lu, out_u), gu = jax.value_and_grad(unsharded_loss, has_aux=True)(params)
    (ls, out_s), gs = jax.value_and_grad(sh_loss, has_aux=True)(params)

    # forward: sharded pallas == unsharded pallas == XLA formulation
    ref = np.asarray(ref_eng.gather_back(out_x))
    got = np.asarray(eng.gather_back(out_s))
    assert np.allclose(got, ref, atol=1e-5)
    assert np.isclose(float(ls), float(lx), rtol=1e-5)

    # backward: sharding must be bit-for-math identical to the unsharded
    # pallas path. (Pallas-vs-XLA grads are compared only at 1 step in
    # test_pallas.py — multi-step BPTT amplifies f32 threshold flips of
    # the discrete living mask into O(1) grad differences between any two
    # float orderings; that is trajectory chaos, not an adjoint bug.)
    assert np.isclose(float(ls), float(lu), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gu)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


@needs_8
def test_sharded_pair_tables_rollout_matches():
    """Precomputed pair tables (the MXU table kernels) under shard_map
    must match the unsharded table path, forward and backward."""
    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.cell_step import rollout_cells
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.parallel import shard_cell_engine
    from sph_nca_tpu.utils.geometry import grange
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1)
    npart = mesh.shape["particle"]
    m, h = 24, 0.2
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h, n_shards=npart, pair_tables="float32")
    cfg = SPHNCAConfig(channels=8, hidden=16)
    params = init_params(jax.random.key(0), cfg)
    A = jax.random.uniform(jax.random.key(1), (x.shape[0], 8))

    def unsharded_loss(p):
        out = rollout_cells(p, cfg, eng, eng.scatter(A),
                            jax.random.key(2), 3, h, use_pallas=True,
                            shards=npart, fire_rate=1.0).final
        return jnp.sum(eng.gather_back(out) ** 2), out

    eng_s = shard_cell_engine(eng, mesh)
    S0 = jax.device_put(eng.scatter(A), NamedSharding(mesh, P("particle")))

    def sh_loss(p):
        out = rollout_cells(p, cfg, eng_s, S0, jax.random.key(2), 3, h,
                            use_pallas=True, mesh=mesh,
                            fire_rate=1.0).final
        return jnp.sum(eng.gather_back(out) ** 2), out

    (lu, out_u), gu = jax.value_and_grad(unsharded_loss, has_aux=True)(params)
    (ls, out_s), gs = jax.value_and_grad(sh_loss, has_aux=True)(params)
    assert np.isclose(float(ls), float(lu), rtol=1e-6)
    assert np.allclose(
        np.asarray(eng.gather_back(out_s)),
        np.asarray(eng.gather_back(out_u)), atol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gu)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


@needs_8
def test_sharded_perception_adjoint_matches():
    """Sharded custom_vjp adjoint == unsharded pallas == XLA autodiff."""
    from sph_nca_tpu.ops.pallas.pair_kernel import perceive_cells_dmajor
    from sph_nca_tpu.parallel import (
        perceive_cells_dmajor_sharded,
        shard_cell_engine,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1)
    h, eng, ref_eng, cfg, params, A = _cell_fixture(mesh.shape["particle"])
    eng_s = shard_cell_engine(eng, mesh)
    S0 = jax.device_put(eng.scatter(A), NamedSharding(mesh, P("particle")))
    Wc = eng.scatter(
        jax.random.normal(jax.random.key(5), (A.shape[0], 2 * A.shape[1]))
    )

    def sh(S):
        ga, _ = perceive_cells_dmajor_sharded(mesh, eng_s, S, True)
        return jnp.sum(ga * Wc)

    def unsh(S):
        ga, _ = perceive_cells_dmajor(eng, S, True, mesh.shape["particle"])
        return jnp.sum(ga * Wc)

    g_sh = eng.gather_back(jax.grad(sh)(S0))
    g_un = eng.gather_back(jax.grad(unsh)(eng.scatter(A)))
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_un), rtol=1e-5, atol=1e-6
    )


@pytest.mark.smoke
def test_batched_lane_rollout_sharded_matches_unsharded():
    """Batched-lane rollout (ops/batched.py) sharded over the particle
    axis via GSPMD: pair tables stay device-local (the dominant memory),
    cross-shard window reads lower to collectives. Must equal the
    unsharded rollout exactly (same math, fire_rate=1)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.cell_step import rollout_cells_batched
    from sph_nca_tpu.ops.batched import batched_gather_back, batched_scatter
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.parallel import make_mesh, shard_cell_engine
    from sph_nca_tpu.utils.geometry import grange

    mesh = make_mesh(jax.devices()[:8], data=1)
    npart = mesh.shape["particle"]
    h, B = 0.25, 3
    x = grange((20, 20), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(
        np.asarray(x), h, n_shards=npart, pair_tables="float32",
        xla_tables=False,
    )
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A0 = jax.random.uniform(jax.random.key(1), (B, x.shape[0], 8))
    SB0 = batched_scatter(eng, A0)

    roll = lambda e, S: rollout_cells_batched(
        params, cfg, e, S, B, jax.random.key(2), 3, h, fire_rate=1.0,
    ).final
    ref = jax.jit(roll)(eng, SB0)

    eng_s = shard_cell_engine(eng, mesh)
    SB0_s = jax.device_put(SB0, NamedSharding(mesh, P("particle")))
    out = jax.jit(roll)(eng_s, SB0_s)

    a = np.asarray(batched_gather_back(eng, ref, B))
    b = np.asarray(batched_gather_back(eng, out, B))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
