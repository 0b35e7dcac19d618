"""3D-surface machinery tests: tangent frames, diffusion, mesh rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from sph_nca_tpu import ops
from sph_nca_tpu.models import (
    SPHNCAConfig,
    init_params,
    normalize,
    orthogonalize,
    project_tangent_space,
    rollout_mesh,
    tangent_perception,
)
from sph_nca_tpu.models.surface import diffuse
from sph_nca_tpu.utils.meshes import fibonacci_sphere, sphere_normals


def sphere_scene(n=2000, h=0.15):
    x_np = fibonacci_sphere(n, 0.8)
    x = jnp.asarray(x_np)
    nrm = jnp.asarray(sphere_normals(x_np))
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(x_np, h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    return x, nrm, g, h


def test_normalize_and_orthogonalize():
    v = jnp.asarray([[3.0, 4.0, 0.0]])
    assert np.allclose(np.asarray(normalize(v)), [[0.6, 0.8, 0.0]], atol=1e-6)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    t = jnp.asarray([[1.0, 0.0, 1.0]])
    out = np.asarray(orthogonalize(n, t))
    assert np.allclose(out, [[1.0, 0.0, 0.0]], atol=1e-6)


def test_project_tangent_space_is_frame_change():
    rng = np.random.default_rng(0)
    n = normalize(jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32)))
    t_raw = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    t = orthogonalize(n, t_raw)
    gA = jnp.asarray(rng.normal(size=(5, 4, 3)).astype(np.float32))
    p = np.asarray(project_tangent_space(gA, n, t))
    # rotation preserves norms per feature
    assert np.allclose(
        np.linalg.norm(p, axis=-1), np.asarray(jnp.linalg.norm(gA, axis=-1)),
        atol=1e-5,
    )
    # a vector equal to the normal projects to (0, 0, 1)
    gN = jnp.broadcast_to(n[:, None, :], (5, 1, 3))
    pN = np.asarray(project_tangent_space(gN, n, t))
    assert np.allclose(pN[:, 0, 2], 1.0, atol=1e-5)
    assert np.allclose(pN[:, 0, :2], 0.0, atol=1e-5)


def test_diffuse_spreads_tangents_and_stays_tangent():
    x, nrm, g, h = sphere_scene(1000, 0.3)
    rng = np.random.default_rng(0)
    t0 = jnp.zeros_like(nrm)
    # one seeded tangent
    t0 = t0.at[0].set(orthogonalize(nrm[0], jnp.asarray([1.0, 0.0, 0.0])))
    A = jnp.ones((x.shape[0], 16))
    t = t0
    # lerp_multiplier=0 -> pure spreading (the reference's consistent-
    # tangent-field construction, test.py:187); with the default 1.0 and
    # full activity, diffuse lerps straight back to the input tangents.
    for _ in range(10):
        t = diffuse(nrm, t, A, g, lerp_multiplier=0.0)
    tn = np.asarray(t)
    # all tangents unit-ish and orthogonal to normals
    assert np.allclose(np.linalg.norm(tn, axis=-1), 1.0, atol=1e-3)
    dots = np.abs(np.sum(tn * np.asarray(nrm), axis=-1))
    assert dots.max() < 1e-3


def test_mesh_rollout_runs_and_masks():
    x, nrm, g, h = sphere_scene(1500, 0.2)
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)

    from sph_nca_tpu.utils.seeds import add_radial_seed

    A0 = jnp.zeros((x.shape[0], 8))
    A0 = add_radial_seed(x, A0, x[0], 0.3)
    t0 = jax.vmap(orthogonalize)(nrm, jnp.ones_like(nrm))

    final_A, final_t, states = rollout_mesh(
        params, cfg, g, g, A0, nrm, t0, jax.random.key(1), 5, h,
        collect_all=True,
    )
    assert states.shape == (6, x.shape[0], 8)
    assert np.all(np.isfinite(np.asarray(final_A)))
    # tangents remain orthonormal to normals after rollout
    tn = np.asarray(final_t)
    assert np.abs(np.sum(tn * np.asarray(nrm), -1)).max() < 1e-3


def test_tangent_perception_feeds_tangential_components():
    """The MLP consumes tangential derivative components (gA . T, gA . B)
    after projection — rotating the frame must change features 2/3 but the
    first block (A) stays."""
    x, nrm, g, h = sphere_scene(800, 0.3)
    cfg = SPHNCAConfig(channels=8, hidden=32)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(x.shape[0], 8)).astype(np.float32))

    from sph_nca_tpu.ops.neighbor_ops import gather_neighbors, graph_gradient_from

    Aj = gather_neighbors(g, A)
    gA = graph_gradient_from(g, A, Aj)
    t1 = jax.vmap(orthogonalize)(nrm, jnp.ones_like(nrm))
    p1 = tangent_perception(nrm, t1)(gA)
    # normal components equal regardless of tangent choice
    t2 = jax.vmap(orthogonalize)(nrm, jnp.asarray(
        rng.normal(size=nrm.shape).astype(np.float32)))
    p2 = tangent_perception(nrm, t2)(gA)
    assert np.allclose(
        np.asarray(p1[..., 2]), np.asarray(p2[..., 2]), atol=1e-4
    )
    assert not np.allclose(np.asarray(p1[..., 0]), np.asarray(p2[..., 0]))


def test_blur_cells_pallas_matches_graph_blur():
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.ops.neighbor_ops import graph_blur
    from sph_nca_tpu.ops.pallas.pair_kernel import blur_cells_pallas

    x, nrm, g, h = sphere_scene(800, 0.3)
    eng = build_cell_engine(np.asarray(x), h, pair_tables="float32")
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(x.shape[0], 4)).astype(np.float32))
    want = np.asarray(graph_blur(g, X))
    got = np.asarray(eng.gather_back(blur_cells_pallas(eng, eng.scatter(X))))
    assert np.allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mesh_rollout_cells_matches_graph_path():
    """Cell-engine mesh rollout (table kernels, cell-layout diffuse) must
    match the graph-path rollout_mesh at fire_rate=1 with the diffusion
    neighborhood at the model h (the reference's practical case)."""
    from sph_nca_tpu.models.surface import rollout_mesh_cells
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.utils.seeds import add_radial_seed

    x, nrm, g, h = sphere_scene(1200, 0.22)
    eng = build_cell_engine(np.asarray(x), h, pair_tables="float32")
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A0 = jnp.zeros((x.shape[0], 8))
    A0 = add_radial_seed(x, A0, x[0], 0.3)
    t0 = jax.vmap(orthogonalize)(nrm, jnp.ones_like(nrm))

    ref_A, ref_t, _ = rollout_mesh(
        params, cfg, g, g, A0, nrm, t0, jax.random.key(1), 4, h,
        fire_rate=1.0,
    )
    got_A, got_t, states = rollout_mesh_cells(
        params, cfg, eng, A0, nrm, t0, jax.random.key(1), 4, h,
        fire_rate=1.0, collect_all=True,
    )
    assert states.shape == (5, x.shape[0], 8)
    assert np.allclose(np.asarray(got_A), np.asarray(ref_A),
                       rtol=2e-3, atol=2e-3)
    # tangent fields agree where cells are alive (dead-slot tangents are
    # normalized garbage in both paths)
    alive = np.asarray(ref_A[:, 3]) > 0.1
    assert np.allclose(np.asarray(got_t)[alive], np.asarray(ref_t)[alive],
                       rtol=2e-3, atol=2e-3)


def test_mesh_rollout_dual_engine_general_h():
    """rollout_mesh_batched_dual: perception at the model h, diffusion
    at a DIFFERENT radius (the reference hard-codes diffuse h=0.1
    regardless of model h, nca.py:357) — must match the graph path with
    separate h / diffuse graphs at fire_rate=1. This is the general-h
    fast path cli/test.py uses for arbitrary checkpoints."""
    from sph_nca_tpu.models.surface import rollout_mesh_batched_dual
    from sph_nca_tpu.ops.bands import build_band_engine
    from sph_nca_tpu.utils.seeds import add_radial_seed

    h, hd = 0.22, 0.3  # model h != diffusion radius
    x, nrm, g, _ = sphere_scene(1200, h)
    dims_d = ops.default_dims(hd)
    mpc, k = ops.suggest_capacity(np.asarray(x), hd, dims_d)
    gd = ops.build_graph(x, hd, dims_d, max_per_cell=mpc, k=k)

    eng = build_band_engine(np.asarray(x), h, table_dtype="float32")
    eng_d = build_band_engine(np.asarray(x), hd, table_dtype="float32")
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A0 = jnp.zeros((x.shape[0], 8))
    A0 = add_radial_seed(x, A0, x[0], 0.3)
    t0 = jax.vmap(orthogonalize)(nrm, jnp.ones_like(nrm))

    ref_A, ref_t, _ = rollout_mesh(
        params, cfg, g, gd, A0, nrm, t0, jax.random.key(1), 4, h,
        fire_rate=1.0,
    )
    got_A, got_t, states = rollout_mesh_batched_dual(
        params, cfg, eng, eng_d, A0[None], nrm, t0[None],
        jax.random.key(1), 4, h, fire_rate=1.0, collect_all=True,
    )
    assert states.shape == (5, 1, x.shape[0], 8)
    assert np.allclose(np.asarray(got_A[0]), np.asarray(ref_A),
                       rtol=2e-3, atol=2e-3)
    alive = np.asarray(ref_A[:, 3]) > 0.1
    assert np.allclose(np.asarray(got_t[0])[alive],
                       np.asarray(ref_t)[alive], rtol=2e-3, atol=2e-3)


def test_diffuse_band_matches_graph(rng):
    """diffuse_band (the graph-free large-N tangent pre-diffusion,
    models/surface.py) matches the reference-shaped graph diffuse at
    the seeding radius 0.2 — reference nca.py:312-323 + test.py
    tangent consistency pass."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import fibonacci_sphere

    from sph_nca_tpu import ops
    from sph_nca_tpu.models.surface import (
        diffuse,
        diffuse_band,
        normalize,
        orthogonalize,
    )
    from sph_nca_tpu.ops.bands import build_band_engine

    x = fibonacci_sphere(2048)
    n = jnp.asarray(x / np.linalg.norm(x, axis=-1, keepdims=True))
    t = orthogonalize(
        n, normalize(jnp.asarray(rng.normal(size=(2048, 3)), jnp.float32))
    )
    A = jnp.asarray(rng.uniform(0, 1, (2048, 16)), jnp.float32)
    mpc, k = ops.suggest_capacity(x, 0.2, 10)
    g = ops.build_graph(jnp.asarray(x), 0.2, 10, max_per_cell=mpc, k=k)
    eng = build_band_engine(x, 0.2)
    o1 = diffuse(n, t, A, g, lerp_multiplier=0.0)
    o2 = diffuse_band(eng, n, t, A, lerp_multiplier=0.0)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-5)
