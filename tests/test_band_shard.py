"""Halo-exchange sharding of the band engine (parallel/band_shard.py):
sharded == unsharded on a virtual 8-device CPU mesh — perception,
full step, scan rollout, and BPTT gradients — plus the static comm
accounting. The exchange under test is the ppermute boundary halo
(band windows) + export-compacted all_gather (far groups); the oracle
is the single-device band path, which itself is pinned against the
dense O(N^2) reference ops in test_bands.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import nca_step_cells_batched
from sph_nca_tpu.ops.bands import build_band_engine, perceive_band_batched
from sph_nca_tpu.ops.batched import batched_scatter
from sph_nca_tpu.parallel import make_mesh
from sph_nca_tpu.parallel.band_shard import (
    comm_bytes_per_pass,
    perceive_band_sharded,
    rollout_band_sharded,
    shard_band_engine,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N, F, B, H, K = 220, 8, 3, 0.3, 4


def scene(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    eng = build_band_engine(
        x, H, block_rows=16, table_dtype="float32", block_multiple=K
    )
    assert eng.num_cells % K == 0
    assert len(eng.far_blocks) > 0  # the halo path must be live
    A = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    return eng, A


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = float(np.sqrt(np.mean(a * a))) + 1e-6
    return float(np.abs(a - b).max()) / scale


def shard_setup(rng):
    eng, A = scene(rng)
    shards, static = shard_band_engine(eng, K)
    mesh = make_mesh(particle=K)
    SB = batched_scatter(eng, A)
    return eng, A, shards, static, mesh, SB


def test_sharded_perception_matches_global(rng):
    eng, A, shards, static, mesh, SB = shard_setup(rng)
    ga_ref, sm_ref = perceive_band_batched(eng, SB, B, True)

    from jax.sharding import PartitionSpec as P

    from sph_nca_tpu.parallel.mesh import PARTICLE_AXIS

    S = shards.blocks_per_shard
    Pr = static.P
    X = SB.reshape(K, S, Pr, B * F)
    specs = jax.tree.map(lambda _: P(PARTICLE_AXIS), shards)

    def body(loc, Xs):
        loc = jax.tree.map(lambda a: a[0], loc)
        ga, sm = perceive_band_sharded(loc, static, Xs[0], B, True)
        return ga[None], sm[None]

    ga, sm = jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P(PARTICLE_AXIS)),
        out_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS)), check_vma=False,
    )(shards, X)
    assert rel_err(ga_ref, ga.reshape(ga_ref.shape)) < 1e-5
    assert rel_err(sm_ref, sm.reshape(sm_ref.shape)) < 1e-5


def test_sharded_perception_extra_lanes(rng):
    """The fused blur-extra lanes (surface diffusion) ride the sharded
    far exchange too."""
    eng, A, shards, static, mesh, SB = shard_setup(rng)
    ke = 4
    extra = jnp.asarray(
        np.random.default_rng(7).normal(
            size=(eng.num_cells, eng.slots_per_cell, ke)
        ).astype(np.float32)
    )
    ga_ref, sm_ref, eb_ref = perceive_band_batched(
        eng, SB, B, True, extra=extra
    )

    from jax.sharding import PartitionSpec as P

    from sph_nca_tpu.parallel.mesh import PARTICLE_AXIS

    S = shards.blocks_per_shard
    Pr = static.P
    X = SB.reshape(K, S, Pr, B * F)
    E = extra.reshape(K, S, Pr, ke)
    specs = jax.tree.map(lambda _: P(PARTICLE_AXIS), shards)

    def body(loc, Xs, Es):
        loc = jax.tree.map(lambda a: a[0], loc)
        ga, sm, eb = perceive_band_sharded(
            loc, static, Xs[0], B, True, extra=Es[0]
        )
        return ga[None], sm[None], eb[None]

    ga, sm, eb = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(PARTICLE_AXIS), P(PARTICLE_AXIS)),
        out_specs=(P(PARTICLE_AXIS),) * 3, check_vma=False,
    )(shards, X, E)
    assert rel_err(ga_ref, ga.reshape(ga_ref.shape)) < 1e-5
    assert rel_err(sm_ref, sm.reshape(sm_ref.shape)) < 1e-5
    assert rel_err(eb_ref, eb.reshape(eb_ref.shape)) < 1e-5


def test_sharded_rollout_matches_global_fr1(rng):
    eng, A, shards, static, mesh, SB = shard_setup(rng)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)

    from sph_nca_tpu.models.cell_step import rollout_cells_batched

    ref = rollout_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(1), 3, H, fire_rate=1.0,
        remat=False,
    ).final
    got = rollout_band_sharded(
        params, cfg, shards, static, mesh, SB, B, jax.random.key(1), 3, H,
        fire_rate=1.0, remat=False,
    )
    assert rel_err(ref, got.reshape(ref.shape)) < 1e-4


def test_sharded_rollout_grads_match_fr1(rng):
    """BPTT through the halo collectives (ppermute/all_gather
    transposes) == global BPTT."""
    eng, A, shards, static, mesh, SB = shard_setup(rng)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)

    from sph_nca_tpu.models.cell_step import rollout_cells_batched

    def loss_ref(p, S0):
        out = rollout_cells_batched(
            p, cfg, eng, S0, B, jax.random.key(1), 2, H, fire_rate=1.0,
            remat=False,
        ).final
        return jnp.sum(jnp.tanh(out))

    def loss_sh(p, S0):
        out = rollout_band_sharded(
            p, cfg, shards, static, mesh, S0, B, jax.random.key(1), 2, H,
            fire_rate=1.0, remat=False,
        )
        return jnp.sum(jnp.tanh(out))

    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, SB)
    ls, gs = jax.value_and_grad(loss_sh, argnums=(0, 1))(params, SB)
    assert abs(float(lr - ls)) < 1e-3 * (abs(float(lr)) + 1.0)
    for a, b in zip(jax.tree.leaves(gr[0]), jax.tree.leaves(gs[0])):
        assert rel_err(a, b) < 1e-3
    assert rel_err(gr[1], gs[1].reshape(gr[1].shape)) < 1e-3


@pytest.mark.smoke
def test_comm_accounting(rng):
    """The export halo is a small fraction of the state: the whole point
    of the boundary exchange vs the all_gather-the-state fallback."""
    eng, _ = scene(rng)
    shards, static = shard_band_engine(eng, K)
    acc = comm_bytes_per_pass(shards, static, lanes=B * F, itemsize=4)
    # RANDOM points are the far exchange's worst case (no curve
    # locality); the invariant is bytes-vs-state, not the padded
    # sent-row fraction (which can exceed 1.0 here — real geometries
    # measure 13-32%, SCALING.md)
    assert acc["allgather_bytes"] < acc["full_state_bytes"]
    assert acc["ppermute_bytes"] == 2 * static.P * B * F * 4
    # the all_gather-mode export list is bounded by the group count
    sh_a, st_a = shard_band_engine(eng, K, halo="allgather")
    acc_a = comm_bytes_per_pass(sh_a, st_a, lanes=B * F, itemsize=4)
    assert acc_a["export_fraction"] < 1.0


def test_sharded_mesh_rollout_matches_global_fr1(rng):
    """The halo-sharded SURFACE rollout (tangent projection + fused
    diffusion through the sharded extra lanes) == the single-device
    fused mesh rollout at fire_rate=1 — the flagship bench
    configuration, multi-chip."""
    from sph_nca_tpu.models.surface import (
        _diffuse_td,
        normal_components,
        normalize,
        orthogonalize,
        rollout_mesh_batched,
    )
    from sph_nca_tpu.ops.batched import batched_gather_back, batched_scatter
    from sph_nca_tpu.parallel.band_shard import rollout_mesh_band_sharded

    x = rng.normal(size=(N, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-9
    x *= 0.8
    nrm = jnp.asarray(x / 0.8)
    eng = build_band_engine(
        jnp.asarray(x), H, block_rows=16, table_dtype="float32",
        block_multiple=K,
    )
    shards, static = shard_band_engine(eng, K)
    mesh = make_mesh(particle=K)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    A0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    t0r = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    t0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)

    ref_A, ref_t = rollout_mesh_batched(
        params, cfg, eng, A0, nrm, t0, jax.random.key(1), 3, H,
        fire_rate=1.0,
    )

    SB0 = batched_scatter(eng, A0)
    nc = eng.scatter(nrm)
    rows = eng.num_cells * eng.slots_per_cell
    tB0 = batched_scatter(eng, t0).reshape(rows, B, 3)
    fS, ftd = rollout_mesh_band_sharded(
        params, cfg, shards, static, mesh, SB0, nc, tB0, B,
        jax.random.key(1), 3, H, fire_rate=1.0,
    )
    got_A = batched_gather_back(eng, fS, B)
    # epilogue: T_K = diffuse(A_K, T_{K-1}) on the global engine
    nd = normal_components(nc)
    final_td = _diffuse_td(eng, nd, ftd, fS, B)
    ft = jnp.stack(final_td, axis=-1).reshape(
        eng.num_cells, eng.slots_per_cell, B * 3
    )
    got_t = batched_gather_back(eng, ft, B)
    assert rel_err(ref_A, got_A) < 1e-4
    alive = np.asarray(ref_A[..., 3]) > 0.1
    assert rel_err(np.asarray(ref_t)[alive], np.asarray(got_t)[alive]) < 1e-3


def test_allgather_mode_matches_targeted(rng):
    """Both far-exchange modes produce identical sharded perception
    (targeted is the default; allgather is the round-3 exchange)."""
    eng, A = scene(rng)
    sh_t, st_t = shard_band_engine(eng, K, halo="targeted")
    sh_a, st_a = shard_band_engine(eng, K, halo="allgather")
    assert st_t.deltas and not st_a.deltas
    mesh = make_mesh(particle=K)
    SB = batched_scatter(eng, A)

    from jax.sharding import PartitionSpec as P

    from sph_nca_tpu.parallel.mesh import PARTICLE_AXIS

    Pr = st_t.P
    S = sh_t.blocks_per_shard
    X = SB.reshape(K, S, Pr, B * F)

    def run(shards, static):
        specs = jax.tree.map(lambda _: P(PARTICLE_AXIS), shards)

        def body(loc, Xs):
            loc = jax.tree.map(lambda a: a[0], loc)
            ga, sm = perceive_band_sharded(loc, static, Xs[0], B, True)
            return ga[None], sm[None]

        return jax.shard_map(
            body, mesh=mesh, in_specs=(specs, P(PARTICLE_AXIS)),
            out_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS)),
            check_vma=False,
        )(shards, X)

    ga_t, sm_t = run(sh_t, st_t)
    ga_a, sm_a = run(sh_a, st_a)
    np.testing.assert_allclose(np.asarray(ga_t), np.asarray(ga_a),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm_t), np.asarray(sm_a),
                               rtol=1e-6, atol=1e-6)
    # targeted must not move MORE far rows than the all_gather delivers
    acc_t = comm_bytes_per_pass(sh_t, st_t, lanes=B * F, itemsize=4)
    acc_a = comm_bytes_per_pass(sh_a, st_a, lanes=B * F, itemsize=4)
    assert acc_t["mode"] == "targeted" and acc_a["mode"] == "allgather"
    assert acc_t["allgather_bytes"] <= acc_a["allgather_bytes"]
