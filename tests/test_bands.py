"""Band engine (ops/bands.py, the round-3 TPU throughput path):
oracle parity with the dense O(N^2) reference ops, layout roundtrips,
batched-lane op parity with the cell engine, the batched NCA step, and
autodiff.

The band engine covers ~80% of true pairs with curve-band windows (no
gather) and the rest with compacted far-group tables; results must be
bitwise-independent of that split — every test here compares against a
path that knows nothing about bands.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import nca_step_cells_batched
from sph_nca_tpu.ops import dense
from sph_nca_tpu.ops.bands import (
    BandEngine,
    blur_band,
    build_band_engine,
    divergence_band,
    gradient_band,
    mask_blur_band,
    perceive_band_batched,
)
from sph_nca_tpu.ops.batched import (
    batched_gather_back,
    batched_scatter,
    blur_batched,
    mask_blur_batched,
    perceive_cells_batched,
)
from sph_nca_tpu.ops.cells import build_cell_engine

N, F, B, H = 220, 8, 3, 0.3


def scene(rng, periodic=False, dtype="float32", block_rows=16, far_group=8):
    """Small blocks so the far structure is genuinely exercised."""
    x = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    period = jnp.asarray([2.0] * 3) if periodic else None
    eng = build_band_engine(
        x, H, period=period, block_rows=block_rows, far_group=far_group,
        table_dtype=dtype,
    )
    A = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    return x, eng, A


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = float(np.sqrt(np.mean(a * a))) + 1e-6
    return float(np.abs(a - b).max()) / scale


def test_far_structure_is_exercised(rng):
    _, eng, _ = scene(rng)
    assert len(eng.far_blocks) > 0
    assert sum(int(b.shape[0]) for b in eng.far_blocks) > 0


def test_scatter_roundtrip(rng):
    _, eng, A = scene(rng)
    SB = batched_scatter(eng, A)
    back = batched_gather_back(eng, SB, B)
    np.testing.assert_allclose(np.asarray(back), np.asarray(A))
    # single-sample engine methods too
    S = eng.scatter(A[0])
    np.testing.assert_allclose(np.asarray(eng.gather_back(S)),
                               np.asarray(A[0]))


@pytest.mark.smoke
@pytest.mark.parametrize("periodic", [False, True])
def test_volume_and_count_match_dense(rng, periodic):
    x, eng, _ = scene(rng, periodic)
    period = jnp.asarray([2.0] * 3) if periodic else None
    v_ref = dense.volume(x, H, period=period)
    v_got = eng.gather_back(eng.vs[..., None])[:, 0]
    assert rel_err(v_ref, v_got) < 1e-5
    c_ref = dense.count(x, H, period=period)
    c_got = eng.gather_back(eng.count()[..., None].astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(c_ref),
                                  np.asarray(c_got[:, 0]).astype(np.int32))
    # Shepard sum sigma sum_j W v_j == dense blur of ones (only ~1 when
    # density is uniform; these are random points)
    cons = eng.gather_back(eng.volume_consistency()[..., None])[:, 0]
    ref = dense.blur(x, v_ref, jnp.ones((N, 1)), H, period=period)[:, 0]
    assert rel_err(ref, cons) < 1e-5


@pytest.mark.parametrize("periodic", [False, True])
def test_gradient_matches_dense(rng, periodic):
    x, eng, A = scene(rng, periodic)
    period = jnp.asarray([2.0] * 3) if periodic else None
    v = dense.volume(x, H, period=period)
    ref = dense.gradient(x, v, A[0], H, period=period)  # [N, F, D]
    got = eng.gather_back(
        gradient_band(eng, eng.scatter(A[0])).reshape(
            eng.num_cells, eng.slots_per_cell, -1
        )
    ).reshape(N, F, 3)
    assert rel_err(ref, got) < 2e-5


@pytest.mark.parametrize("periodic", [False, True])
def test_blur_matches_dense(rng, periodic):
    x, eng, A = scene(rng, periodic)
    period = jnp.asarray([2.0] * 3) if periodic else None
    v = dense.volume(x, H, period=period)
    ref = dense.blur(x, v, A[0], H, period=period)
    got = eng.gather_back(blur_band(eng, eng.scatter(A[0])))
    assert rel_err(ref, got) < 2e-5


def test_divergence_matches_dense(rng):
    x, eng, _ = scene(rng)
    v = dense.volume(x, H)
    V = jnp.asarray(rng.normal(size=(N, F, 3)).astype(np.float32))
    ref = dense.divergence(x, v, V, H)  # [N, F]
    Vr = eng.scatter(V.reshape(N, F * 3)).reshape(
        eng.num_cells, eng.slots_per_cell, F, 3
    )
    got = eng.gather_back(divergence_band(eng, Vr))
    assert rel_err(ref, got) < 2e-5


def test_bf16_tables_close_to_f32(rng):
    x, eng32, A = scene(rng)
    _, eng16, _ = scene(np.random.default_rng(0), dtype="bfloat16")
    # rebuild bf16 on the SAME positions
    eng16 = build_band_engine(
        np.asarray(x), H, block_rows=16, far_group=8,
        table_dtype="bfloat16",
    )
    a = eng32.gather_back(gradient_band(eng32, eng32.scatter(A[0])).reshape(
        eng32.num_cells, eng32.slots_per_cell, -1))
    b16 = eng16.gather_back(gradient_band(eng16, eng16.scatter(A[0])).reshape(
        eng16.num_cells, eng16.slots_per_cell, -1))
    assert rel_err(a, b16) < 2e-2  # pair-level bf16 quantization
    # a constant field still has ~zero gradient (gsum from quantized tabs)
    const = jnp.ones((eng16.num_cells, eng16.slots_per_cell, 4))
    g = gradient_band(eng16, const)
    assert float(jnp.abs(g).max()) < 1e-3


@pytest.mark.parametrize("smoothing", ["wendlandC2", "wendlandC4"])
@pytest.mark.parametrize("table_dtype", ["float32", "bfloat16"])
def test_wendland_band_matches_dense(rng, smoothing, table_dtype):
    """Wendland kernels bake into the band tables (the tables are
    weight-agnostic); volume/gradient/blur parity vs the dense oracle
    with the same kernel (VERDICT r3 weak #6)."""
    x = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    eng = build_band_engine(
        np.asarray(x), H, block_rows=16, far_group=8,
        smoothing=smoothing, table_dtype=table_dtype,
    )
    # bf16: pair-level quantization; Wendland cores are O(1) where
    # poly6's is O(h^6), measured max-rel 2.4-2.9e-2 on this scene
    tol = 1e-5 if table_dtype == "float32" else 4e-2
    v_ref = dense.volume(x, H, smoothing=smoothing)
    v_got = eng.gather_back(eng.vs[..., None])[:, 0]
    assert rel_err(v_ref, v_got) < 1e-5  # volumes always f64->f32 build
    A = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ref_g = dense.gradient(x, v_ref, A, H)  # spiky grad, wendland volumes
    got_g = eng.gather_back(
        gradient_band(eng, eng.scatter(A)).reshape(
            eng.num_cells, eng.slots_per_cell, -1
        )
    ).reshape(N, F, 3)
    assert rel_err(ref_g, got_g) < tol
    ref_b = dense.blur(x, v_ref, A, H, smoothing=smoothing)
    got_b = eng.gather_back(blur_band(eng, eng.scatter(A)))
    assert rel_err(ref_b, got_b) < tol


def test_band_engine_rejects_unknown_kernel(rng):
    x = np.asarray(rng.uniform(-1, 1, (64, 3)), np.float32)
    with pytest.raises(ValueError):
        build_band_engine(x, H, smoothing="nope")


@pytest.mark.parametrize("periodic", [False, True])
def test_batched_perception_matches_cell_engine(rng, periodic):
    """perceive/mask-blur/blur dispatch: BandEngine == CellEngine."""
    x, eng, A = scene(rng, periodic)
    period = jnp.asarray([2.0] * 3) if periodic else None
    ceng = build_cell_engine(x, H, period=period, pair_tables="float32")

    SBb = batched_scatter(eng, A)
    SBc = batched_scatter(ceng, A)
    gb, smb = perceive_cells_batched(eng, SBb, B, use_alpha=True)
    gc, smc = perceive_cells_batched(ceng, SBc, B, use_alpha=True)
    # compare in particle order (layouts differ)
    d = 3
    gbp = batched_gather_back(eng, gb.reshape(*gb.shape[:2], d * B * F), B * d)
    gcp = batched_gather_back(ceng, gc.reshape(*gc.shape[:2], d * B * F), B * d)
    assert rel_err(gcp, gbp) < 2e-5
    smbp = batched_gather_back(eng, smb, B)
    smcp = batched_gather_back(ceng, smc, B)
    assert rel_err(smcp, smbp) < 2e-5

    mb = batched_gather_back(eng, mask_blur_batched(eng, SBb, B), B)
    mc = batched_gather_back(ceng, mask_blur_batched(ceng, SBc, B), B)
    assert rel_err(mc, mb) < 2e-5

    bb = batched_gather_back(eng, blur_batched(eng, SBb, B), B)
    bc = batched_gather_back(ceng, blur_batched(ceng, SBc, B), B)
    assert rel_err(bc, bb) < 2e-5


def test_batched_step_matches_cell_engine_fr1(rng):
    """fire_rate=1 removes RNG-layout dependence: the full batched NCA
    step must agree across engines in particle order."""
    x, eng, A = scene(rng)
    ceng = build_cell_engine(x, H, pair_tables="float32")
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    ob = nca_step_cells_batched(
        params, cfg, eng, batched_scatter(eng, A), B, jax.random.key(1), H,
        fire_rate=1.0,
    )
    oc = nca_step_cells_batched(
        params, cfg, ceng, batched_scatter(ceng, A), B, jax.random.key(1), H,
        fire_rate=1.0,
    )
    assert rel_err(batched_gather_back(ceng, oc, B),
                   batched_gather_back(eng, ob, B)) < 5e-5


def test_band_perception_grad(rng):
    """rev-vs-fwd autodiff consistency through band + far tables."""
    _, eng, A = scene(rng)

    def loss(AB):
        # ga only: the life-mask blur thresholds alpha (> 0.1), which is
        # discontinuous and breaks finite differences
        SB = batched_scatter(eng, AB)
        ga, _ = perceive_band_batched(eng, SB, B, use_alpha=True)
        return jnp.sum(ga**2) / ga.size

    g = jax.grad(loss)(A)
    rng2 = np.random.default_rng(3)
    v = jnp.asarray(rng2.normal(size=A.shape).astype(np.float32))
    _, jv = jax.jvp(loss, (A,), (v,))
    an = jnp.sum(g * v)
    assert abs(float(jv - an)) < 1e-4 * (abs(float(jv)) + 1e-6) + 1e-7
    eps = 1e-3
    fd = (loss(A + eps * v) - loss(A - eps * v)) / (2 * eps)
    assert abs(float(fd - an)) < 2e-2 * (abs(float(fd)) + 1e-6) + 1e-6


def test_default_block_rows_64(rng):
    """The production configuration (P=64, g=16) against dense."""
    x = jnp.asarray(rng.uniform(-1, 1, (500, 3)).astype(np.float32))
    eng = build_band_engine(x, H)
    assert isinstance(eng, BandEngine)
    v = dense.volume(x, H)
    A = jnp.asarray(rng.normal(size=(500, F)).astype(np.float32))
    ref = dense.gradient(x, v, A, H)
    got = eng.gather_back(gradient_band(eng, eng.scatter(A)).reshape(
        eng.num_cells, eng.slots_per_cell, -1)).reshape(500, F, 3)
    assert rel_err(ref, got) < 2e-5


def test_block_multiple_pads_evenly(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (100, 2)).astype(np.float32))
    eng = build_band_engine(x, H, block_rows=16, far_group=8,
                            block_multiple=8)
    assert eng.num_cells % 8 == 0
    v = dense.volume(x, H)
    A = jnp.asarray(rng.normal(size=(100, F)).astype(np.float32))
    ref = dense.gradient(x, v, A, H)
    got = eng.gather_back(gradient_band(eng, eng.scatter(A)).reshape(
        eng.num_cells, eng.slots_per_cell, -1)).reshape(100, F, 2)
    assert rel_err(ref, got) < 2e-5


def test_band_mesh_rollout_matches_cell_engine(rng):
    """rollout_mesh_batched on the band engine (fused diffusion riding
    the perception pass via perceive's ``extra`` lanes) == the same
    rollout on the cell engine (standalone diffusion blur) at
    fire_rate=1. Exercises the fused schedule incl. the first-step
    tangent select and the post-scan final diffusion."""
    from sph_nca_tpu.models.surface import (
        normalize,
        orthogonalize,
        rollout_mesh_batched,
    )

    x = rng.normal(size=(N, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-9
    x *= 0.8
    nrm = jnp.asarray(x / 0.8)
    beng = build_band_engine(jnp.asarray(x), H, block_rows=16)
    ceng = build_cell_engine(jnp.asarray(x), H, pair_tables="float32")
    assert len(beng.far_blocks) > 0  # the fused far path must be live
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    A0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    t0r = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    t0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)

    fa, ft = rollout_mesh_batched(
        params, cfg, beng, A0, nrm, t0, jax.random.key(1), 4, H,
        fire_rate=1.0,
    )
    ca, ct = rollout_mesh_batched(
        params, cfg, ceng, A0, nrm, t0, jax.random.key(1), 4, H,
        fire_rate=1.0,
    )
    assert rel_err(ca, fa) < 1e-4
    assert rel_err(ct, ft) < 1e-4


def test_bucket_cuts_dp_optimal():
    """_bucket_cuts minimizes padded area exactly and collapses to
    fewer buckets when free."""
    from sph_nca_tpu.ops.bands import _bucket_cuts

    # all equal widths -> one bucket, zero padding
    w = np.full(10, 7, np.int64)
    assert _bucket_cuts(w, 4) == [7]
    # zeros are ignored
    assert _bucket_cuts(np.array([0, 0, 5]), 4) == [5]
    assert _bucket_cuts(np.zeros(3, np.int64), 4) == []
    # two clusters, k=2: the optimal cut separates them
    w = np.array([1] * 50 + [100] * 2)
    assert _bucket_cuts(w, 2) == [1, 100]
    # k=1 must cover everything with the max
    assert _bucket_cuts(w, 1) == [100]
    # padded area of the DP <= any manual partition (spot check)
    w = np.array([3, 3, 5, 9, 9, 9, 20])
    cuts = _bucket_cuts(w, 2)
    def area(cuts):
        lo, tot = 0, 0
        for c in cuts:
            n = int(((w > lo) & (w <= c)).sum())
            tot += c * n
            lo = c
        return tot
    assert area(cuts) <= min(area([5, 20]), area([9, 20]), area([3, 20]))


def test_fire_mask_marginal_rate_across_engines(rng):
    """VERDICT r2 weak 6: the cell/band layouts draw the fire mask from
    a per-(slot, sample) stream rather than the graph path's
    per-particle stream — same Bernoulli(fire_rate) LAW, different
    stream. Check the law itself: across many step keys, the fraction
    of particles updated in one step matches fire_rate on BOTH engines
    (binomial 4-sigma bound), and the per-particle update rate is
    uniform (no slot-position bias)."""
    from sph_nca_tpu.models import nca_step
    from sph_nca_tpu.ops import (
        build_graph,
        default_dims,
        suggest_capacity,
    )

    x = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    eng = build_band_engine(x, H, block_rows=16)
    cfg = SPHNCAConfig(
        channels=F, hidden=16, normalize_perception=1.0 / H,
        use_alpha=False, fire_rate=0.5,
    )
    from sph_nca_tpu.models import init_params

    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray(rng.normal(size=(1, N, F)).astype(np.float32))
    SB = batched_scatter(eng, A)

    dims = default_dims(H)
    mpc, k = suggest_capacity(np.asarray(x), H, dims)
    g = build_graph(x, H, dims, max_per_cell=mpc, k=k)

    trials = 40
    rates = {"band": [], "graph": []}
    per_particle = {"band": np.zeros(N), "graph": np.zeros(N)}
    for t in range(trials):
        key = jax.random.key(100 + t)
        nb_ = nca_step_cells_batched(params, cfg, eng, SB, 1, key, H)
        ob = np.asarray(batched_gather_back(eng, nb_, 1))[0]
        changed_b = np.any(ob != np.asarray(A[0]), axis=-1)
        og = np.asarray(nca_step(params, cfg, g, A[0], key, H))
        changed_g = np.any(og != np.asarray(A[0]), axis=-1)
        rates["band"].append(changed_b.mean())
        rates["graph"].append(changed_g.mean())
        per_particle["band"] += changed_b
        per_particle["graph"] += changed_g
    # marginal rate: binomial(N*trials, 0.5) 4-sigma bound
    sig = 0.5 / np.sqrt(N * trials)
    for name in ("band", "graph"):
        assert abs(np.mean(rates[name]) - 0.5) < 4 * sig, (
            name, np.mean(rates[name]))
    # per-particle rate uniform: every particle fires 0.5 +- 4 sigma
    sig_p = 0.5 / np.sqrt(trials)
    for name in ("band", "graph"):
        pp = per_particle[name] / trials
        assert np.abs(pp - 0.5).max() < 4.5 * sig_p, name
    # and the two engines' mean rates agree within joint noise
    assert abs(np.mean(rates["band"]) - np.mean(rates["graph"])) < 8 * sig
