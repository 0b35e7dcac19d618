"""Batched-lane engine ops (ops/batched.py, the TPU throughput path):
per-sample parity with the unbatched cell paths, autodiff, and the
batched NCA step/rollout.

The batched layout packs B same-geometry rollouts into the lane
dimension (SB [C, M, B*F]); every op must equal the unbatched op applied
to each sample independently. All batched ops are pure XLA, so parity
bounds are accumulation-order-level (~1e-5 relative), not kernel-level.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import (
    nca_step_cells,
    nca_step_cells_batched,
    rollout_cells,
    rollout_cells_batched,
)
from sph_nca_tpu.ops.batched import (
    batched_gather_back,
    batched_scatter,
    blur_batched,
    mask_blur_batched,
    perceive_cells_batched,
)
from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.ops.pallas.pair_kernel import (
    fused_perception_pallas,
    mask_blur_pallas,
)

N, F, B, H = 220, 8, 3, 0.3


def scene(rng, periodic=False, dtype="float32"):
    x = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    period = jnp.asarray([2.0] * 3) if periodic else None
    eng = build_cell_engine(x, H, period=period, pair_tables=dtype)
    A = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    return eng, A


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = float(np.sqrt(np.mean(a * a))) + 1e-6
    return float(np.abs(a - b).max()) / scale


def test_scatter_roundtrip(rng):
    eng, A = scene(rng)
    SB = batched_scatter(eng, A)
    back = batched_gather_back(eng, SB, B)
    np.testing.assert_allclose(np.asarray(back), np.asarray(A))


@pytest.mark.parametrize("periodic", [False, True])
def test_perception_matches_unbatched(rng, periodic):
    eng, A = scene(rng, periodic)
    SB = batched_scatter(eng, A)
    gaB, smB = perceive_cells_batched(eng, SB, B, use_alpha=True)
    c, m, d = eng.xs.shape
    gaB = gaB.reshape(c, m, d, B, F)
    for i in range(B):
        S = eng.scatter(A[i])
        ga_r, sm_r = fused_perception_pallas(eng, S, use_alpha=True)
        # fused_perception_pallas returns [C, M, F, D]; batched is d-major
        assert rel_err(ga_r, jnp.swapaxes(gaB[:, :, :, i], 2, 3)) < 2e-5
        assert rel_err(sm_r, smB[..., i]) < 2e-5


def test_mask_blur_matches_unbatched(rng):
    eng, A = scene(rng)
    SB = batched_scatter(eng, A)
    smB = mask_blur_batched(eng, SB, B, use_alpha=True)
    for i in range(B):
        S = eng.scatter(A[i])
        sm_r = mask_blur_pallas(eng, S, use_alpha=True)
        assert rel_err(sm_r, smB[..., i]) < 2e-5


def test_blur_batched_matches_engine_blur(rng):
    eng, A = scene(rng)
    SB = batched_scatter(eng, A)
    out = batched_gather_back(eng, blur_batched(eng, SB, B), B)
    for i in range(B):
        # compare in particle space: pad-slot outputs are don't-care
        # (no dummy row — see ops/cells.py layout comment)
        ref = eng.gather_back(eng.blur(eng.scatter(A[i])))
        assert rel_err(ref, out[i]) < 2e-5


def test_batched_step_matches_unbatched_fr1(rng):
    """fire_rate=1 removes RNG: the batched step must equal per-sample
    nca_step_cells (which routes through the same tables)."""
    eng, A = scene(rng)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    SB = batched_scatter(eng, A)
    outB = nca_step_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(1), H, fire_rate=1.0
    )
    outB = batched_gather_back(eng, outB, B)
    for i in range(B):
        S = eng.scatter(A[i])
        out = nca_step_cells(
            params, cfg, eng, S, jax.random.key(1), H, fire_rate=1.0
        )
        assert rel_err(eng.gather_back(out), outB[i]) < 5e-5


def test_batched_rollout_runs_and_freezes(rng):
    """Per-sample n_steps freezes finished samples exactly."""
    eng, A = scene(rng)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    SB = batched_scatter(eng, A)
    n_steps = jnp.asarray([1, 3, 3])
    out = rollout_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(2), 3, H,
        n_steps=n_steps, fire_rate=1.0,
    )
    full = rollout_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(2), 1, H, fire_rate=1.0,
    )
    got = batched_gather_back(eng, out.final, B)
    one = batched_gather_back(eng, full.final, B)
    # sample 0 stopped after 1 step == the 1-step rollout
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(one[0]), rtol=1e-6, atol=1e-7
    )
    # samples with more steps differ from the 1-step state
    assert np.abs(np.asarray(got[1] - one[1])).max() > 1e-4


def test_batched_perception_grad(rng):
    """Autodiff flows through the batched tables (pure XLA): finite
    differences on a scalar loss."""
    eng, A = scene(rng)

    def loss(AB):
        SB = batched_scatter(eng, AB)
        ga, _ = perceive_cells_batched(eng, SB, B, use_alpha=True)
        return jnp.sum(ga**2) / ga.size

    g = jax.grad(loss)(A)
    rng2 = np.random.default_rng(3)
    v = jnp.asarray(rng2.normal(size=A.shape).astype(np.float32))
    # forward-mode reference (an f32 finite difference is noise-limited
    # at ~5e-3 relative here); rev-vs-fwd consistency catches vjp bugs
    _, jv = jax.jvp(loss, (A,), (v,))
    an = jnp.sum(g * v)
    assert abs(float(jv - an)) < 1e-4 * (abs(float(jv)) + 1e-6) + 1e-7
    # and a coarse FD sanity bound
    eps = 1e-3
    fd = (loss(A + eps * v) - loss(A - eps * v)) / (2 * eps)
    assert abs(float(fd - an)) < 2e-2 * (abs(float(fd)) + 1e-6) + 1e-6


def test_batched_mesh_rollout_matches_per_sample(rng):
    """rollout_mesh_batched == rollout_mesh_cells per sample at
    fire_rate=1 (tangent-projected perception + tangent diffusion on
    the batched-lane engine)."""
    from sph_nca_tpu.models.surface import (
        normalize,
        orthogonalize,
        rollout_mesh_batched,
        rollout_mesh_cells,
    )

    n_pts = 200
    # points on a sphere with outward normals
    x = rng.normal(size=(n_pts, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-9
    x *= 0.8
    nrm = jnp.asarray(x / 0.8)
    eng = build_cell_engine(jnp.asarray(x), H, pair_tables="float32")
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    Bm = 2
    A0 = jnp.asarray(rng.normal(size=(Bm, n_pts, F)).astype(np.float32))
    t0r = jnp.asarray(rng.normal(size=(Bm, n_pts, 3)).astype(np.float32))
    t0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)

    fa, ft = rollout_mesh_batched(
        params, cfg, eng, A0, nrm, t0, jax.random.key(1), 3, H,
        fire_rate=1.0,
    )
    for i in range(Bm):
        ra, rt, _ = rollout_mesh_cells(
            params, cfg, eng, A0[i], nrm, t0[i], jax.random.key(1), 3, H,
            fire_rate=1.0,
        )
        assert rel_err(ra, fa[i]) < 1e-4
        assert rel_err(rt, ft[i]) < 1e-4


def test_block_chunked_perception_matches(rng):
    """block_chunks (the large-N memory bound) must not change results."""
    eng, A = scene(rng)
    cfg = SPHNCAConfig(channels=F, hidden=32, normalize_perception=1.0 / H)
    params = init_params(jax.random.key(0), cfg)
    SB = batched_scatter(eng, A)
    a = nca_step_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(1), H, fire_rate=1.0
    )
    bb = nca_step_cells_batched(
        params, cfg, eng, SB, B, jax.random.key(1), H, fire_rate=1.0,
        block_chunks=2,
    )
    assert rel_err(batched_gather_back(eng, a, B),
                   batched_gather_back(eng, bb, B)) < 1e-5


def test_sublane_mlp_matches_blockdiag(rng):
    """SPH_NCA_MLP_IMPL=sublane computes the same update as blockdiag
    (shared 1x-FLOP weights vs the block-diagonal lane expansion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.cell_step import _update_core

    B, F, rows = 4, 8, 96
    for rule in ("gated", "orig"):
        cfg = SPHNCAConfig(channels=F, hidden=32, update_rule=rule,
                           normalize_perception=4.0)
        params = init_params(jax.random.key(0), cfg)
        SB2 = jnp.asarray(rng.normal(size=(rows, B * F)).astype(np.float32))
        gaB = jnp.asarray(
            rng.normal(size=(rows, 3 * B * F)).astype(np.float32)
        )
        a = _update_core(params, cfg, SB2, gaB, B, F, jax.random.key(1),
                         0.25, 1.0, None, mlp_impl="blockdiag")
        s = _update_core(params, cfg, SB2, gaB, B, F, jax.random.key(1),
                         0.25, 1.0, None, mlp_impl="sublane")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(s), rtol=2e-5, atol=2e-5
        )
