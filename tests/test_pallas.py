"""Pallas fused pair kernel: parity with the XLA cell engine + adjoint.

On CPU these run through the Pallas interpreter (interpret=True), so the
suite stays hermetic; the same code compiles with Mosaic on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.ops.pallas.pair_kernel import (
    fused_perception_pallas,
    gradient_adjoint_pallas,
    perceive_cells,
)
from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import nca_step_cells
from sph_nca_tpu.utils.geometry import grange


def scene(rng, n=300, dim=2, h=0.25, periodic=False):
    x = jnp.asarray(rng.uniform(-1, 1, (n, dim)).astype(np.float32))
    period = jnp.asarray([2.0] * dim) if periodic else None
    eng = build_cell_engine(x, h, period=period)
    return x, eng


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [False, True])
def test_fused_forward_matches_xla_engine(rng, dim, periodic):
    x, eng = scene(rng, 250, dim, periodic=periodic)
    A = jnp.asarray(rng.normal(size=(250, 8)).astype(np.float32))
    S = eng.scatter(A)

    ga_p, sm_p = fused_perception_pallas(eng, S, use_alpha=True)
    ga_x = eng.gradient(S)

    # compare in particle order — pad slots compute garbage in either
    # path (their PAD_POS phantom geometry) and are never read back
    def back(ga):
        flat = eng.gather_back(ga.reshape(*ga.shape[:2], -1))
        return np.asarray(flat)

    assert np.allclose(back(ga_p), back(ga_x), rtol=1e-3, atol=2e-3)
    # mask smoothing vs engine blur of binarized activity (real slots)
    mw = (eng.window(S)[..., 3] > 0.1).astype(jnp.float32)
    sm_x = jnp.einsum("cmw,cw->cm", eng.Tw, mw)
    real = np.asarray(eng.vs > 0)
    assert np.allclose(
        np.asarray(sm_p)[real], np.asarray(sm_x)[real], rtol=1e-4, atol=1e-5
    )


def test_adjoint_matches_autodiff_of_xla_engine(rng):
    x, eng = scene(rng, 200, 2)
    A = jnp.asarray(rng.normal(size=(200, 6)).astype(np.float32))
    S = eng.scatter(A)
    W = jnp.asarray(
        rng.normal(size=(*S.shape, 2)).astype(np.float32)
    )  # cotangent shape [C+1, M, F, D]

    # autodiff through the XLA engine gradient
    def loss_x(S):
        return jnp.sum(eng.gradient(S) * W)

    want = jax.grad(loss_x)(S)

    # custom_vjp through the pallas op
    def loss_p(S):
        ga, _ = perceive_cells(eng, S, True)
        return jnp.sum(ga * W)

    got = jax.grad(loss_p)(S)
    assert np.allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=2e-3
    )


def test_step_pallas_matches_step_xla(rng):
    m, h = 20, 0.2
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h)
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray((rng.random((x.shape[0], 8)) * 0.5).astype(np.float32))
    S = eng.scatter(A)

    nS_x = nca_step_cells(params, cfg, eng, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=False)
    nS_p = nca_step_cells(params, cfg, eng, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=True)
    # compare in particle order: pad slots may differ between paths (their
    # PAD_POS phantom geometry interacts with the window structure) and
    # are never read back
    assert np.allclose(
        np.asarray(eng.gather_back(nS_p)),
        np.asarray(eng.gather_back(nS_x)),
        rtol=1e-3, atol=1e-4,
    )


def test_step_pallas_no_alpha(rng):
    m, h = 14, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h)
    cfg = SPHNCAConfig(channels=8, hidden=16, use_alpha=False)
    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray(rng.random((x.shape[0], 8)).astype(np.float32))
    S = eng.scatter(A)
    nS_x = nca_step_cells(params, cfg, eng, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=False)
    nS_p = nca_step_cells(params, cfg, eng, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=True)
    assert np.allclose(
        np.asarray(eng.gather_back(nS_p)),
        np.asarray(eng.gather_back(nS_x)),
        rtol=1e-3, atol=1e-4,
    )
