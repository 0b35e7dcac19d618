"""Precomputed pair-table kernels (build_cell_engine(pair_tables=...)):
parity with the recompute Pallas path on fwd / adjoint / mask.

The table kernels replace per-pair VPU recomputation with one MXU matmul
over stored mag*(xw-xb) factors (ops/pallas/pair_kernel.py table
kernels). f32 tables must agree with the recompute kernels elementwise;
bf16 tables quantize each pair weight to 8 mantissa bits, so their error
is bounded relative to the OPERATOR SCALE (rms of the output) — random
states are the adversarial case (the signed pair terms cancel, the
quantization noise doesn't). A spatially-constant field must still map
to ~0 exactly: the forward's rowsum correction is derived from the
quantized table (cells._blk_gsum_from_tables), which pins that mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.ops.pallas.pair_kernel import (
    fused_perception_pallas,
    mask_blur_pallas,
    perceive_cells,
)
from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import nca_step_cells

# max |err| <= RELTOL * rms(reference output)
RELTOL = {"float32": 1e-3, "bfloat16": 0.04}


def scenes(rng, dtype, n=250, dim=3, h=0.3, periodic=False):
    x = jnp.asarray(rng.uniform(-1, 1, (n, dim)).astype(np.float32))
    period = jnp.asarray([2.0] * dim) if periodic else None
    base = build_cell_engine(x, h, period=period)
    tab = build_cell_engine(x, h, period=period, pair_tables=dtype)
    return base, tab


def _close(a, b, dtype):
    a, b = np.asarray(a), np.asarray(b)
    scale = float(np.sqrt(np.mean(a * a))) + 1e-6
    return float(np.abs(a - b).max()) <= RELTOL[dtype] * scale


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("periodic", [False, True])
def test_table_forward_matches_recompute(rng, dtype, periodic):
    base, tab = scenes(rng, dtype, periodic=periodic)
    A = jnp.asarray(rng.normal(size=(250, 8)).astype(np.float32))
    S = base.scatter(A)

    ga_r, sm_r = fused_perception_pallas(base, S, use_alpha=True)
    ga_t, sm_t = fused_perception_pallas(tab, S, use_alpha=True)

    def back(eng, ga):
        return np.asarray(eng.gather_back(ga.reshape(*ga.shape[:2], -1)))

    assert _close(back(base, ga_r), back(tab, ga_t), dtype)
    real = np.asarray(base.vs > 0)
    assert _close(np.asarray(sm_r)[real], np.asarray(sm_t)[real], dtype)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_table_constant_field_cancels(rng, dtype):
    """grad(const) == 0 at f32-accumulation level, NOT table-quantization
    level — the property that makes bf16 tables usable on smooth states."""
    _, tab = scenes(rng, dtype)
    S = tab.scatter(jnp.full((250, 8), 1.7, jnp.float32))
    ga, _ = fused_perception_pallas(tab, S, use_alpha=True)
    flat = np.asarray(tab.gather_back(ga.reshape(*ga.shape[:2], -1)))
    assert np.abs(flat).max() < 1e-4  # vs O(0.05) without the gsum trick


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_table_adjoint_matches_recompute(rng, dtype):
    base, tab = scenes(rng, dtype, n=200)
    A = jnp.asarray(rng.normal(size=(200, 6)).astype(np.float32))
    S = base.scatter(A)
    W = jnp.asarray(rng.normal(size=(*S.shape, 3)).astype(np.float32))

    def grad_of(eng):
        def f(S):
            ga, _ = perceive_cells(eng, S, True)
            return jnp.sum(ga * W)
        return jax.grad(f)(S)

    assert _close(grad_of(base), grad_of(tab), dtype)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_table_adjoint_consistent_with_fd(rng, dtype):
    """The custom_vjp must differentiate the QUANTIZED operator (finite
    differences through the table forward), not the exact one."""
    _, tab = scenes(rng, dtype, n=120, h=0.35)
    A = jnp.asarray(rng.normal(size=(120, 4)).astype(np.float32))
    S = tab.scatter(A)
    # restrict the probe to REAL slots: pad slots compute garbage from
    # their PAD_POS phantom geometry (linear but path-dependent), and are
    # never read back by any consumer
    real = (tab.vs > 0).astype(jnp.float32)[..., None]
    W = jnp.asarray(rng.normal(size=(*S.shape, 3)).astype(np.float32))
    W = W * real[..., None]

    def f(S):
        ga, _ = perceive_cells(tab, S, True)
        return jnp.sum(ga * W)

    g = jax.grad(f)(S)
    V = jnp.asarray(rng.normal(size=S.shape).astype(np.float32))
    eps = 1e-2
    fd = (f(S + eps * V) - f(S - eps * V)) / (2 * eps)
    got = jnp.sum(g * V)
    assert np.isclose(float(fd), float(got), rtol=5e-3, atol=1e-2 * max(
        1.0, abs(float(fd))))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("use_alpha", [True, False])
def test_table_mask_blur_matches_recompute(rng, dtype, use_alpha):
    base, tab = scenes(rng, dtype)
    A = jnp.asarray(rng.normal(size=(250, 8)).astype(np.float32))
    S = base.scatter(A)
    sm_r = mask_blur_pallas(base, S, use_alpha=use_alpha)
    sm_t = mask_blur_pallas(tab, S, use_alpha=use_alpha)
    real = np.asarray(base.vs > 0)
    assert _close(np.asarray(sm_r)[real], np.asarray(sm_t)[real], dtype)


def test_table_full_step_matches(rng):
    """One full NCA step, f32 tables vs recompute path (fire_rate=1)."""
    n, h = 300, 0.25
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    base = build_cell_engine(x, h)
    tab = build_cell_engine(x, h, pair_tables="float32")
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A = jnp.asarray((rng.random((n, 8)) * 0.5).astype(np.float32))
    S = base.scatter(A)

    nS_r = nca_step_cells(params, cfg, base, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=True)
    nS_t = nca_step_cells(params, cfg, tab, S, jax.random.key(1), h,
                          fire_rate=1.0, use_pallas=True)
    assert np.allclose(
        np.asarray(base.gather_back(nS_r)),
        np.asarray(tab.gather_back(nS_t)),
        rtol=2e-3, atol=5e-4,
    )
