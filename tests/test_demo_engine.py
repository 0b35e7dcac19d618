"""Cross-check: the independent numpy backend vs the JAX engine.

This is the role the reference's JS demo played (SURVEY.md §4: "the JS
demo is an independent second implementation of the forward path, which
served as a de-facto cross-check of the math").
"""

import numpy as np
import jax
import jax.numpy as jnp

from sph_nca_tpu import ops
from sph_nca_tpu.demo.engine import NumpyEngine
from sph_nca_tpu.models import SPHNCAConfig, init_params, nca_step
from sph_nca_tpu.models.nca import apply_mlp
from sph_nca_tpu.utils.geometry import grange


def setup(n_side=20, h=0.2):
    x = grange((n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    eng = NumpyEngine(
        np.asarray(x),
        {k_: np.asarray(v) for k_, v in params._asdict().items()},
        h=h,
        channels=cfg.channels,
        normalize_perception=cfg.normalize_perception,
    )
    return x, cfg, params, g, eng, h


def test_volume_and_ops_match():
    x, cfg, params, g, eng, h = setup()
    assert np.allclose(eng.v, np.asarray(g.v), rtol=1e-4)

    rng = np.random.default_rng(0)
    A = rng.normal(size=(x.shape[0], 8)).astype(np.float32)
    from sph_nca_tpu.ops.neighbor_ops import graph_blur, graph_gradient

    assert np.allclose(
        eng.blur(A), np.asarray(graph_blur(g, jnp.asarray(A))),
        rtol=1e-3, atol=1e-4,
    )
    assert np.allclose(
        eng.gradient(A), np.asarray(graph_gradient(g, jnp.asarray(A))),
        rtol=1e-3, atol=5e-3,
    )


def test_deterministic_step_matches_jax():
    """With fire_rate=1 (no randomness) a full NCA step must agree."""
    x, cfg, params, g, eng, h = setup()
    rng = np.random.default_rng(1)
    A = (rng.random((x.shape[0], 8)) * 0.5).astype(np.float32)

    nA_jax = np.asarray(
        nca_step(params, cfg, g, jnp.asarray(A), jax.random.key(5), h,
                 fire_rate=1.0)
    )
    nA_np = eng.step(A.copy(), fire_rate=1.0)
    assert np.allclose(nA_np, nA_jax, rtol=1e-3, atol=1e-4)


def test_wendland_volume_and_blur_match():
    """The demo backend honors cfg.smoothing (Wendland-trained models
    must not silently render through poly6)."""
    h = 0.2
    x = grange((20, 20), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    cfg = SPHNCAConfig(channels=8, hidden=32, normalize_perception=1.0 / h,
                       smoothing="wendlandC2")
    params = init_params(jax.random.key(0), cfg)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k,
                        smoothing="wendlandC2")
    eng = NumpyEngine(
        np.asarray(x),
        {k_: np.asarray(v) for k_, v in params._asdict().items()},
        h=h,
        channels=cfg.channels,
        normalize_perception=cfg.normalize_perception,
        smoothing="wendlandC2",
    )
    assert np.allclose(eng.v, np.asarray(g.v), rtol=1e-4)
    rng = np.random.default_rng(0)
    A = rng.normal(size=(x.shape[0], 8)).astype(np.float32)
    from sph_nca_tpu.ops.neighbor_ops import graph_blur

    assert np.allclose(
        eng.blur(A), np.asarray(graph_blur(g, jnp.asarray(A))),
        rtol=1e-3, atol=1e-4,
    )
    # and it genuinely differs from the poly6 weighting
    eng_p6 = NumpyEngine(
        np.asarray(x),
        {k_: np.asarray(v) for k_, v in params._asdict().items()},
        h=h,
        channels=cfg.channels,
        normalize_perception=cfg.normalize_perception,
    )
    assert not np.allclose(eng.v, eng_p6.v, rtol=1e-3)


def test_multi_step_trajectory_stays_close():
    """5 deterministic steps: independent implementations stay within
    float tolerance (errors compound, so tolerance grows)."""
    x, cfg, params, g, eng, h = setup()
    rng = np.random.default_rng(2)
    A = (rng.random((x.shape[0], 8)) * 0.5).astype(np.float32)
    A_jax = jnp.asarray(A)
    A_np = A.copy()
    for t in range(5):
        A_jax = nca_step(params, cfg, g, A_jax, jax.random.key(t), h,
                         fire_rate=1.0)
        A_np = eng.step(A_np, fire_rate=1.0)
    assert np.allclose(A_np, np.asarray(A_jax), rtol=1e-2, atol=1e-3)
