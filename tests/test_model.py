"""SPHNCA model tests: shapes, update rules, life mask, golden weights."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu import ops
from sph_nca_tpu.models import (
    MLPParams,
    SPHNCAConfig,
    apply_mlp,
    init_params,
    life_mask,
    nca_step,
    num_params,
    to_rgba,
)
from sph_nca_tpu.utils.geometry import grange

REF_WEIGHTS = "/root/reference/docs/weights"


def small_scene(n_side=24, h=0.15):
    x = grange((n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    return x, g, h


def test_param_count_matches_reference():
    """48 -> 256 -> 33 gated MLP = 21,025 params (abstract Fig.2, nca.py:50-54)."""
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    assert p.w1.shape == (48, 256)
    assert p.w2.shape == (256, 33)
    assert num_params(p) == 48 * 256 + 256 + 256 * 33 + 33


def test_orig_rule_zero_init_is_identity_when_masked():
    """'orig' zero-inits the last layer (nca.py:56-58) so dA == 0 and the
    step is identity up to the life mask."""
    x, g, h = small_scene()
    cfg = SPHNCAConfig(update_rule="orig", use_alpha=False)
    p = init_params(jax.random.key(0), cfg)
    A = jax.random.uniform(jax.random.key(1), (x.shape[0], cfg.channels))
    nA = nca_step(p, cfg, g, A, jax.random.key(2), h)
    # with use_alpha=False, the life mask is all-true (activity == 1)
    assert np.allclose(np.asarray(nA), np.asarray(A), atol=1e-6)


@pytest.mark.smoke
def test_step_shapes_and_fire_rate_zero_freezes_state():
    x, g, h = small_scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A = jax.random.uniform(jax.random.key(1), (x.shape[0], cfg.channels))
    nA = nca_step(p, cfg, g, A, jax.random.key(2), h, fire_rate=1e-9)
    # fire_rate ~ 0: no cell updates, but the life mask still applies
    act = np.asarray(A[..., 3])
    alive = np.asarray(life_mask(g, jnp.asarray(act)))
    expected = np.asarray(A) * alive[:, None]
    assert np.allclose(np.asarray(nA), expected, atol=1e-6)


def test_dead_everywhere_stays_dead():
    """All-zero state has no alive cells -> remains zero (alive masking)."""
    x, g, h = small_scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A = jnp.zeros((x.shape[0], cfg.channels))
    nA = nca_step(p, cfg, g, A, jax.random.key(2), h, fire_rate=1.0)
    assert np.allclose(np.asarray(nA), 0.0, atol=1e-7)


def test_gated_update_rule_math():
    """nA = A*sig(dA[:C]) + tanh(dA[C:2C])*sig(dA[-1:]) (nca.py:102-106)."""
    cfg = SPHNCAConfig(channels=4, hidden=8)
    x, g, h = small_scene(12, 0.3)
    p = init_params(jax.random.key(0), cfg)
    A = jax.random.normal(jax.random.key(1), (x.shape[0], 4)) * 0.1 + 0.5
    # fire_rate=1 and use_alpha=False isolates the update formula
    cfg = SPHNCAConfig(channels=4, hidden=8, use_alpha=False)
    nA = nca_step(p, cfg, g, A, jax.random.key(2), h, fire_rate=1.0)

    from sph_nca_tpu.models.nca import perceive

    y = perceive(cfg, g, A, h)
    dA = apply_mlp(p, y)
    want = np.asarray(A) * jax.nn.sigmoid(dA[:, :4]) + np.tanh(
        dA[:, 4:8]
    ) * jax.nn.sigmoid(dA[:, -1:])
    assert np.allclose(np.asarray(nA), np.asarray(want), atol=1e-5)


def test_perception_normalization_scale():
    """normalize_perception k rescales gA by h*k (nca.py:65-69)."""
    x, g, h = small_scene()
    cfg0 = SPHNCAConfig(normalize_perception=-1.0)
    cfg1 = SPHNCAConfig(normalize_perception=2.0 / h)

    from sph_nca_tpu.models.nca import perceive

    A = jax.random.normal(jax.random.key(1), (x.shape[0], 16))
    y0 = perceive(cfg0, g, A, h)
    y1 = perceive(cfg1, g, A, h)
    # first C columns (A) unchanged; gA columns scaled by h*k = 2
    assert np.allclose(np.asarray(y1[:, :16]), np.asarray(y0[:, :16]))
    assert np.allclose(
        np.asarray(y1[:, 16:]), 2.0 * np.asarray(y0[:, 16:]), rtol=1e-5
    )


def test_to_rgba():
    A = jnp.asarray(np.random.default_rng(0).normal(size=(10, 16)).astype(np.float32))
    rgba = np.asarray(to_rgba(A))
    assert rgba.shape == (10, 4)
    assert np.allclose(rgba[:, :3], np.asarray(A)[:, :3])
    assert np.allclose(rgba[:, 3], np.asarray(A)[:, 3])
    rgba_noalpha = np.asarray(to_rgba(A, use_alpha=False))
    assert np.allclose(rgba_noalpha[:, 3], 1.0)


@pytest.mark.skipif(
    not os.path.exists(f"{REF_WEIGHTS}/gecko.json"),
    reason="reference weights not available",
)
def test_golden_weights_rollout_produces_texture():
    """Load reference-trained weights (docs/weights/gecko.json) and verify a
    deterministic-ish rollout grows structure from the seed: the alive
    region must expand and produce non-trivial rgb variation."""
    from sph_nca_tpu.io import load_weights_json
    from sph_nca_tpu.models import rollout_states
    from sph_nca_tpu.utils.seeds import plane_seed

    m = load_weights_json(f"{REF_WEIGHTS}/gecko.json")
    n_side = 48
    x = grange(
        (n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])
    ).reshape(-1, 2)
    dims = ops.default_dims(m.h)
    mpc, k = ops.suggest_capacity(np.asarray(x), m.h, dims)
    g = ops.build_graph(x, m.h, dims, max_per_cell=mpc, k=k)

    A0 = plane_seed(
        x, m.cfg.channels, gmin=(-1.0, -1.0), gsize=(2.0, 2.0), radius=m.h
    )
    states = rollout_states(
        m.params, m.cfg, g, A0, jax.random.key(0), 64, m.h
    )
    final = np.asarray(states[-1])
    assert np.all(np.isfinite(final))
    alive0 = (np.asarray(A0)[:, 3] > 0.1).sum()
    alive1 = (final[:, 3] > 0.1).sum()
    assert alive1 > alive0 * 2, "alive region should grow from the seed"
    rgb = final[:, :3]
    assert rgb.std() > 0.05, "rollout should produce non-trivial texture"
