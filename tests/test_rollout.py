"""Rollout driver tests: scan vs eager parity, masked steps, collection."""

import numpy as np
import jax
import jax.numpy as jnp

from sph_nca_tpu import ops
from sph_nca_tpu.models import (
    SPHNCAConfig,
    init_params,
    nca_step,
    rollout,
    rollout_batch,
    rollout_states,
)
from sph_nca_tpu.utils.geometry import grange


def scene(n_side=16, h=0.2):
    x = grange((n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    g = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    return x, g, h


def init_state(x, cfg, key):
    return jax.random.uniform(key, (x.shape[0], cfg.channels))


def test_scan_rollout_matches_eager_loop():
    x, g, h = scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))
    key = jax.random.key(2)
    n = 5

    states = rollout_states(p, cfg, g, A0, key, n, h)
    # eager replication with the same per-step key folding
    A = A0
    for t in range(n):
        A = nca_step(p, cfg, g, A, jax.random.fold_in(key, t), h)
        assert np.allclose(np.asarray(states[t + 1]), np.asarray(A), atol=1e-6)


def test_masked_steps_equal_shorter_rollout():
    """n_steps=k with max_steps=M > k must equal a plain k-step rollout."""
    x, g, h = scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))
    key = jax.random.key(2)

    full = rollout_states(p, cfg, g, A0, key, 3, h)
    out = rollout(p, cfg, g, A0, key, max_steps=8, h=h, n_steps=jnp.int32(3))
    assert np.allclose(np.asarray(out.final), np.asarray(full[-1]), atol=1e-6)


def test_collected_states_match_trajectory():
    x, g, h = scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))
    key = jax.random.key(2)

    states = rollout_states(p, cfg, g, A0, key, 6, h)
    collect = jnp.asarray([0, 2, 5, 6], jnp.int32)
    out = rollout(
        p, cfg, g, A0, key, max_steps=6, h=h, collect_steps=collect
    )
    for s, t in enumerate([0, 2, 5, 6]):
        assert np.allclose(
            np.asarray(out.collected[s]), np.asarray(states[t]), atol=1e-6
        ), f"collected state {s} (step {t})"


def test_batch_rollout_is_per_sample_independent():
    x, g, h = scene()
    cfg = SPHNCAConfig()
    p = init_params(jax.random.key(0), cfg)
    A0 = jax.random.uniform(jax.random.key(1), (3, x.shape[0], cfg.channels))
    key = jax.random.key(2)

    out = rollout_batch(p, cfg, g, A0, key, 4, h)
    # batch member i must equal a solo rollout with the same split key
    keys = jax.random.split(key, 3)
    for i in range(3):
        solo = rollout(p, cfg, g, A0[i], keys[i], max_steps=4, h=h)
        assert np.allclose(
            np.asarray(out.final[i]), np.asarray(solo.final), atol=1e-6
        )


def test_rollout_under_jit_and_grad():
    """The whole rollout must jit and differentiate (BPTT through scan)."""
    x, g, h = scene(12, 0.25)
    cfg = SPHNCAConfig(channels=8, hidden=32)
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))

    @jax.jit
    def loss(p):
        out = rollout(p, cfg, g, A0, jax.random.key(2), max_steps=4, h=h)
        return jnp.mean(out.final**2)

    g1 = jax.grad(loss)(p)
    flat = jax.tree.leaves(jax.tree.map(lambda a: np.asarray(a), g1))
    assert all(np.all(np.isfinite(f)) for f in flat)
    assert any(np.abs(f).max() > 0 for f in flat)


def test_rollout_rebuild_matches_static_when_particles_fixed():
    """Per-step rebuild (BASELINE's damage/moving config) must equal the
    static-graph rollout when particles do not move."""
    from sph_nca_tpu.models.rollout import rollout_rebuild

    x, g, h = scene(12, 0.25)
    cfg = SPHNCAConfig(channels=8, hidden=16)
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))
    key = jax.random.key(2)

    want = rollout_states(p, cfg, g, A0, key, 3, h)
    import numpy as _np

    from sph_nca_tpu import ops

    mpc, k = ops.suggest_capacity(_np.asarray(x), h, ops.default_dims(h))
    _, Af, states = rollout_rebuild(
        p, cfg, x, A0, key, 3, h, ops.default_dims(h),
        max_per_cell=mpc, k=k,
    )
    assert np.allclose(np.asarray(states), np.asarray(want), atol=1e-5)


def test_rollout_rebuild_with_advection_runs():
    """Moving particles: rebuild keeps the neighborhood consistent."""
    from sph_nca_tpu.models.rollout import rollout_rebuild

    x, g, h = scene(12, 0.25)
    cfg = SPHNCAConfig(channels=8, hidden=16)
    p = init_params(jax.random.key(0), cfg)
    A0 = init_state(x, cfg, jax.random.key(1))

    def advect(x, A, t):
        # small state-independent drift
        return x + 0.01 * jnp.sin(3.0 * x[..., ::-1])

    import numpy as _np

    from sph_nca_tpu import ops

    mpc, k = ops.suggest_capacity(_np.asarray(x), h, ops.default_dims(h))
    xf, Af, states = rollout_rebuild(
        p, cfg, x, A0, jax.random.key(2), 3, h, ops.default_dims(h),
        max_per_cell=mpc + 8, k=k + 8, advect=advect,
    )
    assert np.all(np.isfinite(np.asarray(Af)))
    assert not np.allclose(np.asarray(xf), np.asarray(x))
