"""Pins __graft_entry__.entry()'s host-side numpy setup to the library
path it mirrors.

entry() deliberately re-derives the grid (utils/geometry.grange), the
radial seed (utils/seeds.plane_seed), and the lane scatter
(ops/batched.batched_scatter) in host numpy: under the axon TPU tunnel
every eager jnp setup op pays a remote compile (measured 15-60 s each,
2026-08-19 — the jnp version of this setup cost the driver 297-447 s).
These tests guard that the numpy mirror stays bit-exact so the speedup
never drifts from the semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as graft

from sph_nca_tpu.models import SPHNCAConfig
from sph_nca_tpu.ops.bands import build_band_engine
from sph_nca_tpu.ops.batched import batched_scatter
from sph_nca_tpu.utils.geometry import grange
from sph_nca_tpu.utils.seeds import plane_seed


@pytest.fixture(scope="module")
def entry_parts():
    fn, (params, SB0, key) = graft.entry()
    return fn, params, SB0, key


def _library_SB0():
    """The jnp/library version of entry()'s setup (the pre-hardening
    implementation), as the oracle."""
    h, n_side, batch = 0.1, 64, 8
    x = grange(
        (n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])
    ).reshape(-1, 2)
    eng = build_band_engine(
        np.asarray(jnp.pad(x, ((0, 0), (0, 1)))), h, table_dtype="bfloat16"
    )
    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    A0 = plane_seed(x, cfg.channels, gmin=(-1, -1), gsize=(2, 2), radius=h)
    return batched_scatter(
        eng, jnp.broadcast_to(A0[None], (batch,) + A0.shape)
    )


def test_entry_setup_matches_library_path(entry_parts):
    _, _, SB0, _ = entry_parts
    SB_ref = _library_SB0()
    assert SB0.shape == SB_ref.shape
    assert bool(jnp.array_equal(SB0, SB_ref))


def test_entry_fn_jits_and_steps(entry_parts):
    fn, params, SB0, key = entry_parts
    out = jax.block_until_ready(jax.jit(fn)(*(params, SB0, key)))
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "entry fn returned an empty pytree"
    state = leaves[0]
    assert state.shape == SB0.shape
    assert bool(jnp.all(jnp.isfinite(state)))
    # the radial seed must actually evolve (non-trivial step)
    assert not bool(jnp.array_equal(state, SB0))
