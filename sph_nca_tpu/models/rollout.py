"""Rollout drivers: K NCA steps as one jitted ``lax.scan``.

TPU-native replacement for the reference's eager Python rollout loops
``sample_plane`` (nca.py:124-164), ``sample_plane_wrapped`` (:245-299) and
``sample_mesh`` (:338-381):

  * the neighbor graph is built once per geometry (the reference builds its
    hash grid once per rollout, nca.py:136 — particles are static);
  * the K-step loop is a ``lax.scan`` (optionally rematerialized per step)
    so forward + BPTT compile to a single XLA program — no per-op host sync;
  * periodic ("wrapped") training needs no ghost particles: pass a graph
    built with ``period`` and the minimum-image stencil handles the torus
    (see ops/hashgrid.py);
  * the number of steps can be a *traced* value ``n_steps <= max_steps``
    (steps beyond n_steps are masked no-ops), so the reference's random
    32..48-step rollouts and progressive growing (train.py:297-300) do not
    trigger a recompile per step count.

State collection: the reference keeps every intermediate state and samples 4
of them for the auxiliary loss (nca.py:143-150). Here the 4 step indices are
chosen *before* the rollout (an equivalent distribution) and collected into
a fixed [S, N, C] buffer inside the scan, so memory does not scale with K.
``rollout_states`` returns the full trajectory for inference/export parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.hashgrid import SPHGraph
from .nca import MLPParams, PerceptionTransform, SPHNCAConfig, nca_step

Array = jnp.ndarray


class RolloutOut(NamedTuple):
    final: Array  # [N, C] state after n_steps
    collected: Optional[Array]  # [S, N, C] states at collect_steps, or None


def _masked_step(step_fn, t, n_steps, A, key):
    """Apply step only while t < n_steps (supports traced step counts)."""
    nA = step_fn(A, key)
    if n_steps is None:
        return nA
    return jnp.where(t < n_steps, nA, A)


def rollout(
    params: MLPParams,
    cfg: SPHNCAConfig,
    graph: SPHGraph,
    A0: Array,
    key: Array,
    max_steps: int,
    h,
    *,
    n_steps: Optional[Array] = None,
    fire_rate: Optional[float] = None,
    perception_transform: Optional[PerceptionTransform] = None,
    collect_steps: Optional[Array] = None,
    remat: bool = True,
) -> RolloutOut:
    """Run up to ``max_steps`` NCA steps from A0 (single cloud [N, C]).

    ``collect_steps``: int array [S] of state indices in [0, n_steps]
    (0 = A0, i = state after i steps) to snapshot during the scan.
    """

    def step_fn(A, key):
        return nca_step(
            params, cfg, graph, A, key, h,
            fire_rate=fire_rate, perception_transform=perception_transform,
        )

    if remat:
        step_fn = jax.checkpoint(step_fn)

    collect = collect_steps is not None
    buf0 = (
        jnp.broadcast_to(A0, (collect_steps.shape[0],) + A0.shape)
        if collect
        else None
    )

    def body(carry, t):
        A, buf = carry
        nA = _masked_step(step_fn, t, n_steps, A, jax.random.fold_in(key, t))
        if collect:
            hit = (collect_steps == t + 1)[:, None, None]
            buf = jnp.where(hit, nA[None], buf)
        return (nA, buf), None

    (final, buf), _ = jax.lax.scan(
        body, (A0, buf0), jnp.arange(max_steps), length=max_steps
    )
    return RolloutOut(final=final, collected=buf)


def rollout_states(
    params: MLPParams,
    cfg: SPHNCAConfig,
    graph: SPHGraph,
    A0: Array,
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    perception_transform: Optional[PerceptionTransform] = None,
) -> Array:
    """Full trajectory [n_steps+1, N, C] incl. A0 (reference ``out`` list)."""

    def step_fn(A, key):
        return nca_step(
            params, cfg, graph, A, key, h,
            fire_rate=fire_rate, perception_transform=perception_transform,
        )

    def body(A, t):
        nA = step_fn(A, jax.random.fold_in(key, t))
        return nA, nA

    final, states = jax.lax.scan(body, A0, jnp.arange(n_steps))
    return jnp.concatenate([A0[None], states], axis=0)


def rollout_batch(
    params: MLPParams,
    cfg: SPHNCAConfig,
    graph: SPHGraph,
    A0: Array,  # [B, N, C]
    key: Array,
    max_steps: int,
    h,
    **kwargs,
) -> RolloutOut:
    """vmap of `rollout` over a batch sharing one geometry/graph.

    Replaces the reference's ragged pack/sections batching
    (sphops/utils/__init__.py:31-38) with a dense [B, N, C] layout — all
    pool samples share the seed geometry (train.py:236-250), so one
    neighbor graph serves the whole batch.
    """
    keys = jax.random.split(key, A0.shape[0])
    fn = partial(rollout, params, cfg, graph, max_steps=max_steps, h=h, **kwargs)
    return jax.vmap(lambda a, k: fn(a, k))(A0, keys)


def rollout_rebuild(
    params: MLPParams,
    cfg: SPHNCAConfig,
    x0: Array,
    A0: Array,
    key: Array,
    n_steps: int,
    h,
    dims,
    *,
    max_per_cell: int,
    k: int,
    advect=None,
    period=None,
    fire_rate: Optional[float] = None,
):
    """Rollout with the neighbor structure REBUILT inside the scan.

    For configs where particles move between steps (``advect(x, A, t) ->
    new x``; e.g. state-driven flows), the static-geometry assumption
    breaks and the hash grid must be rebuilt per step — the BASELINE
    damage/moving-particle configuration. The whole build (hash -> sort ->
    cell table -> top-k compaction, ops/hashgrid.py) is jit-compatible
    with static shapes, so it lives inside the same compiled scan.

    Returns (x_final, A_final, states [n_steps+1, N, C]).
    """
    from ..ops.hashgrid import build_neighbor_list, graph_from_neighbor_list
    from .nca import nca_step

    def body(carry, t):
        x, A = carry
        if advect is not None:
            x = advect(x, A, t)
        nl = build_neighbor_list(
            x, h, dims, max_per_cell=max_per_cell, k=k, period=period
        )
        graph = graph_from_neighbor_list(x, h, nl, period=period)
        nA = nca_step(
            params, cfg, graph, A, jax.random.fold_in(key, t), h,
            fire_rate=fire_rate,
        )
        return (x, nA), nA

    (xf, Af), states = jax.lax.scan(body, (x0, A0), jnp.arange(n_steps))
    return xf, Af, jnp.concatenate([A0[None], states], axis=0)
