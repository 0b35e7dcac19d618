"""3D-surface machinery: tangent frames, diffusion, tangent-space perception.

Reference: code/nca.py:302-336 (normalize, orthogonalize, diffuse,
project_tangent_space, feature_process_tangent) and the per-step tangent
re-spreading in ``sample_mesh`` (nca.py:352-357).

The reference hard-codes h=0.1, dims=20 for the tangent diffusion grid
(nca.py:357) and rebuilds that hash grid every step; here the diffusion
graph is built once (positions are static) and reused across the scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.hashgrid import SPHGraph
from ..ops.neighbor_ops import graph_blur
from .nca import PerceptionTransform, cell_activity

Array = jnp.ndarray

# Reference defaults for the diffusion neighborhood (nca.py:357).
DIFFUSE_H = 0.1
DIFFUSE_DIMS = 20


def normalize(v: Array, eps: float = 1e-8) -> Array:
    """v / (eps + |v|) (reference nca.py:303-305)."""
    return v / (eps + jnp.linalg.norm(v, axis=-1, keepdims=True))


def orthogonalize(n: Array, t: Array) -> Array:
    """Gram-Schmidt t against n, renormalized (reference nca.py:307-310)."""
    nt = jnp.sum(n * t, axis=-1, keepdims=True)
    return normalize(t - n * nt)


def diffuse(
    n: Array,
    t: Array,
    A: Array,
    diffuse_graph: SPHGraph,
    *,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
) -> Array:
    """Activity-weighted tangent-direction diffusion (reference nca.py:312-323).

    blur([m, m*T]) -> T2 = blurred_mT / blurred_m -> lerp toward T where the
    cell is active -> re-orthogonalize against the normal.
    """
    w = jnp.clip(cell_activity(A)[..., None], 0.0, 1.0)
    m = (1.0 - w_multiplier) + w * w_multiplier  # lerp(1, w, w_mult)
    mt = jnp.concatenate([m, m * t], axis=-1)
    mt2 = graph_blur(diffuse_graph, mt)
    t2 = mt2[..., 1:] / (1e-8 + mt2[..., :1])
    t2 = t2 + (t - t2) * (w * lerp_multiplier)  # lerp(t2, t, w*lerp_mult)
    return orthogonalize(n, t2)


def project_tangent_space(gA: Array, n: Array, t: Array) -> Array:
    """Rotate perception vectors into the local TBN frame
    (reference nca.py:325-330): out[..., k] = gA . {T, B, N}[k]."""
    b = jnp.cross(n, t)
    tbn = jnp.stack([t, b, n], axis=-1)  # [N, 3, 3]
    return jnp.einsum("ncd,ndk->nck", gA, tbn)


def tangent_perception(n: Array, t: Array) -> PerceptionTransform:
    """Perception transform for mesh rollouts (reference nca.py:332-336)."""

    def transform(gA: Array) -> Array:
        return project_tangent_space(gA, n, t)

    return transform


def rollout_mesh(
    params,
    cfg,
    graph: SPHGraph,
    diffuse_graph: SPHGraph,
    A0: Array,
    n: Array,
    t0: Array,
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    collect_all: bool = False,
):
    """Mesh/3D-surface rollout (reference ``sample_mesh``, nca.py:338-381).

    Per step: NCA forward with tangent-projected perception, then tangent
    field diffusion (detached, nca.py:357). Returns (final_A, final_T,
    states or None) where states is [n_steps+1, N, C] when collect_all.
    """
    from .nca import nca_step  # local import to avoid cycle

    def body(carry, step_i):
        A, t = carry
        nA = nca_step(
            params, cfg, graph, A, jax.random.fold_in(key, step_i), h,
            fire_rate=fire_rate, perception_transform=tangent_perception(n, t),
        )
        nt = jax.lax.stop_gradient(
            diffuse(
                n, t, nA, diffuse_graph,
                lerp_multiplier=lerp_multiplier, w_multiplier=w_multiplier,
            )
        )
        out = nA if collect_all else None
        return (nA, nt), out

    (final_A, final_t), states = jax.lax.scan(
        body, (A0, t0), jnp.arange(n_steps)
    )
    if collect_all:
        states = jnp.concatenate([A0[None], states], axis=0)
    return final_A, final_t, states


# ---------------------------------------------------------------------------
# Cell-engine (TPU fast path) mesh rollout
# ---------------------------------------------------------------------------


def project_tangent_space_cells(gA: Array, n: Array, t: Array) -> Array:
    """project_tangent_space in cell layout: gA [C, M, F, 3],
    n/t [C, M, 3] -> [C, M, F, 3] (reference nca.py:325-330)."""
    b = jnp.cross(n, t)
    tbn = jnp.stack([t, b, n], axis=-1)  # [C, M, 3, 3]
    return jnp.einsum("cmfd,cmdk->cmfk", gA, tbn)


def diffuse_cells(
    eng,
    n: Array,
    t: Array,
    S: Array,
    *,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    use_alpha: bool = True,
    shards: int = 1,
) -> Array:
    """Tangent diffusion in cell layout (reference nca.py:312-323): the
    blur runs as one poly6 table matmul (blur_cells_pallas) at the
    ENGINE's h — the reference hard-codes its diffusion radius to 0.1,
    which equals the trained model's h in every shipped config, so a
    single engine serves both perception and diffusion."""
    from ..ops.pallas.pair_kernel import blur_cells_pallas
    from .cell_step import cell_activity_s

    w = jnp.clip(cell_activity_s(S, use_alpha)[..., None], 0.0, 1.0)
    m = (1.0 - w_multiplier) + w * w_multiplier
    mt = jnp.concatenate([m, m * t], axis=-1)  # [C, M, 4]
    mt2 = blur_cells_pallas(eng, mt, shards)
    t2 = mt2[..., 1:] / (1e-8 + mt2[..., :1])
    t2 = t2 + (t - t2) * (w * lerp_multiplier)
    return orthogonalize(n, t2)


def rollout_mesh_cells(
    params,
    cfg,
    eng,
    A0: Array,
    n: Array,
    t0: Array,
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    collect_all: bool = False,
    shards: int = 1,
):
    """Mesh/3D-surface rollout on the cell-dense engine — the TPU fast
    path of ``rollout_mesh`` (reference ``sample_mesh``, nca.py:338-381):
    tangent-projected perception + per-step detached tangent diffusion,
    all pair passes through the precomputed-table Pallas kernels.

    Requires an engine built with ``pair_tables`` (the diffusion blur
    reads the poly6 table). A0/n/t0 are particle-order [N, *]; returns
    (final_A [N, C], final_T [N, 3], states [n_steps+1, N, C] or None).
    """
    from .cell_step import nca_step_cells

    S0 = eng.scatter(A0)
    nc = eng.scatter(n)
    tc0 = eng.scatter(t0)

    def body(carry, step_i):
        S, t = carry
        nS = nca_step_cells(
            params, cfg, eng, S, jax.random.fold_in(key, step_i), h,
            fire_rate=fire_rate,
            perception_transform=lambda gA: project_tangent_space_cells(
                gA, nc, t
            ),
            shards=shards,
        )
        nt = jax.lax.stop_gradient(
            diffuse_cells(
                eng, nc, t, nS,
                lerp_multiplier=lerp_multiplier, w_multiplier=w_multiplier,
                use_alpha=cfg.use_alpha, shards=shards,
            )
        )
        out = eng.gather_back(nS) if collect_all else None
        return (nS, nt), out

    (final_S, final_t), states = jax.lax.scan(
        body, (S0, tc0), jnp.arange(n_steps)
    )
    final_A = eng.gather_back(final_S)
    if collect_all:
        states = jnp.concatenate([A0[None], states], axis=0)
    return final_A, eng.gather_back(final_t), states
