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


def diffuse_band(
    eng,
    n: Array,
    t: Array,
    A: Array,
    *,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
) -> Array:
    """``diffuse`` (reference nca.py:312-323) with the blur on a BAND
    engine — the graph-free path for large point sets: a fixed-K
    neighbor list at the reference's tangent-seeding radius 0.2 needs
    K~2000 at 25k+ points, and its [N, K, 4] gather lane-pads 4->128
    (26 GB at 25,600 points — OOMs one chip at COMPILE time); the band
    blur's [rows, 4] operand is layout-native. ``eng`` must be a
    BandEngine built at the diffusion radius."""
    from ..ops.bands import blur_band

    w = jnp.clip(cell_activity(A)[..., None], 0.0, 1.0)
    m = (1.0 - w_multiplier) + w * w_multiplier
    mt = jnp.concatenate([m, m * t], axis=-1)  # [N, 4]
    mt2 = eng.gather_back(blur_band(eng, eng.scatter(mt)))
    t2 = mt2[..., 1:] / (1e-8 + mt2[..., :1])
    t2 = t2 + (t - t2) * (w * lerp_multiplier)
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
    shards: int = 1,
) -> Array:
    """Tangent diffusion in cell layout (reference nca.py:312-323;
    weights are ALWAYS the alpha lane — the reference's diffuse() reads
    cell_activity at its default use_alpha=True regardless of the
    model's USE_ALPHA flag): the
    blur runs as one poly6 table matmul (blur_cells_pallas) at the
    ENGINE's h — the reference hard-codes its diffusion radius to 0.1,
    which equals the trained model's h in every shipped config, so a
    single engine serves both perception and diffusion."""
    from ..ops.pallas.pair_kernel import blur_cells_pallas
    from .cell_step import cell_activity_s

    w = jnp.clip(cell_activity_s(S, True)[..., None], 0.0, 1.0)
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
                shards=shards,
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


# ---------------------------------------------------------------------------
# Batched-lane (throughput-path) mesh rollout — ops/batched.py layout
# ---------------------------------------------------------------------------


def project_tangent_space_lanes(
    gaB: Array, nc: Array, tc: Array, b: int
) -> Array:
    """Tangent projection on d-major LANE blocks (ops/batched.py):
    gaB [C, M, 3*B*F] -> [C, M, 3*B*F] with blocks [gA.t | gA.bitan |
    gA.n] (reference nca.py:325-330). The tangent frame is per SLOT
    (geometry static, shared across the batch); each output block is a
    per-slot-weighted sum of the three input blocks — pure 128-lane
    elementwise math, no relayout."""
    C, M = gaB.shape[0], gaB.shape[1]
    bf = gaB.shape[-1] // 3
    bit = jnp.cross(nc, tc)
    blocks = [gaB[..., i * bf : (i + 1) * bf] for i in range(3)]
    outs = []
    for basis in (tc, bit, nc):
        acc = blocks[0] * basis[..., 0:1]
        acc = acc + blocks[1] * basis[..., 1:2]
        acc = acc + blocks[2] * basis[..., 2:3]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def _expand_lanes(a: Array, f: int) -> Array:
    """[rows, B] -> [rows, B*F] lane expansion via a one-hot MXU matmul
    (shared implementation in ops/batched.expand_lanes)."""
    from ..ops.batched import expand_lanes

    return expand_lanes(a, f)


def normal_components(nc: Array) -> tuple:
    """Split shared normals [C, M, 3] into three [rows, 1] component
    arrays ONCE per rollout. Lane-slicing a 3-lane array materializes a
    strided copy; done inside the step it re-ran every scan iteration
    (profiled ~0.8 ms/step of async slice traffic on the 100k bench)."""
    rows = nc.shape[0] * nc.shape[1]
    flat = nc.reshape(rows, 3)
    return tuple(flat[:, i : i + 1] for i in range(3))


def diffuse_batched(
    eng,
    nc: Array,  # [C, M, 3] shared normals
    tB: Array,  # [C, M, 3*B] per-sample tangents, d-major lane blocks
    SB: Array,  # [C, M, B*F]
    b: int,
    *,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    nd: Optional[tuple] = None,  # precomputed normal_components(nc)
) -> Array:
    """Batched tangent diffusion (reference nca.py:312-323) through the
    batched poly6 blur, entirely in [rows, B] lane-block math (shapes
    ending in 3 pad 128/3x and every op on them relayouts — profiled).
    tB layout: [t_x (B) | t_y (B) | t_z (B)]."""
    C, M = SB.shape[0], SB.shape[1]
    rows = C * M
    t2 = tB.reshape(rows, 3 * b)
    td = tuple(t2[:, i * b : (i + 1) * b] for i in range(3))
    if nd is None:
        nd = normal_components(nc)
    out = _diffuse_td(
        eng, nd, td, SB, b,
        lerp_multiplier=lerp_multiplier,
        w_multiplier=w_multiplier,
    )
    return jnp.concatenate(out, axis=-1).reshape(C, M, 3 * b)


def _diffuse_td(
    eng,
    nd: tuple,  # 3x [rows, 1] normal components (loop-invariant)
    td: tuple,  # 3x [rows, B] per-sample tangent components
    SB: Array,  # [C, M, B*F]
    b: int,
    *,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
) -> tuple:
    """Component-tuple core of diffuse_batched. Tangents stay as three
    [rows, B] arrays end-to-end — packing them into one [C, M, 3B]
    carry made every step re-slice it (profiled ~0.6 ms/step of async
    slice traffic on the 100k bench)."""
    from ..ops.batched import blur_batched

    C, M = SB.shape[0], SB.shape[1]
    rows = C * M
    w = _diffuse_weights(SB, b)
    mt = _diffuse_mt(w, td, b, w_multiplier)
    mt2 = blur_batched(eng, mt.reshape(C, M, 4 * b), b).reshape(rows, 4 * b)
    return _diffuse_combine(mt2, w, td, nd, b, lerp_multiplier)


def _diffuse_weights(SB: Array, b: int) -> Array:
    """w = clip(alpha, 0, 1) per (row, sample) — [rows, B].

    Always the alpha lane: the reference's diffuse() reads
    cell_activity(A) at its DEFAULT use_alpha=True (nca.py:312-314)
    regardless of the model's own USE_ALPHA flag, so tangent diffusion
    is alpha-weighted even for use_alpha=False models."""
    from ..ops.bands import _take_lanes

    rows = SB.shape[0] * SB.shape[1]
    f = SB.shape[-1] // b
    alpha = _take_lanes(SB.reshape(rows, b * f), jnp.arange(b) * f + 3, b)
    return jnp.clip(alpha, 0.0, 1.0)


def _diffuse_mt(w: Array, td: tuple, b: int, w_multiplier: float) -> Array:
    """Diffusion blur input lanes [m | m*t_x | m*t_y | m*t_z]
    ([rows, 4B], reference nca.py:315-317)."""
    m = (1.0 - w_multiplier) + w * w_multiplier
    return jnp.concatenate([m] + [m * t.astype(w.dtype) for t in td],
                           axis=-1)


def _diffuse_combine(
    mt2: Array,  # [rows, 4B] blurred [m | m*t] lanes (f32)
    w: Array,  # [rows, B] activity weights
    td: tuple,
    nd: tuple,
    b: int,
    lerp_multiplier: float,
) -> tuple:
    """Tail of the diffusion: normalize by blurred mass, lerp toward the
    previous tangent where active, re-orthogonalize (nca.py:318-323)."""
    denom = 1e-8 + mt2[:, :b]
    lerp = w * lerp_multiplier
    t2d = []
    for i in range(3):
        ti = mt2[:, (i + 1) * b : (i + 2) * b] / denom
        t2d.append(ti + (td[i] - ti) * lerp)
    # orthogonalize against the shared normal, renormalize (per sample)
    ndot = t2d[0] * nd[0] + t2d[1] * nd[1] + t2d[2] * nd[2]
    t2d = [t2d[i] - nd[i].astype(t2d[i].dtype) * ndot for i in range(3)]
    norm = jnp.sqrt(t2d[0] ** 2 + t2d[1] ** 2 + t2d[2] ** 2)
    return tuple(t / (1e-8 + norm) for t in t2d)


def _project_lanes_batchedT(gaB: Array, nc: Array, tB: Array, b: int,
                            nd: Optional[tuple] = None) -> Array:
    """Tangent projection with PER-SAMPLE tangents in d-major lane
    blocks (tB [C, M, 3*B]): output d-major blocks [gA.t | gA.bitan |
    gA.n] (reference nca.py:325-330). Per-axis coefficients expand
    [rows, B] -> [rows, B*F] via one MXU one-hot matmul each; the rest
    is fused 128-lane elementwise math."""
    C, M = gaB.shape[0], gaB.shape[1]
    bf = gaB.shape[-1] // 3
    rows = C * M
    t2 = tB.reshape(rows, 3 * b)
    td = tuple(t2[:, i * b : (i + 1) * b] for i in range(3))
    if nd is None:
        nd = normal_components(nc)  # [rows, 1] each
    return _project_td(gaB, nd, td, b)


def _project_td(gaB: Array, nd: tuple, td: tuple, b: int,
                include_normal: bool = True) -> Array:
    """Component-tuple core of _project_lanes_batchedT (tangents/normals
    pre-split, in any dtype — cast here to follow gaB's dtype).

    ``include_normal=False`` drops the projected normal component: the
    reference computes it (project_tangent_space, nca.py:325-330) but
    its feature process consumes only Av[..., 0] and Av[..., 1]
    (nca.py:23-31), so inside a rollout the normal lanes are dead — a
    third of the projection work plus a [rows, 3*B*F] concat that the
    MLP immediately re-slices (profiled 0.26 ms/step of relayout copy
    at bench scale).

    ``gaB`` may be a 3-tuple of per-axis components [C, M, B*F] (the
    perceive ``split_d=True`` form) — preferred: the lane-concat'd
    [C, M, 3*B*F] form costs a sublane->lane relayout that this
    function immediately undoes."""
    if isinstance(gaB, (tuple, list)):
        C, M = gaB[0].shape[0], gaB[0].shape[1]
        bf = gaB[0].shape[-1]
        rows = C * M
        ga = [g.reshape(rows, bf) for g in gaB]
    else:
        C, M = gaB.shape[0], gaB.shape[1]
        bf = gaB.shape[-1] // 3
        rows = C * M
        ga = [gaB.reshape(rows, 3 * bf)[:, i * bf : (i + 1) * bf]
              for i in range(3)]
    f = bf // b
    dt = ga[0].dtype  # follow the perception dtype (bf16 throughput)
    td = [t.astype(dt) for t in td]
    nd = [x.astype(dt) for x in nd]
    # bitangent = n x t, computed in [rows, B] blocks (n broadcasts)
    bd = [
        nd[1] * td[2] - nd[2] * td[1],
        nd[2] * td[0] - nd[0] * td[2],
        nd[0] * td[1] - nd[1] * td[0],
    ]
    tE = [_expand_lanes(td[i], f) for i in range(3)]
    bE = [_expand_lanes(bd[i], f) for i in range(3)]
    out_t = ga[0] * tE[0] + ga[1] * tE[1] + ga[2] * tE[2]
    out_b = ga[0] * bE[0] + ga[1] * bE[1] + ga[2] * bE[2]
    if not include_normal:
        return jnp.concatenate([out_t, out_b], axis=-1).reshape(
            C, M, 2 * bf
        )
    out_n = ga[0] * nd[0] + ga[1] * nd[1] + ga[2] * nd[2]
    return jnp.concatenate([out_t, out_b, out_n], axis=-1).reshape(
        C, M, 3 * bf
    )


def rollout_mesh_batched(
    params,
    cfg,
    eng,
    A0: Array,  # [B, N, C]
    n: Array,  # [N, 3]
    t0: Array,  # [B, N, 3]
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    mlp_dtype: Optional[str] = None,
    unroll: int = 1,
    remat: bool = False,
):
    """Batch-B mesh/3D-surface rollout on the batched-lane engine — the
    aggregate-throughput form of rollout_mesh_cells (reference
    ``sample_mesh``, nca.py:338-381): per step, tangent-projected
    perception + detached per-sample tangent diffusion.

    The diffusion blur is FUSED into the next step's perception pass
    (perceive's ``extra`` lanes): the reference computes
    T_t = diffuse(A_t, T_{t-1}) at the END of step t-1 and projects
    step t's perception with it — algebraically the same blur inputs
    (A_t, T_{t-1}) are available at the START of step t, so the blur
    rides step t's own pair pass and the standalone diffusion pass
    disappears. Step 1 selects the undiffused T_0 (the reference
    projects the first step with the seed tangents as-is), and one
    standalone diffusion after the scan produces the final T_K.
    Semantics are exactly ``sample_mesh``'s; only the pass schedule
    differs.

    Returns (final_A [B, N, C], final_T [B, N, 3])."""
    from ..ops.batched import batched_gather_back, batched_scatter
    from .cell_step import nca_step_cells_batched

    b = A0.shape[0]
    C, M = eng.xs.shape[0], eng.xs.shape[1]
    rows = C * M
    SB0 = batched_scatter(eng, A0)
    nc = eng.scatter(n)
    # tangents as three [rows, B] component arrays (a packed [C, M, 3B]
    # carry made every step re-slice it — profiled, see _diffuse_td)
    t_cm = batched_scatter(eng, t0).reshape(rows, b, 3)
    td0 = tuple(t_cm[..., d] for d in range(3))
    # loop-invariant per-component normals, pre-cast to the perception
    # dtype so nothing is sliced or converted inside the scan
    pdt = jnp.bfloat16 if mlp_dtype == "bfloat16" else SB0.dtype
    nd = tuple(x.astype(pdt) for x in normal_components(nc))
    # per-step RNG keys derived OUTSIDE the scan (the in-scan fold_in
    # chain serialized a small copy per step on the async line)
    keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
        jnp.arange(n_steps)
    )
    first = (jnp.arange(n_steps) == 0)

    def body(carry, xs):
        k, is_first = xs
        SB, td = carry
        # diffusion blur inputs from the CURRENT state + carried tangent
        # (detached, reference nca.py:357)
        w = jax.lax.stop_gradient(_diffuse_weights(SB, b))
        mt = _diffuse_mt(w, tuple(jax.lax.stop_gradient(t) for t in td),
                         b, w_multiplier)

        def transform(ga, mt2):
            dtd = _diffuse_combine(
                mt2.reshape(rows, 4 * b), w, td, nd, b, lerp_multiplier
            )
            # step 1 projects with the seed tangents (no diffusion has
            # happened yet in the reference schedule)
            ntd = tuple(
                jnp.where(is_first, t, dt) for t, dt in zip(td, dtd)
            )
            return _project_td(ga, nd, ntd, b,
                               include_normal=False), ntd

        nSB, ntd = nca_step_cells_batched(
            params, cfg, eng, SB, b, k, h,
            fire_rate=fire_rate, mlp_dtype=mlp_dtype,
            perception_transform=transform,
            blur_extra=mt.reshape(C, M, 4 * b),
            split_d=True,
        )
        return (nSB, ntd), None

    if remat:
        # BPTT: save only the [C, M, ch*B] state + tangent carries per
        # step (~80 MB/step at the 100k bench shape) and recompute the
        # 48-lane perception intermediates in the backward pass —
        # without this, 64-step training rollouts at bench scale
        # overflow the 16 GB HBM.
        body = jax.checkpoint(body, prevent_cse=False)
    (final_S, td_prev), _ = jax.lax.scan(
        body, (SB0, td0), (keys, first), unroll=unroll
    )
    return _finish_mesh_batched(
        eng, final_S, td_prev, nd, b,
        lerp_multiplier, w_multiplier,
    )


def _finish_mesh_batched(eng, final_S, td_prev, nd, b,
                         lerp_multiplier, w_multiplier):
    """Shared tail: the reference's step K ends with
    T_K = diffuse(A_K, T_{K-1}); gather back to particle order."""
    from ..ops.batched import batched_gather_back

    C, M = final_S.shape[0], final_S.shape[1]
    # the scan's carry holds T_{K-1}; the reference's step K ends with
    # T_K = diffuse(A_K, T_{K-1})
    final_td = jax.lax.stop_gradient(
        _diffuse_td(
            eng, nd, td_prev, final_S, b,
            lerp_multiplier=lerp_multiplier,
            w_multiplier=w_multiplier,
        )
    )
    ft = jnp.stack(final_td, axis=-1)  # [rows, B, 3]
    ft = ft.reshape(C, M, b * 3)
    return (
        batched_gather_back(eng, final_S, b),
        batched_gather_back(eng, ft, b),
    )


def rollout_mesh_batched_dual(
    params,
    cfg,
    eng,  # perception engine at the MODEL's h
    eng_d,  # diffusion engine at DIFFUSE_H (its own layout)
    A0: Array,  # [B, N, C]
    n: Array,  # [N, 3]
    t0: Array,  # [B, N, 3]
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    mlp_dtype: Optional[str] = None,
    unroll: int = 1,
    collect_all: bool = False,
):
    """General-h batched mesh rollout: the reference hard-codes the
    tangent-diffusion radius to 0.1 REGARDLESS of the model's h
    (nca.py:357), so a checkpoint with h != 0.1 needs two
    neighborhoods. Perception runs on ``eng`` (model h); the diffusion
    blur runs on ``eng_d`` (DIFFUSE_H) with a static permutation
    between the two engines' rank layouts ([N, 4B] rows per step —
    small next to the pair passes). Semantics follow ``sample_mesh``
    exactly; when h == DIFFUSE_H use rollout_mesh_batched, whose fused
    schedule shares one engine.

    Returns (final_A [B, N, C], final_T [B, N, 3][, states
    [n_steps+1, B, N, C] when collect_all]).
    """
    from ..ops.batched import (
        batched_gather_back,
        batched_scatter,
        blur_batched,
    )
    from .cell_step import nca_step_cells_batched

    b = A0.shape[0]
    C, M = eng.xs.shape[0], eng.xs.shape[1]
    rows = C * M
    rows_d = eng_d.xs.shape[0] * eng_d.xs.shape[1]
    SB0 = batched_scatter(eng, A0)
    nc = eng.scatter(n)
    t_cm = batched_scatter(eng, t0).reshape(rows, b, 3)
    td0 = tuple(t_cm[..., d] for d in range(3))
    pdt = jnp.bfloat16 if mlp_dtype == "bfloat16" else SB0.dtype
    nd = tuple(x.astype(pdt) for x in normal_components(nc))
    # static rank-layout permutation: perception rows -> diffusion rows
    sp = eng.slot_of_particle
    sd = eng_d.slot_of_particle
    keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
        jnp.arange(n_steps)
    )

    def to_diff(Y):  # [rows, L] eng layout -> [rows_d, L] eng_d layout
        out = jnp.zeros((rows_d, Y.shape[-1]), Y.dtype)
        return out.at[sd].set(Y[sp])

    def from_diff(Y):
        return jnp.zeros((rows, Y.shape[-1]), Y.dtype).at[sp].set(Y[sd])

    def body(carry, k):
        SB, td = carry
        nSB = nca_step_cells_batched(
            params, cfg, eng, SB, b, k, h,
            fire_rate=fire_rate, mlp_dtype=mlp_dtype,
            perception_transform=lambda ga: _project_td(
                ga, nd, td, b, include_normal=False),
            split_d=True,
        )
        w = _diffuse_weights(nSB, b)
        mt = _diffuse_mt(w, td, b, w_multiplier)
        mt_d = to_diff(mt)
        mt2 = blur_batched(
            eng_d, mt_d.reshape(eng_d.xs.shape[0], eng_d.xs.shape[1],
                                4 * b), b
        ).reshape(rows_d, 4 * b)
        ntd = jax.lax.stop_gradient(
            _diffuse_combine(from_diff(mt2), w, td, nd, b, lerp_multiplier)
        )
        out = nSB if collect_all else None
        return (nSB, ntd), out

    (final_S, final_td), states = jax.lax.scan(
        body, (SB0, td0), keys, unroll=unroll
    )
    ft = jnp.stack(final_td, axis=-1).reshape(C, M, b * 3)
    fa = batched_gather_back(eng, final_S, b)
    ftb = batched_gather_back(eng, ft, b)
    if collect_all:
        states = jax.vmap(lambda S: batched_gather_back(eng, S, b))(states)
        states = jnp.concatenate([A0[None], states], axis=0)
        return fa, ftb, states
    return fa, ftb
