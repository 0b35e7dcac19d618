"""NCA step and rollout over the cell-dense engine (the TPU fast path).

Semantically identical to models/nca.nca_step (reference nca.py:87-117) but
operating on the cell layout S [C, M, F] of ops/cells.CellEngine:

  * ONE window gather per phase feeds both the life-mask blur and the
    SPH-gradient perception (vs two [N*K]-row gathers in the list path);
  * all neighborhood math is batched [M, W] x [W, *] MXU matmuls.

Stochasticity note: the fire-rate mask is drawn per SLOT rather than per
particle — the same Bernoulli(fire_rate) law, a different stream than the
particle-order path, so trajectories match the graph path exactly only at
fire_rate == 1 (tests use that; training only needs the law).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.cells import CellEngine
from .nca import ALIVE_THRESHOLD, MLPParams, SPHNCAConfig, apply_mlp

Array = jnp.ndarray


def cell_activity_s(S: Array, use_alpha: bool) -> Array:
    """Activity per slot [C, M] (reference nca.py:17-21)."""
    if use_alpha:
        return S[..., 3]
    return jnp.ones_like(S[..., 3])


def _mask_blur_cells(eng: CellEngine, Sw: Array, use_alpha: bool) -> Array:
    """life-mask smoothing from a window gather Sw [C, WM, F]:
    blur((activity > 0.1).float) > 0.1, stop-gradient (nca.py:71-79)."""
    if use_alpha:
        actw = Sw[..., 3]
    else:
        # all-ones activity, but padded window slots must not count:
        # recover validity from the window volumes (pad slots have v == 0)
        actw = (eng.vw > 0.0).astype(Sw.dtype)
    mw = (actw > ALIVE_THRESHOLD).astype(Sw.dtype)
    sm = jnp.einsum(
        "cmw,cw->cm", eng.Tw, mw, precision=jax.lax.Precision.HIGHEST
    )
    sm = jax.lax.stop_gradient(sm)
    return sm > ALIVE_THRESHOLD  # [C, M]


def nca_step_cells(
    params: MLPParams,
    cfg: SPHNCAConfig,
    eng: CellEngine,
    S: Array,
    key: Array,
    h,
    fire_rate: Optional[float] = None,
    perception_transform=None,
    use_pallas: bool = True,
    mesh=None,
    shards: int = 1,
) -> Array:
    """One NCA step in cell layout: S [C, M, F] -> [C, M, F].

    ``use_pallas`` routes perception + life-mask through the fused Pallas
    pair kernel (ops/pallas/pair_kernel.py); the XLA einsum formulation
    stays available as a reference path.

    Multi-chip: pass ``mesh`` (a jax Mesh with a "particle" axis) and an
    engine built with ``n_shards`` matching the axis size — the Pallas
    kernels then run under shard_map with explicit window exchange
    (parallel/cell_shard.py). ``shards`` (without ``mesh``) runs an
    n_shards-built engine on a single device.
    """
    if fire_rate is None:
        fire_rate = cfg.fire_rate
    c = cfg.channels

    f = S.shape[-1]
    if use_pallas and perception_transform is None:
        # d-major fast path: the kernel's native [C, M, D*F] layout IS the
        # feature concat order (gA_x block then gA_y block) — no transpose
        if mesh is not None:
            from ..parallel.cell_shard import perceive_cells_dmajor_sharded

            gA_dm, pre_sm = perceive_cells_dmajor_sharded(
                mesh, eng, S, cfg.use_alpha
            )
        else:
            from ..ops.pallas.pair_kernel import perceive_cells_dmajor

            gA_dm, pre_sm = perceive_cells_dmajor(
                eng, S, cfg.use_alpha, shards
            )
        prev_mask = pre_sm > ALIVE_THRESHOLD
        if cfg.normalize_perception > 0:
            gA_dm = h * gA_dm * cfg.normalize_perception
        y = jnp.concatenate([S, gA_dm[..., : 2 * f]], axis=-1)
    else:
        if use_pallas:
            from ..ops.pallas.pair_kernel import perceive_cells

            gA, pre_sm = perceive_cells(eng, S, cfg.use_alpha, shards)
            prev_mask = pre_sm > ALIVE_THRESHOLD
        else:
            Sw = eng.window(S)  # [C, WM, F] — the phase's one gather
            prev_mask = _mask_blur_cells(eng, Sw, cfg.use_alpha)
            gA = eng.gradient(S, Sw=Sw)  # [C, M, F, D]
        if cfg.normalize_perception > 0:
            gA = h * gA * cfg.normalize_perception
        if perception_transform is not None:
            gA = perception_transform(gA)
        y = jnp.concatenate([S, gA[..., 0], gA[..., 1]], axis=-1)
    dA = apply_mlp(params, y)

    if cfg.update_rule == "gated":
        gate = jax.nn.sigmoid(dA[..., :c])
        delta = jnp.tanh(dA[..., c : 2 * c])
        mult = jax.nn.sigmoid(dA[..., -1:])
        nS = S * gate + delta * mult
    elif cfg.update_rule == "orig":
        nS = S + dA * (cfg.fire_rate / fire_rate)
    else:
        raise ValueError(f"unknown update rule {cfg.update_rule!r}")

    u = jax.random.uniform(key, S.shape[:2])
    nS = jnp.where((u <= fire_rate)[..., None], nS, S)

    if use_pallas:
        if mesh is not None:
            from ..parallel.cell_shard import mask_blur_sharded

            new_sm = mask_blur_sharded(mesh, eng, jax.lax.stop_gradient(nS),
                                       use_alpha=cfg.use_alpha)
        else:
            from ..ops.pallas.pair_kernel import mask_blur_pallas

            new_sm = mask_blur_pallas(eng, jax.lax.stop_gradient(nS),
                                      use_alpha=cfg.use_alpha, shards=shards)
        new_mask = new_sm > ALIVE_THRESHOLD
    else:
        nSw = eng.window(nS)
        new_mask = _mask_blur_cells(eng, nSw, cfg.use_alpha)
    living = (prev_mask & new_mask).astype(nS.dtype)
    return nS * living[..., None]


def rollout_cells(
    params: MLPParams,
    cfg: SPHNCAConfig,
    eng: CellEngine,
    S0: Array,
    key: Array,
    max_steps: int,
    h,
    *,
    n_steps: Optional[Array] = None,
    fire_rate: Optional[float] = None,
    collect_steps: Optional[Array] = None,
    remat: bool = True,
    use_pallas: bool = True,
    mesh=None,
    shards: int = 1,
):
    """Scan rollout in cell layout; mirrors models/rollout.rollout."""
    from .rollout import RolloutOut

    def step_fn(S, k):
        return nca_step_cells(params, cfg, eng, S, k, h,
                              fire_rate=fire_rate, use_pallas=use_pallas,
                              mesh=mesh, shards=shards)

    if remat:
        step_fn = jax.checkpoint(step_fn)

    collect = collect_steps is not None
    buf0 = (
        jnp.broadcast_to(S0, (collect_steps.shape[0],) + S0.shape)
        if collect
        else None
    )

    def body(carry, t):
        S, buf = carry
        nS = step_fn(S, jax.random.fold_in(key, t))
        if n_steps is not None:
            nS = jnp.where(t < n_steps, nS, S)
        if collect:
            hit = (collect_steps == t + 1)[:, None, None, None]
            buf = jnp.where(hit, nS[None], buf)
        return (nS, buf), None

    (final, buf), _ = jax.lax.scan(
        body, (S0, buf0), jnp.arange(max_steps), length=max_steps
    )
    return RolloutOut(final=final, collected=buf)


def rollout_states_cells(
    params: MLPParams,
    cfg: SPHNCAConfig,
    eng: CellEngine,
    A0: Array,  # [N, F] particle order
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    use_pallas: bool = True,
) -> Array:
    """Full trajectory in PARTICLE order [n_steps+1, N, F] via the cell
    engine (mirrors models/rollout.rollout_states for inference/export)."""
    S0 = eng.scatter(A0)

    def body(S, t):
        nS = nca_step_cells(params, cfg, eng, S, jax.random.fold_in(key, t),
                            h, fire_rate=fire_rate, use_pallas=use_pallas)
        return nS, eng.gather_back(nS)

    _, states = jax.lax.scan(body, S0, jnp.arange(n_steps))
    return jnp.concatenate([A0[None], states], axis=0)
