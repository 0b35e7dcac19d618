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


def _blockdiag_mlp_weights(params: MLPParams, b: int, f: int, c: int,
                           update_rule: str, dtype):
    """Expand the per-sample update MLP into block-diagonal weights that
    contract the LANE-batched y [rows, 3*B*F] directly.

    Any operand whose minor dim is the per-sample feature count (48/33)
    is lane-padded ~3-8x by TPU tiling, and assembling it from the
    128-lane state costs more in relayouts than the GEMM itself
    (profiled, RESULTS.md round 2). Instead the weights are expanded so
    the contraction runs over the full lane axis:

      W1x [3, B*F, B*H]  with  W1x[part, (b,fi), (b2,j)] = W1[part*F+fi, j] * (b==b2)
                        kept split by input part (A, gA_x, gA_y) so the
                        step contracts state and perception with
                        SEPARATE dots — no [rows, 3*B*F] input concat
                        (profiled 0.5 ms/step at [100k, 384]) and the
                        h*k perception rescale folds into the gA blocks
      W2x [B*H, ...]    block-diagonal per sample, with its OUTPUT
                        columns pre-permuted into lane-aligned groups:
                        gated: [gate (B*F) | delta (B*F) | mult (B)]
                        orig:  [dA (B*F)]
                        so the update rule consumes aligned slices
                        instead of strided lane-gathers.

    ~8x redundant FLOPs, but the MXU has ~100x headroom over the
    bandwidth-bound pair pass, and zero relayouts remain. Built from
    params only — XLA hoists the expansion out of the rollout scan.
    """
    w1, b1, w2, b2 = params.w1, params.b1, params.w2, params.b2
    hid = w1.shape[1]
    eye = jnp.eye(b, dtype=dtype)
    w1x = (
        w1.astype(dtype).reshape(3, 1, f, 1, hid)
        * eye[None, :, None, :, None]
    ).reshape(3, b * f, b * hid)
    b1x = jnp.tile(b1.astype(dtype), b)

    def expand_cols(wcols, bcols):
        # [hid, K] per-sample -> [B*hid, B*K] block-diagonal
        k = wcols.shape[1]
        wx = (
            wcols.astype(dtype).reshape(1, hid, 1, k)
            * eye[:, None, :, None]
        ).reshape(b * hid, b * k)
        return wx, jnp.tile(bcols.astype(dtype), b)

    if update_rule == "gated":
        wg, bg = expand_cols(w2[:, :c], b2[:c])
        wd, bd = expand_cols(w2[:, c : 2 * c], b2[c : 2 * c])
        wm, bm = expand_cols(w2[:, -1:], b2[-1:])
        w2x = jnp.concatenate([wg, wd, wm], axis=1)
        b2x = jnp.concatenate([bg, bd, bm])
    else:  # orig
        w2x, b2x = expand_cols(w2[:, :c], b2[:c])
    return w1x, b1x, w2x, b2x


def nca_step_cells_batched(
    params: MLPParams,
    cfg: SPHNCAConfig,
    eng: CellEngine,
    SB: Array,  # [C, M, B*F]
    b: int,
    key: Array,
    h,
    fire_rate: Optional[float] = None,
    mlp_dtype: Optional[str] = None,
    perception_transform=None,
    block_chunks: int = 1,
    blur_extra: Optional[Array] = None,  # [C, M, Ke] lanes to co-blur
    split_d: bool = False,  # hand the transform a d-tuple of gradient
    # components (skips the sublane->lane gaB concat, see
    # ops/bands.perceive_band_batched); requires perception_transform
) -> Array:
    """One NCA step over B same-geometry rollouts batched into the lane
    dimension (ops/batched.py layout). Semantically nca_step_cells per
    sample; the fire mask draws an independent Bernoulli per (slot,
    sample). This is the TPU throughput path: every hot operand keeps a
    128-lane-multiple minor dim (no relayouts) and the pair tables are
    read once per batch.

    ``blur_extra`` lanes ride the perception pass's life-mask blur
    (ops/batched.perceive_cells_batched ``extra``); their blur is handed
    to ``perception_transform(gaB, extra_blurred)``, which must then
    return ``(gaB', aux)`` — the step returns ``(nSB, aux)``. Used by
    the surface rollout to fuse the tangent diffusion (reference
    nca.py:352-357) into the step's own pair pass.

    ``mlp_dtype="bfloat16"`` runs the expanded update MLP in bf16 (the
    throughput setting); the default keeps f32 at Precision.HIGH
    (bf16x3), apply_mlp's documented accuracy class.
    """
    from ..ops.batched import mask_blur_batched, perceive_cells_batched

    if fire_rate is None:
        fire_rate = cfg.fire_rate
    c = cfg.channels
    C, M = SB.shape[0], SB.shape[1]
    f = SB.shape[-1] // b
    rows = C * M

    if split_d and perception_transform is None:
        raise ValueError("split_d requires a perception_transform")
    transform_aux = None
    if blur_extra is not None:
        gaB, pre_sm, extra_bl = perceive_cells_batched(
            eng, SB, b, cfg.use_alpha, block_chunks=block_chunks,
            out_dtype=mlp_dtype, extra=blur_extra, split_d=split_d,
        )
        prev_mask = pre_sm > ALIVE_THRESHOLD
        gaB, transform_aux = perception_transform(gaB, extra_bl)
    else:
        gaB, pre_sm = perceive_cells_batched(
            eng, SB, b, cfg.use_alpha, block_chunks=block_chunks,
            out_dtype=mlp_dtype, split_d=split_d,
        )  # [C, M, D*B*F] d-major lanes, [C, M, B]
        prev_mask = pre_sm > ALIVE_THRESHOLD
        if perception_transform is not None:
            # e.g. tangent projection for surface rollouts
            # (models/surface.project_tangent_space_lanes)
            gaB = perception_transform(gaB)

    nS = _update_core(
        params, cfg, SB.reshape(rows, b * f), gaB, b, f, key, h,
        fire_rate, mlp_dtype,
    )
    nSB = nS.reshape(C, M, b * f)

    from ..ops.batched import expand_lanes

    new_sm = mask_blur_batched(
        eng, jax.lax.stop_gradient(nSB), b, cfg.use_alpha
    )
    new_mask = new_sm > ALIVE_THRESHOLD
    living = expand_lanes(
        (prev_mask & new_mask).reshape(rows, b).astype(nS.dtype), f
    )
    out = (nS * living).reshape(C, M, b * f)
    if blur_extra is not None:
        return out, transform_aux
    return out


import os as _os

# Update-MLP implementation: "blockdiag" (lane-batched block-diagonal
# expansion, ~8x redundant FLOPs but zero relayouts — the round-2/3
# choice) or "sublane" (sample-major reshape to [rows*B, F] + SHARED
# 1x-FLOP weights, at the cost of lane<->sublane relayouts). The env
# var lets bench.py A/B the two on real hardware without threading a
# flag through every rollout signature.
_MLP_IMPL_DEFAULT = _os.environ.get("SPH_NCA_MLP_IMPL", "blockdiag")


def _update_core(
    params: MLPParams,
    cfg: SPHNCAConfig,
    SB2: Array,  # [rows, B*F] flat state
    gaB: Array,  # [..., D*B*F] d-major perception lanes
    b: int,
    f: int,
    key: Array,
    h,
    fire_rate: float,
    mlp_dtype: Optional[str],
    mlp_impl: Optional[str] = None,
) -> Array:
    """Engine-independent core of the batched NCA step: block-diagonal
    update MLP + gated/orig update + Bernoulli fire mask (reference
    nca.py:95-110). Returns the PRE-life-mask new state [rows, B*F];
    the caller applies the alive mask (engine-specific blur). Shared by
    the single-host step above and the halo-sharded step
    (parallel/band_shard.py)."""
    from ..ops.batched import expand_lanes

    c = cfg.channels
    rows = SB2.shape[0]
    scale = h * cfg.normalize_perception if cfg.normalize_perception > 0 \
        else jnp.float32(1.0)
    ydt = jnp.dtype(mlp_dtype) if mlp_dtype else SB2.dtype
    bf = b * f
    # HIGH = bf16x3 passes (~tf32), matching apply_mlp's documented
    # choice; HIGHEST (full f32) tripled the training backward's GEMM
    # time for accuracy beyond the reference's f32-fastmath CUDA.
    # Shared between both MLP impls so the A/B compares equal numerics.
    prec = (
        jax.lax.Precision.DEFAULT if mlp_dtype else jax.lax.Precision.HIGH
    )

    impl = mlp_impl or _MLP_IMPL_DEFAULT
    if impl == "sublane":
        return _update_core_sublane(
            params, cfg, SB2, gaB, b, f, key, h, fire_rate, ydt, scale,
            prec,
        )
    if impl == "pallas":
        return _update_core_pallas(
            params, cfg, SB2, gaB, b, f, key, h, fire_rate, ydt, scale,
        )

    w1x, b1x, w2x, b2x = _blockdiag_mlp_weights(
        params, b, f, c, cfg.update_rule, ydt
    )
    # Layer 1 as two dots on the native operands (A from the carry, gA
    # from perception) — no [rows, 3*B*F] input concat, and the h*k
    # perception rescale (reference nca.py:30) folds into the gA weight
    # blocks; both are loop-invariant, so XLA hoists them out of
    # rollout scans.
    w1a = w1x[0]
    w1g = (jnp.asarray(scale, ydt) * w1x[1:]).reshape(
        2 * bf, w1x.shape[-1]
    )
    # first 2*B*F perception lanes = gA_x, gA_y (reference nca.py:23-31
    # uses only x, y gradient components even in 3D); gaB carries D*B*F
    ga2 = gaB.reshape(rows, -1)[:, : 2 * bf].astype(ydt)
    hmid = jnp.maximum(
        jnp.matmul(SB2.astype(ydt), w1a, precision=prec)
        + jnp.matmul(ga2, w1g, precision=prec)
        + b1x,
        0.0,
    )
    # bf16 throughput mode keeps the pre-activation in bf16 (halves the
    # [rows, B*(2C+1)] write — the mode already rounds hmid to bf16, so
    # this stays in its documented accuracy class); f32 mode is exact.
    dA = (
        jnp.matmul(hmid, w2x, precision=prec) + b2x
    ).astype(ydt if mlp_dtype else jnp.float32)

    # per-sample [rows, B] masks expand to [rows, B*F] lanes via one-hot
    # MXU matmuls (ops/batched.expand_lanes) — jnp.repeat lowers to
    # broadcast relayouts that profiled ~0.3 ms each at this size
    if cfg.update_rule == "gated":
        gate = jax.nn.sigmoid(dA[:, :bf])
        delta = jnp.tanh(dA[:, bf : 2 * bf])
        mult = expand_lanes(
            jax.nn.sigmoid(dA[:, 2 * bf :]), f
        )  # [rows, B] -> per-feature lanes
        nS = SB2 * gate + delta * mult
    elif cfg.update_rule == "orig":
        nS = SB2 + dA * (cfg.fire_rate / fire_rate)
    else:
        raise ValueError(f"unknown update rule {cfg.update_rule!r}")

    u = jax.random.uniform(key, (rows, b))
    fire = expand_lanes(
        (u <= fire_rate).astype(nS.dtype), f
    )  # [rows, B*F] in {0, 1} (exact: one-hot matmul of exact 0/1)
    # select, not lerp: SB2 + 1*(nS - SB2) can differ from nS by 1 ulp
    # vs the reference's torch.where (drift compounds in long rollouts)
    return jnp.where(fire > 0.5, nS, SB2)


def _update_core_pallas(
    params: MLPParams,
    cfg: SPHNCAConfig,
    SB2: Array,  # [rows, B*F]
    gaB: Array,  # [..., D*B*F]
    b: int,
    f: int,
    key: Array,
    h,
    fire_rate: float,
    ydt,
    scale,
) -> Array:
    """Fused Pallas update MLP (ops/pallas/mlp_kernel.py): the sample-
    major restack happens INSIDE VMEM (vreg shuffles), so the shared
    1x-FLOP per-sample weights run without blockdiag's 8x redundancy
    and without sublane's HBM relayouts. Output column groups match
    blockdiag exactly, so the update-rule epilogue is shared."""
    from ..ops.batched import expand_lanes
    from ..ops.pallas.mlp_kernel import mlp_fused

    c = cfg.channels
    rows = SB2.shape[0]
    bf = b * f

    # per-sample weights, perception rescale folded into the gA rows
    w1 = params.w1.astype(ydt)
    w1k = jnp.concatenate(
        [w1[:f], jnp.asarray(scale, ydt) * w1[f:]], axis=0
    )  # [3F, hid]
    b1 = params.b1.astype(jnp.float32)[None]  # [1, hid]
    w2 = params.w2.astype(ydt)
    if cfg.update_rule not in ("gated", "orig"):
        raise ValueError(f"unknown update rule {cfg.update_rule!r}")
    if cfg.update_rule == "orig":
        w2 = w2[:, :c]
    b2 = params.b2.astype(jnp.float32)[None, : w2.shape[-1]]  # [1, K]

    tile = next((t for t in (1024, 512, 256, 128, 64, 32, 16, 8)
                 if rows % t == 0), rows)
    ga2 = gaB.reshape(rows, -1)[:, : 2 * bf].astype(ydt)
    g_pre, d_pre, m_pre = mlp_fused(
        SB2.astype(ydt), ga2, w1k, b1, w2, b2, b, f, tile
    )

    if cfg.update_rule == "gated":
        gate = jax.nn.sigmoid(g_pre)
        delta = jnp.tanh(d_pre)
        mult = expand_lanes(jax.nn.sigmoid(m_pre), f)
        nS = SB2 * gate + delta * mult
    else:  # orig
        nS = SB2 + g_pre * (cfg.fire_rate / fire_rate)

    u = jax.random.uniform(key, (rows, b))
    fire = expand_lanes((u <= fire_rate).astype(nS.dtype), f)
    return jnp.where(fire > 0.5, nS, SB2)


def _update_core_sublane(
    params: MLPParams,
    cfg: SPHNCAConfig,
    SB2: Array,  # [rows, B*F]
    gaB: Array,  # [..., D*B*F]
    b: int,
    f: int,
    key: Array,
    h,
    fire_rate: float,
    ydt,
    scale,
    prec,
) -> Array:
    """Sublane (sample-major) update MLP: reshape the lane-batched state
    to [rows*B, F] rows and contract with the SHARED per-sample weights
    — 1x FLOPs instead of blockdiag's ~8x, at the cost of the
    lane<->sublane relayouts the reshapes imply and K/N MXU padding
    (48->128, 33->128). VERDICT r4 experiment; A/B'd against blockdiag
    on the real chip via SPH_NCA_MLP_IMPL.

    Layout note that makes this cheap: SB2's lanes are sample-major
    ([A_s0 | A_s1 | ...]), and gaB's d-major blocks are sample-major
    within each block, so every reshape here is logically contiguous;
    likewise dA[:, :C].reshape(rows, B*C) lands exactly in the lane
    grouping the update rule consumes — no permute matmuls."""
    from ..ops.batched import expand_lanes

    c = cfg.channels
    rows = SB2.shape[0]
    bf = b * f
    rb = rows * b

    ga_flat = gaB.reshape(rows, -1)
    A8 = SB2.astype(ydt).reshape(rb, f)
    gx8 = ga_flat[:, :bf].astype(ydt).reshape(rb, f)
    gy8 = ga_flat[:, bf : 2 * bf].astype(ydt).reshape(rb, f)
    y = jnp.concatenate([A8, gx8, gy8], axis=-1)  # [rows*B, 3F]

    # fold the h*k perception rescale (reference nca.py:30) into the
    # gA rows of W1 — loop-invariant, hoisted out of rollout scans
    w1 = params.w1.astype(ydt)
    w1 = jnp.concatenate(
        [w1[:f], jnp.asarray(scale, ydt) * w1[f:]], axis=0
    )
    hm = jnp.maximum(
        jnp.matmul(y, w1, precision=prec) + params.b1.astype(ydt), 0.0
    )
    dA = (
        jnp.matmul(hm, params.w2.astype(ydt), precision=prec)
        + params.b2.astype(ydt)
    ).astype(jnp.float32)  # [rows*B, out]

    if cfg.update_rule == "gated":
        gate = jax.nn.sigmoid(dA[:, :c]).reshape(rows, bf)
        delta = jnp.tanh(dA[:, c : 2 * c]).reshape(rows, bf)
        mult = expand_lanes(
            jax.nn.sigmoid(dA[:, 2 * c]).reshape(rows, b), f
        )
        nS = SB2 * gate + delta * mult
    elif cfg.update_rule == "orig":
        dAr = dA[:, :c].reshape(rows, bf)
        nS = SB2 + dAr * (cfg.fire_rate / fire_rate)
    else:
        raise ValueError(f"unknown update rule {cfg.update_rule!r}")

    u = jax.random.uniform(key, (rows, b))
    fire = expand_lanes((u <= fire_rate).astype(nS.dtype), f)
    return jnp.where(fire > 0.5, nS, SB2)


def rollout_cells_batched(
    params: MLPParams,
    cfg: SPHNCAConfig,
    eng: CellEngine,
    SB0: Array,  # [C, M, B*F]
    b: int,
    key: Array,
    max_steps: int,
    h,
    *,
    n_steps: Optional[Array] = None,  # [B] per-sample step counts
    fire_rate: Optional[float] = None,
    collect_steps: Optional[Array] = None,
    remat: bool = True,
    mlp_dtype: Optional[str] = None,
    perception_transform=None,
    block_chunks: int = 1,
):
    """Scan rollout of the batched step; mirrors rollout_cells.
    ``n_steps`` may be per-sample [B] (progressive-growing rollouts
    freeze finished samples in place, reference nca.py:138-140)."""
    from .rollout import RolloutOut

    f = SB0.shape[-1] // b

    def step_fn(S, k):
        return nca_step_cells_batched(params, cfg, eng, S, b, k, h,
                                      fire_rate=fire_rate,
                                      mlp_dtype=mlp_dtype,
                                      perception_transform=perception_transform,
                                      block_chunks=block_chunks)

    if remat:
        step_fn = jax.checkpoint(step_fn)

    collect = collect_steps is not None
    buf0 = (
        jnp.broadcast_to(SB0, (collect_steps.shape[0],) + SB0.shape)
        if collect
        else None
    )

    def body(carry, t):
        S, buf = carry
        nS = step_fn(S, jax.random.fold_in(key, t))
        if n_steps is not None:
            live = (t < n_steps)  # [B]
            keep = jnp.repeat(live, f)  # lane mask [B*F]
            nS = jnp.where(keep[None, None, :], nS, S)
        if collect:
            hit = (collect_steps == t + 1)[:, None, None, None]
            buf = jnp.where(hit, nS[None], buf)
        return (nS, buf), None

    (final, buf), _ = jax.lax.scan(
        body, (SB0, buf0), jnp.arange(max_steps), length=max_steps
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
