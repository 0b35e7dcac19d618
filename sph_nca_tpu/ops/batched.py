"""Batched-lane cell engine ops — the TPU throughput path.

Why this exists (measured on the round-2 chip, see RESULTS.md):

  * XLA batched ``dot_general`` streams HBM at ~1.6 TB/s on this chip;
    Pallas/Mosaic kernels stream the same tables at ~0.2-0.4 TB/s, and
    the recompute kernels are VPU-bound on per-pair scalars. With the
    static pair tables (positions never move during a rollout,
    reference nca.py:136) the whole pair pass is bandwidth, so the dot
    wins by ~4x.
  * A single rollout's dot rhs is [W, F] with F = 16: XLA pads the
    16-lane minor dimension to 128, so 7/8 of every byte moved around
    the dot is padding (profiled: the lane-pad relayouts cost more than
    the dot itself). Batching B = 8 rollouts of the SAME geometry into
    the lane dimension makes every hot operand [..., B*F = 128] —
    zero padding, and the tables are read ONCE per batch instead of
    once per sample.

The batch dimension is the reference's training batch (train.py batch 8
pool samples, all on the identical particle grid), so this is the
native layout for training AND for aggregate-throughput inference.

Layout: SB [C, M, B*F] — cell-dense slots with the lane dimension
holding (sample-major, feature-minor) so per-sample feature blocks are
contiguous. All ops below are pure XLA (differentiable, CPU-testable,
shardable along the lane/batch dim with jax.sharding).

Volume handling: the pair tables store UNSCALED md = mag*(xw-xb) and
w6 = (h^2-d2)^3 (ops/cells._blk_pair_mats); the reference math needs
per-pair multiplication by the SOURCE volume v_j (operators_batch.py
:222-229, :661-667). Rather than multiplying the 8x-replicated window
gather by vw (the naive rhs = Sw * vw), we pre-multiply the STATE once
per step (Sv = SB * vs, 8x less traffic) — gathering Sv gives exactly
vw * Sw. The alive threshold then becomes Sv_alpha > thr * vw with a
static per-window threshold vector.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .cells import CellEngine

Array = jnp.ndarray

ALIVE_THRESHOLD = 0.1  # reference nca.py:19,78


def batched_scatter(eng: CellEngine, A: Array) -> Array:
    """[B, N, F] particle-order -> SB [C, M, B*F] (pad slots zero)."""
    b, n, f = A.shape
    c, m = eng.num_cells, eng.slots_per_cell
    flat = jnp.zeros((c * m, b, f), A.dtype)
    flat = flat.at[eng.slot_of_particle].set(jnp.swapaxes(A, 0, 1))
    return flat.reshape(c, m, b * f)


def batched_gather_back(eng: CellEngine, SB: Array, b: int) -> Array:
    """SB [C, M, B*F] -> [B, N, F] particle order."""
    c, m = eng.num_cells, eng.slots_per_cell
    f = SB.shape[-1] // b
    flat = SB.reshape(c * m, b, f)[eng.slot_of_particle]  # [N, B, F]
    return jnp.swapaxes(flat, 0, 1)


def expand_lanes(a: Array, f: int) -> Array:
    """[rows, B] -> [rows, B*F] with each column repeated F times, as a
    one-hot matmul (an MXU pass; jnp.repeat lowers to broadcast_in_dim
    relayouts that profiled at ~0.3-0.7 ms each at [100k, 128])."""
    b = a.shape[-1]
    e = jnp.zeros((b, b * f), a.dtype).at[
        jnp.repeat(jnp.arange(b), f), jnp.arange(b * f)
    ].set(1.0)
    return jax.lax.dot_general(
        a, e, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype
    )


def _bucket_rows(eng: CellEngine):
    """(md, w6, win_cells, vw) per bucket, plus row split sizes."""
    return (
        (eng.blk_md, eng.blk_w6, eng.blk_win_cells, eng.blk_vw),
        (eng.blk2_md, eng.blk2_w6, eng.blk2_win_cells, eng.blk2_vw),
    )


def _win_gather(flat: Array, wc: Array, m: int) -> Array:
    """flat [C, M*L] -> [nb, W=Wu*M, L] window rows. The lane dim L is
    UNCHANGED by the reshape (M splits off the leading side), so no
    relayout happens — this is the property that makes the batched
    layout fast."""
    nb, wu = wc.shape
    return flat[wc].reshape(nb, wu * m, -1)


def _win_gather_slots(slot_flat: Array, wc: Array, m: int) -> Array:
    """slot_flat [C*M, L] -> [nb, Wu*M, L] via slot-granularity row
    indices. Same result as _win_gather with the [Wu, M*L] -> [Wu*M, L]
    relayout folded into the gather. Measured on the 100k bench: the 8x
    row count costs slightly more than the relayout it saves (15.4 vs
    14.8 ms/step), so _win_gather stays the default; kept as the
    measured alternative for geometries with fatter cells."""
    nb, wu = wc.shape
    ws = (wc[..., None] * m + jnp.arange(m, dtype=wc.dtype)).reshape(
        nb, wu * m
    )
    return slot_flat[ws]


@partial(jax.jit, static_argnames=("b", "use_alpha", "block_chunks",
                                   "out_dtype", "split_d"))
def perceive_cells_batched(
    eng,
    SB: Array,  # [C, M, B*F]
    b: int,
    use_alpha: bool = True,
    out_dtype=None,
    block_chunks: int = 1,
    extra: Optional[Array] = None,  # [C, M, Ke] extra lanes to blur
    split_d: bool = False,  # return gaB as a d-tuple (no lane concat)
) -> Tuple[Array, ...]:
    """Fused batched perception + pre-step life-mask blur.

    Returns (gaB [C, M, D*B*F] — d-major LANE blocks: lanes
    [i*B*F, (i+1)*B*F) hold the axis-i gradient — and pre_sm [C, M, B]).

    Per bucket, TWO batched matmuls over the static pair tables:
      wide:   mom = md [3P, W] @ Sv_w [W, B*F]      (the SPH gradient)
      narrow: sm  = w6 [P, W]  @ (vw*alive) [W, B]  (life-mask blur)
    plus the gsum rowsum correction (quantization-consistent, see
    ops/cells._blk_gsum_from_tables). Semantics match
    pair_kernel._fwd_tab_kernel / reference operators_batch.py:222-229.

    A BandEngine (ops/bands.py, the round-3 throughput engine) routes to
    the band implementation — same contract, C = blocks / M = rows.
    ``out_dtype="bfloat16"`` requests bf16 gradient output (band engine
    only; the cell path always emits f32).

    ``extra`` [C, M, Ke]: extra lanes to SPH-blur in the same pass
    (returns a third output [C, M, Ke]); the band engine fuses them
    into the life-mask window/dot, the cell engine falls back to a
    separate blur_batched pass.
    """
    from .bands import BandEngine, perceive_band_batched

    if isinstance(eng, BandEngine):
        return perceive_band_batched(eng, SB, b, use_alpha,
                                     out_dtype=out_dtype, extra=extra,
                                     split_d=split_d)
    if split_d:
        # cell engine: fall back to slicing the concat (the relayout
        # saving is a band-engine layout property)
        out = perceive_cells_batched(eng, SB, b, use_alpha,
                                     out_dtype=out_dtype,
                                     block_chunks=block_chunks,
                                     extra=extra)
        f = SB.shape[-1]
        ga = out[0]
        d = ga.shape[-1] // f
        parts = tuple(ga[..., i * f : (i + 1) * f] for i in range(d))
        return (parts,) + tuple(out[1:])
    if eng.blk_md is None:
        raise ValueError("engine was built without pair_tables")
    c, m, d = eng.xs.shape
    p = eng.blk_xs.shape[2]
    nb = c * m // p
    nb1 = eng.blk_md.shape[0]
    f = SB.shape[-1] // b

    vs = eng.vs  # [C, M]
    tdt = eng.blk_md.dtype  # dots run in the table dtype (see below)
    # cast BEFORE the gather: converting the state (11 MB) beats
    # converting its 8x-replicated window gather (profiled)
    Sv = (SB * vs[..., None]).astype(tdt)  # volume-premultiplied state
    Sv_flat = Sv.reshape(c, m * b * f)
    SBr = SB.reshape(nb, p, b * f)
    gsum = eng.gsum.reshape(nb, p, d)

    # alive indicator: alpha lanes extracted with a lane-take (a
    # reshape to [..., B, F] would lane-pad F to 128 and relayout)
    rows = c * m
    if use_alpha:
        alpha = jnp.take(
            Sv.reshape(rows, b * f), jnp.arange(b) * f + 3, axis=-1
        )  # [rows, B]
        alive_src = alpha > (ALIVE_THRESHOLD * vs).reshape(rows, 1).astype(
            tdt
        )
    else:
        alive_src = jnp.broadcast_to(
            (vs > 0.0).reshape(rows, 1), (rows, b)
        )
    acol_flat = (
        alive_src * vs.reshape(rows, 1)
    ).astype(tdt).reshape(c, m * b)
    gas, sms = [], []
    row0 = 0
    for md, w6, wc, vw in _bucket_rows(eng):
        nbk = md.shape[0]
        if nbk == 0:
            row0 += nbk
            continue
        sl = slice(row0, row0 + nbk)

        def one_chunk(md_c, w6_c, wc_c, SBr_c, gsum_c):
            Sw = _win_gather(Sv_flat, wc_c, m)  # [nbc, W, B*F]
            # dot in the TABLE dtype: upcasting a bf16 table would
            # materialize an f32 copy of the whole table EVERY STEP
            # (profiled); downcasting the (8x smaller) gathered states
            # is the cheap direction. With f32 tables this is exact.
            mom = jax.lax.dot_general(
                md_c, Sw.astype(md_c.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nbc, 3P, B*F]
            # assemble the corrected gradient as LANE blocks (d-major):
            # any shape whose minor dim is 16 gets lane-padded 8x by TPU
            # tiling and every op on it becomes a relayout (profiled) —
            # so the d axis is concatenated into lanes, never split out
            ga = jnp.concatenate(
                [
                    eng.sig_g * mom[:, i * p : (i + 1) * p]
                    - SBr_c * gsum_c[..., i : i + 1]
                    for i in range(d)
                ],
                axis=-1,
            )  # [nbc, P, D*B*F] d-major lane blocks
            acolw = _win_gather(acol_flat, wc_c, m)  # [nbc, W, B]
            sm = jax.lax.dot_general(
                w6_c, acolw,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nbc, P, B]
            return ga, eng.sig_w * sm

        # largest divisor of the bucket size <= the requested chunking
        k = max(d for d in range(1, block_chunks + 1) if nbk % d == 0)
        if k > 1:
            # bound peak memory at the 1e6+ regime: the window gather +
            # mom intermediates are O(pairs); lax.map over k block
            # chunks keeps only 1/k of them live at once
            ops_ = [
                a.reshape((k, nbk // k) + a.shape[1:])
                for a in (md, w6, wc, SBr[sl], gsum[sl])
            ]
            ga, sm = jax.lax.map(lambda t: one_chunk(*t), tuple(ops_))
            ga = ga.reshape((nbk,) + ga.shape[2:])
            sm = sm.reshape((nbk,) + sm.shape[2:])
        else:
            ga, sm = one_chunk(md, w6, wc, SBr[sl], gsum[sl])
        gas.append(ga)
        sms.append(sm)
        row0 += nbk

    gaB = jnp.concatenate(gas, 0).reshape(c, m, d * b * f)
    pre_sm = jnp.concatenate(sms, 0).reshape(c, m, b)
    if extra is None:
        return gaB, pre_sm
    return gaB, pre_sm, blur_batched(eng, extra, b)


@partial(jax.jit, static_argnames=("b", "use_alpha"))
def mask_blur_batched(
    eng,
    SB: Array,  # [C, M, B*F]
    b: int,
    use_alpha: bool = True,
) -> Array:
    """Batched life-mask blur: blur of (activity > 0.1) per sample.
    Returns sm [C, M, B] (caller thresholds). Reference nca.py:71-79 /
    pair_kernel._mask_tab_kernel."""
    from .bands import BandEngine, mask_blur_band

    if isinstance(eng, BandEngine):
        return mask_blur_band(eng, SB, b, use_alpha)
    if eng.blk_md is None:
        raise ValueError("engine was built without pair_tables")
    c, m, _ = eng.xs.shape
    p = eng.blk_xs.shape[2]
    f = SB.shape[-1] // b
    vs = eng.vs
    rows = c * m
    if use_alpha:
        alpha = jnp.take(
            SB.reshape(rows, b * f), jnp.arange(b) * f + 3, axis=-1
        )  # [rows, B] — lane-take, not reshape+slice (relayout)
        alive = (alpha > ALIVE_THRESHOLD) & (vs > 0.0).reshape(rows, 1)
    else:
        alive = jnp.broadcast_to((vs > 0.0).reshape(rows, 1), (rows, b))
    tdt = eng.blk_md.dtype
    acol_flat = (alive * vs.reshape(rows, 1)).astype(tdt).reshape(c, m * b)

    sms = []
    for md, w6, wc, vw in _bucket_rows(eng):
        if md.shape[0] == 0:
            continue
        acolw = _win_gather(acol_flat, wc, m)  # [nbk, W, B]
        sm = jax.lax.dot_general(
            w6, acolw,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        sms.append(eng.sig_w * sm)
    return jnp.concatenate(sms, 0).reshape(c, m, b)


@partial(jax.jit, static_argnames=("b",))
def blur_batched(eng, XB: Array, b: int) -> Array:
    """Batched SPH blur of arbitrary per-slot features XB [C, M, B*K]
    -> [C, M, B*K] (reference operators_batch.py:601-671 semantics via
    the w6 table). Used by batched tangent diffusion."""
    from .bands import BandEngine, blur_band

    if isinstance(eng, BandEngine):
        return blur_band(eng, XB)
    if eng.blk_md is None:
        raise ValueError("engine was built without pair_tables")
    c, m, _ = eng.xs.shape
    # cast BEFORE the gather (converting the 8x-replicated window
    # gather profiled at ~0.85 ms/step on the surface bench)
    Xv = (XB * eng.vs[..., None]).astype(eng.blk_md.dtype)
    Xv_flat = Xv.reshape(c, -1)
    outs = []
    for md, w6, wc, vw in _bucket_rows(eng):
        if md.shape[0] == 0:
            continue
        Xw = _win_gather(Xv_flat, wc, m)
        o = jax.lax.dot_general(
            w6, Xw,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(eng.sig_w * o)
    return jnp.concatenate(outs, 0).reshape(XB.shape)
