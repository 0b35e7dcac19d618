"""Pallas TPU kernels: fused SPH pair pass over the cell-dense layout.

The XLA formulation of the cell engine (ops/cells.py) materializes pair
matrices T [C, M, WM] in HBM and lowers the per-cell contractions as
batched tiny matmuls, measuring ~20x off the roofline on v5e. These
kernels process one BLOCK of BG=8 Morton-consecutive cells per program —
[BG*M, Wu*M] pair tiles that actually fill the MXU/VPU — and fuse the
whole pass in VMEM:

    d2   = |xb|^2 + |xw|^2 - 2 xb xw^T           (MXU cross term)
    Tg   = sigma_g spiky_mag(d2) * v_w            (VPU)
    Tw   = sigma_W poly6(d2)     * v_w            (VPU)
    mom  = Tg @ [Aw, Aw*xw_d, xw, 1]              (MXU, [P,W]@[W,K])
    gA   = combine(mom, xb, Ab)                   (VPU moment expansion)
    mask = Tw @ alive(Aw)                         (MXU column)

so the only HBM traffic is the union-window states (pre-gathered outside
by one cell-granularity XLA gather — measured at full bandwidth) plus
per-block geometry. No T matrices ever exist. Block-local coordinate
frames keep the f32 moment cancellation benign.

The backward pass is the same shape of pair pass: the adjoint of the SPH
gradient is again a neighborhood operator (the reference hand-derives the
identical gather-form adjoint in operators_batch.py:238-343):

    dL/dA_j = sigma_g v_j sum_i mag_ij (x_j - x_i) . gbar_i - gbar_j . gsum_j

with gsum precomputed per geometry (CellEngine.gsum). Life-mask smoothing
is stop-gradient in the model (nca.py:76) and contributes no cotangent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import CellEngine

Array = jnp.ndarray


def _interpret() -> bool:
    """Interpret mode off-TPU (hermetic CPU tests)."""
    return jax.default_backend() != "tpu"


def _pair_d2(xbT, xwT):
    """[D, P] x [D, W] coordinate-major -> squared distances [P, W].

    Direct per-axis differences (NOT the |a|^2+|b|^2-2ab matmul trick):
    the spiky magnitude 3(h-d)^2/d amplifies d2 error by ~(h/d)^2 near
    d -> 0 (notably turning the exact-zero self-pair into a huge bogus
    term), so d2 must be computed cancellation-free. Coordinate-major
    layout keeps each axis slice a natural lane vector.
    """
    d2 = jnp.zeros((xbT.shape[1], xwT.shape[1]), jnp.float32)
    for d in range(xbT.shape[0]):
        r_d = xwT[d][None, :] - xbT[d][:, None]
        d2 = d2 + r_d * r_d
    return d2


def _spiky_mag(d2, h):
    """3(h-d)^2/d in the rsqrt form 3((h^2+d2)*r - 2h), r = 1/sqrt(d2):
    one transcendental and no divide per pair (the VPU-bound recompute
    kernels spend most of their time in this function). Algebraically
    identical: 3(h-d)^2/d = 3(h^2 - 2hd + d^2)/d = 3((h^2+d^2)/d - 2h).
    """
    r = jax.lax.rsqrt(jnp.where(d2 > 0.0, d2, 1.0))
    inside = (d2 > 0.0) & (d2 < h * h)
    return jnp.where(inside, 3.0 * ((h * h + d2) * r - 2.0 * h), 0.0)


def _fwd_kernel(
    scal_ref,  # SMEM [4]: h, sig_w, sig_g, alive_thr
    xb_ref,  # [D, P]   block rows, coordinate-major (block-local frame)
    ab_ref,  # [P, F]   block states
    xw_ref,  # [D, W]   union window positions, coordinate-major
    vw_ref,  # [1, W]   union window volumes
    sw_ref,  # [W, F]   union window states
    ga_ref,  # out [P, F*D] (d-major)
    sm_ref,  # out [1, P]
    *,
    use_alpha: bool,
):
    h = scal_ref[0]
    sig_w = scal_ref[1]
    sig_g = scal_ref[2]
    thr = scal_ref[3]
    ddim, p = xb_ref.shape
    f = ab_ref.shape[-1]

    xb = xb_ref[:]  # [D, P]
    xw = xw_ref[:]  # [D, W]
    vw = vw_ref[:]  # [1, W]
    aw = sw_ref[:]
    ab = ab_ref[:]

    # pair displacements per axis, reused by d2 and the gradient loop
    rs = [xw[d][None, :] - xb[d][:, None] for d in range(ddim)]  # [P, W]
    d2 = rs[0] * rs[0]
    for d in range(1, ddim):
        d2 = d2 + rs[d] * rs[d]
    Tg = sig_g * _spiky_mag(d2, h) * vw
    Tw = sig_w * jnp.maximum(h * h - d2, 0.0) ** 3 * vw

    # life-mask smoothing
    if use_alpha:
        alive = (aw[:, 3] > thr).astype(jnp.float32)[None, :]
    else:
        alive = (vw > 0.0).astype(jnp.float32)
    sm_ref[:] = jnp.sum(Tw * alive, axis=-1)[None, :]

    # Direct displacement form (no moment expansion — forming T * r_d from
    # pair displacements keeps f32 exact at the pair level, frame-free):
    #   grad_d = (Tg*r_d) @ Aw - Ab * rowsum(Tg*r_d)
    out = []
    for d in range(ddim):
        td = Tg * rs[d]
        g_d = jax.lax.dot_general(
            td, aw,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) - ab * jnp.sum(td, axis=-1, keepdims=True)
        out.append(g_d)
    ga_ref[:] = jnp.concatenate(out, axis=-1)


def _fwd_tab_kernel(
    scal_ref,  # SMEM [4]: h, sig_w, sig_g, alive_thr
    ab_ref,  # [P, F]   block states
    gsum_ref,  # [P, D]  quantization-consistent rowsum sig_g sum md_q v
    vw_ref,  # [1, W]   union window volumes
    sw_ref,  # [W, F]   union window states
    md_ref,  # [D*P, W] precomputed mag * (xw_d - xb_d), rows d-major
    w6_ref,  # [P, W]    precomputed poly6 core (table dtype)
    ga_ref,  # out [P, F*D] (d-major)
    sm_ref,  # out [1, P]
    *,
    use_alpha: bool,
):
    """Table fast path: the whole pair pass is ONE MXU matmul.

    With the displacement-scaled table md_d = mag * r_d (r = xw - xb)
    the direct-displacement gradient (see _fwd_kernel) is

        grad_d = sig_g md_d @ (vw * Aw) - Ab * gsum_d

    — one [D*P, W] @ [W, F] matmul for all D axes. No per-pair VPU work
    remains (that was the measured bottleneck of the recompute kernel),
    and the bf16 table quantizes at the PAIR level, so no block-frame
    cancellation amplification. CRITICALLY the rowsum correction gsum =
    sig_g sum_w md_q v_w is precomputed FROM THE QUANTIZED TABLE
    (ops/cells._blk_gsum_from_tables): a spatially-constant field then
    cancels to f32-accumulation noise; correcting with the exact-f32
    rowsum instead would leave an error of |A_const| * table-epsilon,
    which dwarfs the actual gradient signal |dA across h| on smooth
    states. The life-mask blur rides the same call as a [1,W]x[P,W]^T
    matvec on the poly6 table.
    """
    sig_w = scal_ref[1]
    sig_g = scal_ref[2]
    thr = scal_ref[3]
    p, f = ab_ref.shape
    ddim = md_ref.shape[0] // p

    vw = vw_ref[:]  # [1, W]
    aw = sw_ref[:]  # [W, F]
    ab = ab_ref[:]  # [P, F]
    gsum = gsum_ref[:]  # [P, D]
    # table read is bf16/f32 from HBM; COMPUTE in f32 (the upcast is free
    # VPU work, and an f32 rhs keeps the constant-field cancellation
    # against the f32 gsum exact — quantizing vw*Aw would reintroduce
    # the |A_const| * eps error the gsum trick removes)
    md = md_ref[:].astype(jnp.float32)  # [D*P, W]

    rhs = aw * vw[0][:, None]  # [W, F]
    mom = jax.lax.dot_general(
        md, rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D*P, F]

    out = []
    for d in range(ddim):
        out.append(
            sig_g * mom[d * p : (d + 1) * p] - ab * gsum[:, d : d + 1]
        )
    ga_ref[:] = jnp.concatenate(out, axis=-1)

    if use_alpha:
        alive = (aw[:, 3] > thr).astype(jnp.float32)
    else:
        alive = (vw[0] > 0.0).astype(jnp.float32)
    col = (sig_w * vw[0] * alive)[None, :]  # [1, W]
    sm_ref[:] = jax.lax.dot_general(
        col, w6_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, P]


def _bwd_tab_kernel(
    scal_ref,  # SMEM [4]
    vs_ref,  # [1, P]
    gsum_ref,  # [P, D]
    gbar_ref,  # [P, F*D] own cotangent (d-major)
    gw_ref,  # [W, F*D] window cotangents (d-major)
    md_ref,  # [D*P, W] precomputed mag * (xw_d - xb_d), rows d-major
    da_ref,  # out [P, F]
):
    """Table fast path of the gradient adjoint (see _bwd_kernel): with
    r_bwd = x_row - x_col = -(xw - xb),

        term1 = -sig_g v_row sum_d md_d @ G_d

    — D MXU matmuls over the stored table, zero per-pair VPU work."""
    sig_g = scal_ref[2]
    p = vs_ref.shape[-1]
    ddim = md_ref.shape[0] // p
    fd = gbar_ref.shape[-1]
    f = fd // ddim

    gw = gw_ref[:]  # [W, F*D]
    md = md_ref[:].astype(jnp.float32)  # [D*P, W]

    acc = jnp.zeros((p, f), jnp.float32)
    for d in range(ddim):
        acc = acc + jax.lax.dot_general(
            md[d * p : (d + 1) * p], gw[:, d * f : (d + 1) * f],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    term1 = -sig_g * vs_ref[0][:, None] * acc

    gb = gbar_ref[:]
    gsum = gsum_ref[:]
    t2 = jnp.zeros((p, f), jnp.float32)
    for d in range(ddim):
        t2 = t2 + gsum[:, d : d + 1] * gb[:, d * f : (d + 1) * f]
    da_ref[:] = term1 - t2


def _blur_tab_kernel(
    scal_ref,  # SMEM [4]
    vw_ref,  # [1, W]
    xw_ref,  # [W, F] window values
    w6_ref,  # [P, W] precomputed poly6 core
    out_ref,  # out [P, F]
):
    """SPH blur over the poly6 table: out = sig_w w6 @ (vw * Xw) — one
    [P, W] @ [W, F] MXU matmul (the F-channel generalization of the
    life-mask matvec). Used by the cell-layout tangent diffusion
    (models/surface.rollout_mesh_cells; reference nca.py:312-323)."""
    sig_w = scal_ref[1]
    vw = vw_ref[:]
    rhs = xw_ref[:] * vw[0][:, None]  # [W, F]
    out_ref[:] = sig_w * jax.lax.dot_general(
        w6_ref[:].astype(jnp.float32), rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mask_tab_kernel(
    scal_ref,  # SMEM [4]
    vw_ref,  # [1, W]
    aw_ref,  # [1, W] alive indicator of window slots
    w6_ref,  # [P, W] precomputed poly6 core
    sm_ref,  # out [1, P]
):
    sig_w = scal_ref[1]
    col = (sig_w * vw_ref[0] * aw_ref[0])[None, :]
    sm_ref[:] = jax.lax.dot_general(
        col, w6_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def window_from_flat(flat: Array, win_cells: Array, m: int) -> Array:
    """flat [C, M*F] -> union-window rows [nb, Wu*M, F] (one
    cell-granularity gather)."""
    nb, wu = win_cells.shape
    return flat[win_cells].reshape(nb, wu * m, -1)


def _bucket_window(eng: CellEngine, S: Array, win_cells: Array) -> Array:
    c, m = eng.num_cells, eng.slots_per_cell
    return window_from_flat(S.reshape(c, -1), win_cells, m)


def split_rows(arr: Array, shards: int, nb1: int):
    """Block-major rows laid out shard-major [b1 | b2] per shard
    (ops/cells.py bucketing) -> (bucket-1 rows, bucket-2 rows), each
    shard-major. For shards == 1 this is plain slicing."""
    nb = arr.shape[0]
    if shards == 1:
        return arr[:nb1], arr[nb1:]
    nb_loc, nb1_loc = nb // shards, nb1 // shards
    a = arr.reshape((shards, nb_loc) + arr.shape[1:])
    r1 = a[:, :nb1_loc].reshape((nb1,) + arr.shape[1:])
    r2 = a[:, nb1_loc:].reshape((nb - nb1,) + arr.shape[1:])
    return r1, r2


def merge_rows(r1: Array, r2: Array, shards: int) -> Array:
    """Inverse of split_rows."""
    if r2.shape[0] == 0:
        return r1
    if shards == 1:
        return jnp.concatenate([r1, r2], axis=0)
    n1, n2 = r1.shape[0] // shards, r2.shape[0] // shards
    out = jnp.concatenate(
        [r1.reshape((shards, n1) + r1.shape[1:]),
         r2.reshape((shards, n2) + r2.shape[1:])],
        axis=1,
    )
    return out.reshape((r1.shape[0] + r2.shape[0],) + r1.shape[1:])


def fwd_bucket(scal, xs_b, ab, xw_b, vw_b, Sw, *, use_alpha: bool,
               md=None, w6=None, gsum=None):
    """One pallas_call of the fused forward over one block bucket.
    xs_b [nb,D,P], ab [nb,P,F], xw_b [nb,D,W], vw_b [nb,W], Sw [nb,W,F]
    -> (ga [nb,P,F*D] d-major, sm [nb,1,P]). With ``md`` [nb,D*P,W] /
    ``w6`` [nb,P,W] pair tables (+ ``gsum`` [nb,P,D] rowsum correction)
    the MXU table kernel runs instead of the recompute kernel
    (positions are then not read at all)."""
    nb, ddim, p = xs_b.shape
    w = xw_b.shape[2]
    f = ab.shape[-1]
    if md is not None:
        kernel = functools.partial(_fwd_tab_kernel, use_alpha=use_alpha)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, p, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, ddim), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, w, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, ddim * p, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, w), lambda i: (i, 0, 0)),
        ]
        args = [scal, ab, gsum, vw_b[:, None, :], Sw, md, w6]
    else:
        kernel = functools.partial(_fwd_kernel, use_alpha=use_alpha)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, ddim, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, ddim, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, w, f), lambda i: (i, 0, 0)),
        ]
        args = [scal, xs_b, ab, xw_b, vw_b[:, None, :], Sw]
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, p, f * ddim), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, p), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, p, f * ddim), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, p), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)


def scal_vec(eng: CellEngine) -> Array:
    return jnp.stack([eng.h, eng.sig_w, eng.sig_g, jnp.float32(0.1)])


@functools.partial(jax.jit, static_argnames=("use_alpha", "d_major",
                                              "shards"))
def fused_perception_pallas(
    eng: CellEngine, S: Array, *, use_alpha: bool = True,
    d_major: bool = False, shards: int = 1,
) -> Tuple[Array, Array]:
    """Fused SPH gradient + life-mask smoothing.

    S [C, M, F] -> (gA [C, M, F, D], sm [C, M]); with ``d_major`` the
    gradient stays in the kernel's native [C, M, D*F] layout (axis-major
    blocks), which is exactly what the NCA feature concat consumes —
    skipping a 2x40MB transpose round trip per step at N=1e5.
    ``sm`` is the smoothed alive indicator (pre-threshold); the model
    treats it as stop-gradient (nca.py:76). Runs once per window-size
    bucket (tight width for most blocks, max width for the tail).

    ``shards`` must match the ``n_shards`` the engine was built with
    (bucket rows are laid out shard-major; see ops/cells.py).
    """
    c, m, f = S.shape
    ddim = eng.xs.shape[-1]
    p = eng.blk_xs.shape[2]  # BG*M
    scal = scal_vec(eng)
    nb1 = eng.blk_xs.shape[0]
    ab1, ab2 = split_rows(S.reshape(-1, p, f), shards, nb1)
    gs1 = gs2 = None
    if eng.blk_md is not None:
        gs1, gs2 = split_rows(eng.gsum.reshape(-1, p, ddim), shards, nb1)

    Sw1 = _bucket_window(eng, S, eng.blk_win_cells)
    ga1, sm1 = fwd_bucket(scal, eng.blk_xs, ab1, eng.blk_xw, eng.blk_vw,
                          Sw1, use_alpha=use_alpha,
                          md=eng.blk_md, w6=eng.blk_w6, gsum=gs1)
    if eng.blk2_xs.shape[0]:
        Sw2 = _bucket_window(eng, S, eng.blk2_win_cells)
        ga2, sm2 = fwd_bucket(scal, eng.blk2_xs, ab2, eng.blk2_xw,
                              eng.blk2_vw, Sw2, use_alpha=use_alpha,
                              md=eng.blk2_md, w6=eng.blk2_w6, gsum=gs2)
    else:
        ga2 = jnp.zeros((0, p, f * ddim), jnp.float32)
        sm2 = jnp.zeros((0, 1, p), jnp.float32)

    ga = merge_rows(ga1, ga2, shards)
    sm = merge_rows(sm1, sm2, shards).reshape(c, m)
    if d_major:
        return ga.reshape(c, m, ddim * f), sm
    # [nb, p, D*F] -> [C, M, F, D]
    ga = ga.reshape(c, m, ddim, f).transpose(0, 1, 3, 2)
    return ga, sm


# ---------------------------------------------------------------------------
# Backward: adjoint of the SPH gradient w.r.t. A (positions are static)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    scal_ref,  # SMEM [4]
    xb_ref,  # [D, P] coordinate-major
    vs_ref,  # [1, P]
    gsum_ref,  # [P, D]
    gbar_ref,  # [P, F*D] own cotangent (d-major)
    xw_ref,  # [D, W] coordinate-major
    gw_ref,  # [W, F*D] window cotangents (d-major)
    da_ref,  # out [P, F]
):
    h = scal_ref[0]
    sig_g = scal_ref[2]
    ddim, p = xb_ref.shape
    fd = gbar_ref.shape[-1]
    f = fd // ddim

    xb = xb_ref[:]
    xw = xw_ref[:]
    gw = gw_ref[:]

    rs = [xb[d_i][:, None] - xw[d_i][None, :] for d_i in range(ddim)]
    d2 = rs[0] * rs[0]
    for d_i in range(1, ddim):
        d2 = d2 + rs[d_i] * rs[d_i]
    mag = _spiky_mag(d2, h)  # [P, W]

    # term1 = sigma_g v_j sum_d (mag * r_d) @ gbar_d  with r = x_j - x_i
    acc = jnp.zeros((p, f), jnp.float32)
    for d_i in range(ddim):
        r_d = rs[d_i]
        acc = acc + jax.lax.dot_general(
            mag * r_d, gw[:, d_i * f : (d_i + 1) * f],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    term1 = sig_g * vs_ref[0][:, None] * acc

    gb = gbar_ref[:]
    gsum = gsum_ref[:]
    t2 = jnp.zeros((p, f), jnp.float32)
    for d_i in range(ddim):
        t2 = t2 + gsum[:, d_i : d_i + 1] * gb[:, d_i * f : (d_i + 1) * f]
    da_ref[:] = term1 - t2


def bwd_bucket(scal, xs_b, vs_b, gsum_b, gb_b, xw_b, gw, md=None):
    """One pallas_call of the gradient adjoint over one block bucket."""
    nb, ddim, p = xs_b.shape
    w = xw_b.shape[2]
    f = gb_b.shape[-1] // ddim
    if md is not None:
        kernel = _bwd_tab_kernel
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, ddim), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, ddim * f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, w, ddim * f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, ddim * p, w), lambda i: (i, 0, 0)),
        ]
        args = [scal, vs_b, gsum_b, gb_b, gw, md]
    else:
        kernel = _bwd_kernel
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, ddim, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, ddim), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, ddim * f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, ddim, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, w, ddim * f), lambda i: (i, 0, 0)),
        ]
        args = [scal, xs_b, vs_b, gsum_b, gb_b, xw_b, gw]
    (da,) = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((None, p, f), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, p, f), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return da


@functools.partial(jax.jit, static_argnames=("shards",))
def gradient_adjoint_dmajor_pallas(
    eng: CellEngine, gsum: Array, gflat: Array, shards: int = 1
) -> Array:
    """dL/dS of the SPH gradient with the cotangent d-major [C, M, D*F].

    IMPORTANT frame note: term1 mixes window positions with the query row
    positions, so the window copies must carry the same wrap shifts as the
    forward — which the bucket window arrays provide. The cotangents
    themselves are frame-independent.
    """
    c, m, fd = gflat.shape
    ddim = eng.xs.shape[-1]
    f = fd // ddim
    p = eng.blk_xs.shape[2]

    scal = scal_vec(eng)
    nb1 = eng.blk_xs.shape[0]
    gb1, gb2 = split_rows(gflat.reshape(-1, p, fd), shards, nb1)
    vs1, vs2 = split_rows(eng.vs.reshape(-1, 1, p), shards, nb1)
    gs1, gs2 = split_rows(gsum.reshape(-1, p, ddim), shards, nb1)

    gw1 = _bucket_window(eng, gflat, eng.blk_win_cells)
    da1 = bwd_bucket(scal, eng.blk_xs, vs1, gs1, gb1, eng.blk_xw, gw1,
                     md=eng.blk_md)
    if eng.blk2_xs.shape[0]:
        gw2 = _bucket_window(eng, gflat, eng.blk2_win_cells)
        da2 = bwd_bucket(scal, eng.blk2_xs, vs2, gs2, gb2, eng.blk2_xw, gw2,
                         md=eng.blk2_md)
    else:
        da2 = jnp.zeros((0, p, f), jnp.float32)
    return merge_rows(da1, da2, shards).reshape(c, m, f)


@functools.partial(jax.jit, static_argnames=("shards",))
def gradient_adjoint_pallas(
    eng: CellEngine, gsum: Array, gbar: Array, shards: int = 1
) -> Array:
    """dL/dS of the SPH gradient: gbar [C, M, F, D] -> [C, M, F]."""
    c, m, f, ddim = gbar.shape
    gflat = gbar.transpose(0, 1, 3, 2).reshape(c, m, ddim * f)
    return gradient_adjoint_dmajor_pallas(eng, gsum, gflat, shards)


# ---------------------------------------------------------------------------
# custom_vjp ops used by the model step
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def perceive_cells(eng: CellEngine, S: Array, use_alpha: bool = True,
                   shards: int = 1):
    """(gA [C,M,F,D], mask_smooth): differentiable w.r.t. S through gA
    only (mask_smooth is stop-gradient by construction, nca.py:76)."""
    ga, sm = fused_perception_pallas(eng, S, use_alpha=use_alpha,
                                     shards=shards)
    return ga, jax.lax.stop_gradient(sm)


def _perceive_fwd(eng, S, use_alpha, shards):
    ga, sm = fused_perception_pallas(eng, S, use_alpha=use_alpha,
                                     shards=shards)
    return (ga, jax.lax.stop_gradient(sm)), eng


def _perceive_bwd(use_alpha, shards, eng, cots):
    gbar, _ = cots  # mask cotangent discarded (stop-gradient)
    da = gradient_adjoint_pallas(eng, eng.gsum, gbar, shards)
    return (None, da)


perceive_cells.defvjp(_perceive_fwd, _perceive_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def perceive_cells_dmajor(eng: CellEngine, S: Array, use_alpha: bool = True,
                          shards: int = 1):
    """Like perceive_cells but gA stays in the kernel-native d-major
    [C, M, D*F] layout (no transpose in fwd or bwd)."""
    ga, sm = fused_perception_pallas(eng, S, use_alpha=use_alpha,
                                     d_major=True, shards=shards)
    return ga, jax.lax.stop_gradient(sm)


def _perceive_dm_fwd(eng, S, use_alpha, shards):
    ga, sm = fused_perception_pallas(eng, S, use_alpha=use_alpha,
                                     d_major=True, shards=shards)
    return (ga, jax.lax.stop_gradient(sm)), eng


def _perceive_dm_bwd(use_alpha, shards, eng, cots):
    gbar, _ = cots  # [C, M, D*F] d-major — the adjoint's native layout
    da = gradient_adjoint_dmajor_pallas(eng, eng.gsum, gbar, shards)
    return (None, da)


perceive_cells_dmajor.defvjp(_perceive_dm_fwd, _perceive_dm_bwd)


# ---------------------------------------------------------------------------
# standalone life-mask blur (post-update mask)
# ---------------------------------------------------------------------------


def _mask_kernel(
    scal_ref,  # SMEM [4]
    xb_ref,  # [D, P] coordinate-major
    xw_ref,  # [D, W] coordinate-major
    vw_ref,  # [1, W]
    aw_ref,  # [1, W] alive indicator of window slots
    sm_ref,  # out [1, P]
):
    h = scal_ref[0]
    sig_w = scal_ref[1]
    d2 = _pair_d2(xb_ref[:], xw_ref[:])
    Tw = sig_w * jnp.maximum(h * h - d2, 0.0) ** 3 * vw_ref[:]
    sm_ref[:] = jnp.sum(Tw * aw_ref[:], axis=-1)[None, :]


def mask_bucket(scal, xs_b, xw_b, vw_b, aw, w6=None):
    """One pallas_call of the life-mask blur over one block bucket."""
    nb, ddim, p = xs_b.shape
    w = xw_b.shape[2]
    if w6 is not None:
        (sm,) = pl.pallas_call(
            _mask_tab_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((None, p, w), lambda i: (i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((None, 1, p), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((nb, 1, p), jnp.float32)],
            interpret=_interpret(),
        )(scal, vw_b[:, None, :], aw[:, None, :], w6)
        return sm
    (sm,) = pl.pallas_call(
        _mask_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, ddim, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, ddim, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((None, 1, p), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, 1, p), jnp.float32)],
        interpret=_interpret(),
    )(scal, xs_b, xw_b, vw_b[:, None, :], aw[:, None, :])
    return sm


@functools.partial(jax.jit, static_argnames=("use_alpha", "shards"))
def mask_blur_pallas(
    eng: CellEngine, S: Array, *, use_alpha: bool = True, shards: int = 1
) -> Array:
    """Life-mask smoothing only: S [C, M, F] -> sm [C, M]."""
    c, m, f = S.shape

    act = None
    if use_alpha:
        act = (S[..., 3] > 0.1).astype(jnp.float32)[..., None]  # [C, M, 1]

    scal = scal_vec(eng)

    def bucket(xs_b, win_b, xw_b, vw_b, w6):
        if use_alpha:
            aw = _bucket_window(eng, act, win_b)[..., 0]
        else:
            aw = (vw_b > 0.0).astype(jnp.float32)
        return mask_bucket(scal, xs_b, xw_b, vw_b, aw, w6=w6)

    sm1 = bucket(eng.blk_xs, eng.blk_win_cells, eng.blk_xw, eng.blk_vw,
                 eng.blk_w6)
    if eng.blk2_xs.shape[0]:
        sm2 = bucket(eng.blk2_xs, eng.blk2_win_cells, eng.blk2_xw,
                     eng.blk2_vw, eng.blk2_w6)
    else:
        sm2 = jnp.zeros((0,) + sm1.shape[1:], jnp.float32)
    return merge_rows(sm1, sm2, shards).reshape(c, m)


def blur_bucket(scal, vw_b, Xw, w6):
    """One pallas_call of the table blur over one block bucket."""
    nb, w, f = Xw.shape
    p = w6.shape[1]
    (out,) = pl.pallas_call(
        _blur_tab_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, w, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, p, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((None, p, f), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, p, f), jnp.float32)],
        interpret=_interpret(),
    )(scal, vw_b[:, None, :], Xw, w6)
    return out


@functools.partial(jax.jit, static_argnames=("shards",))
def blur_cells_pallas(eng: CellEngine, X: Array, shards: int = 1) -> Array:
    """SPH blur in cell layout via the poly6 pair table:
    X [C, M, F] -> [C, M, F] (same semantics as CellEngine.blur /
    graph_blur at the engine's h; requires pair_tables). Powers the
    tangent-diffusion blur of mesh rollouts (reference nca.py:312-323,
    whose diffusion radius equals the trained model's h in practice)."""
    if eng.blk_w6 is None:
        raise ValueError(
            "blur_cells_pallas needs pair tables; rebuild the engine "
            "with build_cell_engine(..., pair_tables='float32'/'bfloat16')"
        )
    c, m, f = X.shape
    scal = scal_vec(eng)
    Xw1 = _bucket_window(eng, X, eng.blk_win_cells)
    o1 = blur_bucket(scal, eng.blk_vw, Xw1, eng.blk_w6)
    if eng.blk2_xs.shape[0]:
        Xw2 = _bucket_window(eng, X, eng.blk2_win_cells)
        o2 = blur_bucket(scal, eng.blk2_vw, Xw2, eng.blk2_w6)
    else:
        o2 = jnp.zeros((0,) + o1.shape[1:], jnp.float32)
    return merge_rows(o1, o2, shards).reshape(c, m, f)
