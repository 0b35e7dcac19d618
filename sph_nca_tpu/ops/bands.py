"""Band SPH engine — curve-banded pair structure, the TPU throughput path.

Round-3 redesign of the pair pass. The cell-dense engine (ops/cells.py)
pays for every (row, window-slot) candidate pair: on the 100k bench its
89M candidate pairs cover only 2.95M true neighbor pairs (~30x waste in
table bytes), and its per-cell window gather costs ~2 ms/step (XLA row
gathers stream HBM at only ~0.08-0.17 TB/s on this chip, measured).
This engine restructures the computation around the space-filling curve
instead of around cells:

  * particles are sorted by the Morton rank of their cell (size h) and
    grouped into blocks of P=64 consecutive rows — no slot padding, rows
    are exactly the particles;
  * ~80% of true pairs connect rows whose blocks are curve-adjacent
    (measured on the 100k surface bench). Those are covered by a BAND
    window: blocks [b-1, b, b+1], assembled with two `jnp.roll`s and a
    concat — sequential full-bandwidth streams, NO gather at all;
  * the remaining curve-far pairs are covered per block by a compacted
    list of far GROUPS (16 curve-consecutive particles each, only groups
    actually containing neighbors), gathered at group granularity.
    Blocks are bucketed by far-list width (few static shapes); bucket
    outputs are re-assembled by a [nb]-row permutation gather (~free);
  * all pair weights are baked into static tables (positions never move
    during a rollout, reference nca.py:136), INCLUDING the source volume
    v_j: one table [nb, 3P, (D+1)*P] holds, per band column w and row p,
    the spiky factors md_d = mag * (x_w - x_p)_d * v_w for each axis and
    the poly6 core w6v = (h^2 - d2)^3 * v_w. Every pair pass is then one
    batched MXU matmul contracting over the window axis — which sits in
    the SUBLANE dimension of both operands, so table padding is 8/16
    rows, not 128 lanes (measured: these dots stream at 1.6-2.4 TB/s).

Semantics are identical to the reference operators (operators_batch.py):
same kernels, same normalizations, sums over exactly the true |r| < h
neighborhoods (band/far table entries for out-of-range pairs are zero).
Periodic domains bake whole-period wrap shifts into the pair weights at
build time (ghost-free, like the cell engine); a pair interacting
through several images accumulates all of them in its table entry.

The public batched-lane ops (ops/batched.py) dispatch here when handed a
BandEngine — the model/rollout layers (models/cell_step.py,
models/surface.py) run unchanged on either engine, with C = nb blocks
and M = P rows taking the place of cells and slots.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels as K
from .cells import PAD_POS, _hilbert_code, _morton_code
from .hashgrid import _stencil_offsets

Array = jnp.ndarray


class BandEngine(NamedTuple):
    """Static per-geometry band structure (a pytree of device arrays).

    nb = number of row blocks, P = rows (particles) per block,
    D = spatial dims, R = nb * P padded rank count, N = particles.
    Field names/shapes mirror CellEngine where the semantics coincide
    (nb blocks <-> C cells, P rows <-> M slots) so the model layer works
    on either engine.
    """

    # layout map: particle -> rank (= block * P + row)
    slot_of_particle: Array  # [N] int32
    # geometry in rank order
    xs: Array  # [nb, P, D] positions (pad rows: PAD_POS)
    vs: Array  # [nb, P]    volumes   (pad rows: 0)
    # band pair table: [nb, 3P, (D+1)*P]; window rows w = slot*P + row_j
    # with slot 0/1/2 = rolled block b-1 / b / b+1; columns c*P + row_i
    # hold md_c = mag * r_c * v_j for c < D and w6v = (h^2-d2)^3 * v_j
    # for c = D. Entries for non-neighbor candidate pairs are exactly 0.
    Tband: Array
    # gradient-adjoint self term, re-derived from the QUANTIZED tables
    # (grad of a constant field cancels to accumulation noise, not table
    # quantization noise — see ops/cells._blk_gsum_from_tables)
    gsum: Array  # [nb, P, D] f32
    # neighbor counts within h, incl. self (reference `count` op)
    nbr_count: Array  # [nb, P] int32
    # far structure, bucketed by width (tuples of per-bucket arrays):
    far_blocks: Tuple[Array, ...]  # [nbt] int32 block ids (Morton order)
    far_groups: Tuple[Array, ...]  # [nbt, Wt] int32 group ids (pad: 0)
    far_tabs: Tuple[Array, ...]  # [nbt, Wt*g, (D+1)*P] like Tband
    # 1.0 where the far window row is a real particle (vw > 0), else 0 —
    # lets the alive indicator be DERIVED from gathered state windows
    # instead of gathering a second (padded) alive array
    far_vwmask: Tuple[Array, ...]  # [nbt, Wt*g] table dtype
    # block permutation assembling concat(bucket outputs + zero rows)
    # back into Morton block order: out_morton = out_concat[far_perm]
    far_perm: Array  # [nb] int32
    # constants
    h: Array
    sig_w: Array  # smoothing normalization sigma_W
    sig_g: Array  # gradient normalization sigma_g

    # -- shape helpers (CellEngine-compatible) ----------------------------

    @property
    def num_cells(self) -> int:
        return self.xs.shape[0]

    @property
    def slots_per_cell(self) -> int:
        return self.xs.shape[1]

    @property
    def num_particles(self) -> int:
        return self.slot_of_particle.shape[0]

    @property
    def dim(self) -> int:
        return self.xs.shape[2]

    @property
    def far_group_size(self) -> int:
        for grp, tab in zip(self.far_groups, self.far_tabs):
            if grp.shape[1]:
                return tab.shape[1] // grp.shape[1]
        return 1

    # -- layout conversion (same contract as CellEngine) ------------------

    def scatter(self, A: Array) -> Array:
        """[N, F] particle order -> [nb, P, F] rank layout (pad rows 0)."""
        nb, p = self.num_cells, self.slots_per_cell
        F = A.shape[-1]
        flat = jnp.zeros((nb * p, F), A.dtype)
        flat = flat.at[self.slot_of_particle].set(A)
        return flat.reshape(nb, p, F)

    def gather_back(self, S: Array) -> Array:
        """[nb, P, F] rank layout -> [N, F] particle order."""
        nb, p = self.num_cells, self.slots_per_cell
        return S.reshape(nb * p, S.shape[-1])[self.slot_of_particle]

    # -- operator API (parity/tests; the hot path lives in ops/batched) --

    def count(self) -> Array:
        return self.nbr_count

    def volume_consistency(self) -> Array:
        """sigma_W sum_w W v_w per row (~1 for real rows; tests)."""
        ones = jnp.ones((self.num_cells, self.slots_per_cell, 1))
        return self.sig_w * band_blur_pass(self, ones)[..., 0]


def band_window(X: Array) -> Array:
    """[nb, P, L] -> [nb, 3P, L] band windows via two rolls + concat —
    sequential streams, no gather. Wrap-around at the ends is harmless:
    table entries there are zero unless the pair is genuinely in range
    (periodic domains where the curve ends meet)."""
    return jnp.concatenate(
        [jnp.roll(X, 1, axis=0), X, jnp.roll(X, -1, axis=0)], axis=1
    )


def _pair_dot(T: Array, W: Array, out_dtype=jnp.float32) -> Array:
    """Contract over the window axis — SUBLANE dim of both operands
    ([nb, W, C] x [nb, W, L] -> [nb, C, L]), so the static table pads W
    to 8/16 rows instead of 128 lanes. The MXU accumulates in f32
    regardless of ``out_dtype``; bf16 output only rounds the result."""
    return jax.lax.dot_general(
        T, W, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=out_dtype,
    )


def _far_window(eng: BandEngine, Xflat: Array, t: int) -> Array:
    """Far window states for bucket t: [R, L] -> [nbt, Wt*g, L] via one
    group-granularity gather. Rows are packed g-per-row (g*L lanes) so
    narrow inputs (the L=B alive columns, the 4B diffusion moments) move
    g*L-lane rows instead of g separate 128-lane-padded rows — 4-16x
    fewer gather bytes on the blur passes."""
    grp = eng.far_groups[t]
    g = eng.far_group_size
    nbt, wt = grp.shape
    L = Xflat.shape[-1]
    return Xflat.reshape(-1, g * L)[grp].reshape(nbt, wt * g, L)


def _combine_far(eng: BandEngine, outs, out_rows: int, L: int,
                 dtype=jnp.float32) -> Array:
    """Concat per-bucket outputs (+ zero rows for no-far blocks) and
    permute back to Morton block order ([nb]-row gather, ~free)."""
    nb = eng.num_cells
    n_far = sum(int(o.shape[0]) for o in outs)
    parts = list(outs)
    if n_far < nb:
        parts.append(jnp.zeros((nb - n_far, out_rows, L), dtype))
    full = jnp.concatenate(parts, axis=0)
    return full[eng.far_perm]


def band_md_pass(eng: BandEngine, X: Array) -> Array:
    """Raw spiky moments sum_j md[:, j] * X[j] for all D axes:
    [nb, P, L] -> [nb, D*P, L] f32 (band + far, unscaled by sigma_g)."""
    d, p = eng.dim, eng.slots_per_cell
    Tmd = eng.Tband[:, :, : d * p]
    out = _pair_dot(Tmd, band_window(X))
    if eng.far_blocks:
        Xflat = X.reshape(-1, X.shape[-1])
        outs = [
            _pair_dot(tab[:, :, : d * p], _far_window(eng, Xflat, t))
            for t, tab in enumerate(eng.far_tabs)
        ]
        out = out + _combine_far(eng, outs, d * p, X.shape[-1])
    return out


def band_blur_pass(eng: BandEngine, Y: Array) -> Array:
    """Volume-weighted poly6 pair sum sum_j w6v[:, j] * Y[j]:
    [nb, P, Ln] -> [nb, P, Ln] f32 (band + far, unscaled by sigma_W)."""
    d, p = eng.dim, eng.slots_per_cell
    Tw = eng.Tband[:, :, d * p :]
    out = _pair_dot(Tw, band_window(Y))
    if eng.far_blocks:
        Yflat = Y.reshape(-1, Y.shape[-1])
        outs = [
            _pair_dot(tab[:, :, d * p :], _far_window(eng, Yflat, t))
            for t, tab in enumerate(eng.far_tabs)
        ]
        out = out + _combine_far(eng, outs, p, Y.shape[-1])
    return out


ALIVE_THRESHOLD = 0.1  # reference nca.py:19,78


def _take_lanes(flat: Array, idx, out_lanes: int) -> Array:
    """Select lane columns via a one-hot MXU matmul ([rows, L] ->
    [rows, out_lanes]). jnp.take on the lane axis lowers to a strided
    relayout that profiled ~3x slower than this dot at [100k, 128]."""
    E = jnp.zeros((flat.shape[-1], out_lanes), flat.dtype).at[
        jnp.asarray(idx), jnp.arange(out_lanes)
    ].set(1.0)
    return jax.lax.dot_general(
        flat, E, (((1,), (0,)), ((), ())),
        preferred_element_type=flat.dtype,
    )


def _alive_cols(eng: BandEngine, XB: Array, b: int, dtype) -> Array:
    """Per-(row, sample) alive indicator [nb, P, B] in the table dtype
    (volume factors live in the w6v table, so no v multiply here).
    ``XB`` should already be cast to the table dtype so thresholds are
    consistent with windows derived from gathered (cast) state."""
    nb, p = XB.shape[0], XB.shape[1]
    f = XB.shape[-1] // b
    rows = nb * p
    flat = XB.reshape(rows, b * f)
    alpha = _take_lanes(flat, jnp.arange(b) * f + 3, b)
    alive = (alpha > ALIVE_THRESHOLD) & (eng.vs.reshape(rows, 1) > 0.0)
    return alive.astype(dtype).reshape(nb, p, b)


@partial(jax.jit, static_argnames=("b", "use_alpha", "out_dtype",
                                   "split_d"))
def perceive_band_batched(
    eng: BandEngine,
    XB: Array,  # [nb, P, B*F]
    b: int,
    use_alpha: bool = True,
    out_dtype=None,
    extra: Optional[Array] = None,  # [nb, P, Ke] extra lanes to blur
    split_d: bool = False,
) -> Tuple[Array, ...]:
    """Fused batched perception + pre-step life-mask blur.

    Returns (gaB [nb, P, D*B*F] d-major lane blocks, pre_sm [nb, P, B])
    — the same contract as ops.batched.perceive_cells_batched.
    Semantics: reference operators_batch.py:222-229 (gradient) and
    nca.py:71-79 (life mask blur).

    The far state windows are gathered ONCE per bucket and shared by the
    gradient dot and the life-mask blur dot: the alive indicator is
    derived from the gathered window's alpha lanes and the static
    ``far_vwmask`` instead of gathering a second alive array.

    ``extra`` rides the life-mask blur pass: its lanes are appended to
    the alive columns, so the SAME w6v-table dot (and the same far
    window gather, widened by Ke lanes) also produces their SPH blur
    (reference operators_batch.py:601-671 semantics — v_j lives in the
    table, pad pairs are exactly zero). Used to fuse the surface
    rollout's tangent diffusion (reference nca.py:312-323,352-357) into
    the perception pass; returns a third output, the blurred extra
    lanes [nb, P, Ke] (sig_W-scaled, f32).

    ``out_dtype="bfloat16"`` emits the gradient moments and gaB in bf16
    (the throughput setting when the update MLP runs bf16 anyway —
    halves the [nb, D*P, L] intermediate traffic). Default f32.
    """
    d, p = eng.dim, eng.slots_per_cell
    nb = XB.shape[0]
    tdt = eng.Tband.dtype
    odt = jnp.dtype(out_dtype) if out_dtype else jnp.float32
    Xc = XB.astype(tdt)
    L = XB.shape[-1]
    f = L // b
    alpha_idx = jnp.arange(b) * f + 3
    ke = 0 if extra is None else extra.shape[-1]

    def alive_of(Xw: Array, vmask: Array) -> Array:
        # Xw [nw, W, L] (table dtype); vmask [nw, W, 1] — 1.0 real rows
        if use_alpha:
            nw, W = Xw.shape[0], Xw.shape[1]
            al = _take_lanes(Xw.reshape(nw * W, L), alpha_idx, b)
            al = al.reshape(nw, W, b) > ALIVE_THRESHOLD
            return al.astype(tdt) * vmask
        return jnp.broadcast_to(
            vmask, Xw.shape[:-1] + (b,)
        ).astype(tdt)

    # band part: the alive columns are computed ONCE in rank space and
    # roll-windowed (rolls are cheap; lane-takes on the 3x window not)
    if use_alpha:
        acol = _alive_cols(eng, Xc, b, tdt)  # [nb, P, B]
    else:
        acol = jnp.broadcast_to(
            (eng.vs > 0.0)[..., None], (nb, p, b)
        ).astype(tdt)
    if extra is not None:
        # the extra lanes share the alive window/dot (pad-pair table
        # entries are zero, so no mask is needed on them)
        acol = jnp.concatenate([acol, extra.astype(tdt)], axis=-1)
    Wb = band_window(Xc)  # [nb, 3P, L]
    mom = _pair_dot(eng.Tband[:, :, : d * p], Wb, odt)  # [nb, D*P, L]
    sm = _pair_dot(eng.Tband[:, :, d * p :], band_window(acol))

    if eng.far_blocks:
        Xflat = Xc.reshape(-1, L)
        # the extra lanes get their OWN narrow gather per bucket
        # (widening the state rows to L+Ke lanes broke the lane tiling
        # of the packed [R/g, g*L] gather source — profiled +0.36
        # ms/step of relayout; two tile-aligned gathers are cheaper)
        eflat = None if extra is None else extra.astype(tdt).reshape(-1, ke)
        mouts, souts = [], []
        for t, tab in enumerate(eng.far_tabs):
            Xw = _far_window(eng, Xflat, t)  # the bucket's state gather
            mouts.append(_pair_dot(tab[:, :, : d * p], Xw, odt))
            vm = eng.far_vwmask[t][..., None]
            aw = alive_of(Xw, vm)
            if extra is not None:
                aw = jnp.concatenate(
                    [aw, _far_window(eng, eflat, t)], axis=-1
                )
            souts.append(_pair_dot(tab[:, :, d * p :], aw))
        mom = mom + _combine_far(eng, mouts, d * p, L, dtype=odt)
        sm = sm + _combine_far(eng, souts, p, b + ke)

    Xo = XB.astype(odt) if out_dtype else XB
    gs = eng.gsum.astype(odt)
    comps = [
        (eng.sig_g.astype(odt) * mom[:, i * p : (i + 1) * p])
        - Xo * gs[..., i : i + 1]
        for i in range(d)
    ]  # d x [nb, P, B*F] in odt
    # ``split_d``: hand the axis components back unconcatenated. mom is
    # d-major along SUBLANES; the default lane-concat is a genuine
    # sublane->lane relayout (profiled 0.26 ms/step at bench scale) that
    # the tangent projection immediately re-slices — callers that
    # consume per-axis components should take the tuple instead.
    gaB = tuple(comps) if split_d else jnp.concatenate(comps, axis=-1)
    if extra is None:
        return gaB, eng.sig_w * sm
    sm = eng.sig_w * sm
    return gaB, sm[..., :b], sm[..., b:]


@partial(jax.jit, static_argnames=("b", "use_alpha"))
def mask_blur_band(
    eng: BandEngine,
    XB: Array,  # [nb, P, B*F]
    b: int,
    use_alpha: bool = True,
) -> Array:
    """Batched life-mask blur: blur of (activity > 0.1) per sample ->
    [nb, P, B] (caller thresholds). Reference nca.py:71-79."""
    tdt = eng.Tband.dtype
    if use_alpha:
        acol = _alive_cols(eng, XB.astype(tdt), b, tdt)
    else:
        acol = jnp.broadcast_to(
            (eng.vs > 0.0)[..., None], XB.shape[:2] + (b,)
        ).astype(tdt)
    return eng.sig_w * band_blur_pass(eng, acol)


@jax.jit
def blur_band(eng: BandEngine, YB: Array) -> Array:
    """Batched SPH blur of arbitrary per-row features [nb, P, K] ->
    [nb, P, K] (reference operators_batch.py:601-671; v_j baked in the
    table)."""
    return eng.sig_w * band_blur_pass(eng, YB.astype(eng.Tband.dtype))


@jax.jit
def gradient_band(eng: BandEngine, A: Array) -> Array:
    """Single-sample SPH gradient in rank layout: [nb, P, F] ->
    [nb, P, F, D] (parity/tests; the hot path keeps d-major lanes)."""
    d, p = eng.dim, eng.slots_per_cell
    mom = band_md_pass(eng, A.astype(eng.Tband.dtype))
    comps = [
        eng.sig_g * mom[:, i * p : (i + 1) * p] - A * eng.gsum[..., i : i + 1]
        for i in range(d)
    ]
    return jnp.stack(comps, axis=-1)


@jax.jit
def divergence_band(eng: BandEngine, V: Array) -> Array:
    """SPH divergence of vector features [nb, P, F, D] -> [nb, P, F]
    (reference divergence semantics: sig_g sum_j v_j (V_j - V_i) . mag r).
    Computed from the md tables axis by axis."""
    d, p = eng.dim, eng.slots_per_cell
    acc = None
    for i in range(d):
        mom = band_md_pass_axis(eng, V[..., i].astype(eng.Tband.dtype), i)
        term = eng.sig_g * mom - V[..., i] * eng.gsum[..., i : i + 1]
        acc = term if acc is None else acc + term
    return acc


def band_md_pass_axis(eng: BandEngine, X: Array, axis: int) -> Array:
    """Like band_md_pass but for a single axis table slice:
    [nb, P, L] -> [nb, P, L]."""
    p = eng.slots_per_cell
    sl = slice(axis * p, (axis + 1) * p)
    out = _pair_dot(eng.Tband[:, :, sl], band_window(X))
    if eng.far_blocks:
        Xflat = X.reshape(-1, X.shape[-1])
        outs = [
            _pair_dot(tab[:, :, sl], _far_window(eng, Xflat, t))
            for t, tab in enumerate(eng.far_tabs)
        ]
        out = out + _combine_far(eng, outs, p, X.shape[-1])
    return out


# ---------------------------------------------------------------------------
# Build (host-side numpy, one-time per geometry)
# ---------------------------------------------------------------------------


def _true_pairs(x: np.ndarray, h: float, period) -> tuple:
    """All true SPH pairs (|r| < h) of rank-ordered positions, via the
    cell stencil. Returns (pi, pj, dx [E, D], d2 [E]) with pi/pj rank
    indices; periodic pairs appear once per contributing image (their
    table entries accumulate). Native C++ grid scan when available
    (sphgrid_true_pairs — profiled 10.5 s -> ~1 s at 100k points);
    vectorized numpy fallback below, chunked over stencil offsets so
    peak memory stays O(N). Pair ORDER differs between the two (numpy
    groups by stencil offset, native by particle) — everything
    downstream is order-independent accumulation."""
    from .. import native

    nat = native.true_pairs(
        x, float(h),
        None if period is None else np.asarray(period, np.float64),
    )
    if nat is not None:
        return nat
    n, d = x.shape
    if period is not None:
        per = np.broadcast_to(np.asarray(period, np.float64), (d,))
        ncell = np.maximum(np.floor(per / h).astype(np.int64), 3)
        cell_size = per / ncell
    else:
        per = None
        cell_size = np.full(d, float(h), np.float64)

    fl = np.floor(x / cell_size).astype(np.int64)
    if per is not None:
        fl = np.mod(fl, ncell)

    occ, inv = np.unique(fl, axis=0, return_inverse=True)
    inv = inv.ravel()
    by_cell = np.argsort(inv, kind="stable").astype(np.int64)
    inv_s = inv[by_cell]
    ncells = len(occ)
    cstart = np.searchsorted(inv_s, np.arange(ncells))
    cend = np.searchsorted(inv_s, np.arange(ncells), side="right")
    counts = cend - cstart

    # occupied-cell lookup: raveled coordinate keys + one searchsorted
    fmin = occ.min(axis=0)
    span = occ.max(axis=0) - fmin + 1
    strides = np.cumprod(np.concatenate([[1], span[::-1][:-1]]))[::-1]
    keys = (occ - fmin) @ strides  # sorted ascending (np.unique order)

    offsets = _stencil_offsets(d)
    pis, pjs, dxs, d2s = [], [], [], []
    h2 = float(h) * float(h)
    for off in offsets:
        tgt = fl + off[None, :]
        if per is not None:
            tgt_c = np.mod(tgt, ncell)
            shift = ((tgt - tgt_c) // ncell).astype(np.float64) * per
        else:
            tgt_c = tgt
            shift = None
        in_range = np.all((tgt_c >= fmin) & (tgt_c < fmin + span), axis=-1)
        q = (tgt_c - fmin) @ strides
        pos = np.minimum(np.searchsorted(keys, q), ncells - 1)
        found = in_range & (keys[pos] == q)
        cid = np.where(found, pos, 0)
        cnt = np.where(found, counts[cid], 0)
        E = int(cnt.sum())
        if E == 0:
            continue
        pi = np.repeat(np.arange(n), cnt)
        seg = np.repeat(cstart[cid], cnt) + (
            np.arange(E) - np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        )
        pj = by_cell[seg]
        dx = x[pj] - x[pi]
        if shift is not None:
            dx = dx + np.repeat(shift, cnt, axis=0)
        d2 = np.einsum("ed,ed->e", dx, dx)
        keep = d2 < h2
        pis.append(pi[keep])
        pjs.append(pj[keep])
        dxs.append(dx[keep])
        d2s.append(d2[keep])
    return (
        np.concatenate(pis),
        np.concatenate(pjs),
        np.concatenate(dxs),
        np.concatenate(d2s),
    )


def _bucket_cuts(widths: np.ndarray, k: int) -> list:
    """Split far widths into <= k buckets MINIMIZING padded area: every
    block in a bucket pads to the bucket's max width, so the cost of a
    partition is sum over buckets of (bucket max) * (bucket count).
    Exact DP over the distinct widths (there are only O(100) of them) —
    the previous greedy equal-count split left ~15-20% extra padding on
    the measured geometries."""
    nz = widths[widths > 0]
    if len(nz) == 0:
        return []
    vals, cnts = np.unique(nz, return_counts=True)  # ascending
    m = len(vals)
    k = min(k, m)
    csum = np.concatenate([[0], np.cumsum(cnts)])
    # cost of one bucket covering distinct-width range (i, j]:
    # vals[j-1] * (number of blocks in that range)
    INF = float("inf")
    # dp[b][j]: min padded area covering the first j widths with b buckets
    dp = [[INF] * (m + 1) for _ in range(k + 1)]
    choice = [[0] * (m + 1) for _ in range(k + 1)]
    dp[0][0] = 0.0
    for b in range(1, k + 1):
        dp[b][0] = 0.0
        for j in range(1, m + 1):
            best, arg = INF, 0
            for i in range(j):
                if dp[b - 1][i] == INF:
                    continue
                c = dp[b - 1][i] + float(vals[j - 1]) * (csum[j] - csum[i])
                if c < best:
                    best, arg = c, i
            dp[b][j] = best
            choice[b][j] = arg
    # fewest buckets achieving the k-bucket optimum (padding never
    # improves by splitting without area gain)
    bstar = k
    for b in range(1, k + 1):
        if dp[b][m] <= dp[k][m] + 1e-9:
            bstar = b
            break
    cuts = []
    j = m
    for b in range(bstar, 0, -1):
        cuts.append(int(vals[j - 1]))
        j = choice[b][j]
    return cuts[::-1]


def _smoothing_core_np(name: str, d2: np.ndarray, h: float) -> np.ndarray:
    """Unnormalized smoothing kernel W(d2, h) in host numpy (the build
    runs on the host; the jnp twins in ops.kernels would bounce the
    pair arrays through the device). Matches kernels.py exactly —
    poly6 (kernels_impl.py:33-40), WendlandC2 (:68-77), C4 (:105-115).
    Pairs are within h by construction, so no q >= 1 guard is needed."""
    if name == "poly6":
        return np.maximum(h * h - d2, 0.0) ** 3
    q = np.sqrt(d2) / h
    if name == "wendlandC2":
        return (1.0 - q) ** 4 * (4.0 * q + 1.0)
    if name == "wendlandC4":
        return (1.0 - q) ** 6 * (35.0 * q * q + 18.0 * q + 3.0) / 3.0
    raise ValueError(f"unknown smoothing kernel {name!r}")


def build_band_engine(
    x,
    h: float,
    *,
    period=None,
    block_rows: int = 64,
    far_group: int = 4,
    far_buckets: int = 16,
    smoothing: str = K.DEFAULT_SMOOTHING,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
    table_dtype: str = "float32",
    block_multiple: int = 1,
    curve: str = "hilbert",
    rank_cell_scale: float = 1.0,
) -> BandEngine:
    """Build the band engine for concrete positions (host-side numpy).

    ``x``: [N, D]. ``block_rows`` (P) rows per band block; ``far_group``
    (g) particles per far column group; ``far_buckets`` static width
    classes for the far lists. ``block_multiple`` pads the block count
    to a multiple (sharding evenness). Defaults g=4 / 16 buckets were
    swept on the 100k surface bench (round 3): vs g=8 / 8 buckets they
    cut far-table padding 349->291 MB and the isolated perception scan
    1760->1442 us/step (the far pass is dot-count/overhead-bound, not
    table-bandwidth-bound — finer groups pad fewer phantom pairs).

    Pair weights are computed in float64 at build time and cast once to
    ``table_dtype`` ("float32" | "bfloat16") — bfloat16 halves table
    bytes at pair-level quantization (the gsum self-term is re-derived
    from the quantized tables so a constant field still has zero
    gradient up to accumulation noise).
    """
    # validates the names (raises on unknown kernels); the tables are
    # weight-agnostic, so every registered smoothing kernel bakes in —
    # poly6 additionally rides the fused native fill below
    K.get_smoothing_kernel(smoothing)
    K.get_gradient_kernel(gradient_kernel)
    if gradient_kernel != "spiky":
        # the fill paths (numpy fill_table and the native fused fill)
        # bake the SPIKY magnitude 3(h-d)^2/d; a differently-shaped
        # gradient kernel would silently produce wrong tables
        raise NotImplementedError(
            f"band engine bakes spiky gradient magnitudes; "
            f"gradient_kernel={gradient_kernel!r} needs its own fill"
        )
    import os as _os
    import time as _time

    _prof = bool(_os.environ.get("SPH_NCA_BUILD_PROFILE"))
    _t0 = _time.perf_counter()

    def _tick(msg):
        if _prof:
            print(f"[band build {_time.perf_counter() - _t0:7.2f}s] {msg}",
                  flush=True)

    x = np.asarray(x, np.float64)
    n, d = x.shape
    P = int(block_rows)
    g = int(far_group)
    if P % g:
        raise ValueError(
            f"far_group {g} must divide block_rows {P}"
        )

    per = None
    rscale = float(rank_cell_scale)
    if period is not None:
        per = np.broadcast_to(np.asarray(period, np.float64), (d,)).copy()
        # ranking cells only order the particles (the pair scan builds
        # its own h-grid), so they may be finer than h
        ncell = np.maximum(
            np.floor(per / (h * rscale)).astype(np.int64), 3
        )
        cell_size = per / ncell
        # canonical positions within one period
        x = x - np.floor(x / per) * per
    else:
        cell_size = np.full(d, float(h) * rscale, np.float64)

    # curve rank: sort by cell code, stable (original order within cell).
    # Hilbert (default) is continuous — spatially-near cells land
    # curve-near more often than Morton's quadrant jumps, shrinking the
    # far-pair population and the sharded halo's long-distance exports
    # (measured round 4; "morton" kept for comparison).
    fl = np.floor(x / cell_size).astype(np.int64)
    if per is not None:
        fl = np.mod(fl, ncell)
    _tick("cells")
    encode = {"hilbert": _hilbert_code, "morton": _morton_code}[curve]
    code = encode(fl - fl.min(axis=0))
    order = np.argsort(code, kind="stable")
    rank_of_particle = np.empty(n, np.int64)
    rank_of_particle[order] = np.arange(n)
    xr = x[order]  # rank-ordered positions

    nb = -(-n // P)
    bm = max(1, int(block_multiple))
    nb = -(-nb // bm) * bm
    R = nb * P

    from .. import native as _native

    # the native scan also accumulates the per-particle poly6 sums and
    # neighbor counts in-flight (per-pair f64 weight temporaries on this
    # churn-sensitive host profiled ~15 s at 1M points)
    nat = _native.true_pairs(
        xr, float(h),
        None if per is None else np.asarray(per, np.float64),
        with_sums=True,
    )
    w6sum = ncnt_nat = None
    if nat is not None:
        pi, pj, dx, d2, w6sum, ncnt_nat = nat
    else:
        pi, pj, dx, d2 = _true_pairs(xr, float(h), per)
    _tick(f"pairs: {len(pi)}")

    # volumes: v_i = 1 / (sigma_W sum_j W(d2)), reference :70-76
    sig_w = float(K.get_smoothing_kernel(smoothing).norm(h, d))
    sig_g = float(K.get_gradient_kernel(gradient_kernel).norm(h, d))
    h2 = float(h) * float(h)
    if smoothing == "poly6" and w6sum is not None:
        # native scan accumulated the poly6 sums in-flight
        inv_v = sig_w * np.pad(w6sum, (0, R - n))
    else:
        inv_v = sig_w * np.bincount(
            pi, weights=_smoothing_core_np(smoothing, d2, float(h)),
            minlength=R,
        )
    v = np.where(inv_v > 0.0, 1.0 / np.maximum(inv_v, 1e-300), 0.0)

    # fused native fill (bf16 tables): the pair weights are computed
    # inside sphgrid_fill_cast_bf16 from raw (dx, d2, v) — materializing
    # mdv/w6v and their per-table fancy selections in numpy profiled
    # ~10 s of fresh-page f64 temporaries at 100k on this host.
    # Gated on the native pair scan having actually succeeded (nat is not
    # None): the numpy _true_pairs fallback orders pairs by stencil
    # offset, violating the pi-sorted row contract of fill_band_bf16 /
    # fill_cast_bf16 (their chunked row loops would silently skip pairs).
    # Also poly6-only: the native fill hard-codes the poly6 core;
    # Wendland tables take the generic (slower-build) numpy/accum path.
    fused = (
        table_dtype == "bfloat16" and nat is not None
        and smoothing == "poly6"
    )
    if not fused:
        w6 = _smoothing_core_np(smoothing, d2, float(h))
        dist = np.sqrt(np.where(d2 > 0.0, d2, 1.0))
        mag = np.where(d2 > 0.0, 3.0 * (h - dist) ** 2 / dist, 0.0)
        vj = v[pj]
        w6v = w6 * vj  # smoothing core * source volume
        mdv = mag[:, None] * dx * vj[:, None]  # [E, D]
        del w6

    _tick("weights")
    # int32 throughout: at 1M points the pair arrays are 30M+ long and
    # every int64 temporary here is a 244 MB allocation on a host where
    # fresh pages cost ~1.6 GB/s
    pi = np.asarray(pi, np.int32)
    pj = np.asarray(pj, np.int32)
    bi = pi // P
    CC = (d + 1) * P  # table columns: D md components + w6v, P rows each
    ri = pi % P
    pairs = (pi, pj, dx, d2)

    # band classification in C++ when available (six E-length int
    # temporaries otherwise); band_col < 0 marks far pairs
    band_col = _native.band_cols(pi, pj, P, nb)
    if band_col is None:
        bj = pj // P
        # band slot: 1 = same block, 2 = next (mod nb), 0 = prev (mod nb)
        dbf = (bj - bi) % np.int32(nb)
        dbb = (bi - bj) % np.int32(nb)
        slot = np.full(len(pi), -1, np.int32)
        slot[dbf == 0] = 1
        slot[(slot < 0) & (dbf == 1)] = 2
        slot[(slot < 0) & (dbb == 1)] = 0
        band_col = np.where(
            slot >= 0, slot * P + pj % P, -1
        ).astype(np.int32)
    in_band = band_col >= 0

    def fill_table(psel, cols_sel, rows_sel, nrows, wcols):
        """Table for the selected pairs (psel indexes the pair arrays;
        rows_sel non-decreasing; multi-image duplicates accumulate).
        Fused mode returns (bf16 table, quantized row sums); otherwise
        an f32 table via the native scatter-add (sphgrid_accum_table) or
        the ONE-combined-bincount numpy fallback."""
        ri_sel = ri[psel]
        if fused:
            return _native.fill_cast_bf16(
                rows_sel, cols_sel, ri_sel, psel, pairs, v, float(h),
                nrows, wcols, P,
            )
        md_sel, w6_sel = mdv[psel], w6v[psel]
        tab = _native.accum_table(
            rows_sel, cols_sel, ri_sel,
            np.ascontiguousarray(md_sel), w6_sel, nrows, wcols, P,
        )
        if tab is not None:
            return tab, None
        # int64: rows*wcols*CC overflows int32 beyond ~2.8M points
        base = (
            rows_sel.astype(np.int64) * wcols + cols_sel.astype(np.int64)
        ) * CC + ri_sel
        idx = np.concatenate(
            [base + c * P for c in range(d)] + [base + d * P]
        )
        w = np.concatenate([md_sel[:, c] for c in range(d)] + [w6_sel])
        tab = np.bincount(idx, weights=w, minlength=nrows * wcols * CC)
        return tab.reshape(nrows, wcols, CC).astype(np.float32), None

    if fused:
        # selection-free band fill: rows/ri derive from pi in C++, far
        # pairs skip on band_col < 0 (no flatnonzero / fancy copies —
        # ~0.8 GB of temporaries at 1M points)
        Tband, gs_band = _native.fill_band_bf16(
            pi, band_col, pairs, v, float(h), nb, P
        )
    else:
        bsel = np.flatnonzero(in_band)
        Tband, gs_band = fill_table(
            bsel, band_col[bsel], bi[bsel], nb, 3 * P
        )

    _tick("band table")
    # ---- far structure ---------------------------------------------------
    # Native one-pass assembly when available: block-local group dedup
    # (phase A) + per-pair bucket/row/col derivation (phase C) — the
    # numpy path's np.unique over E_far int64 keys plus per-bucket
    # searchsorted/repeat chains profiled ~5 s of the 1M build.
    nat_far = None
    if _native.available():
        e_far = int(len(pi) - np.count_nonzero(in_band))
        nf = _native.far_groups(pi, pj, band_col, e_far, P, g, nb)
        if nf is not None:
            gc_n, off_n, gflat_n = nf
            grp_count = gc_n.astype(np.int64)
            cuts = _bucket_cuts(grp_count, far_buckets)
            nat_far = _native.far_meta(
                pi, pj, band_col, P, g, nb, gc_n, off_n, gflat_n,
                np.asarray(cuts, np.int64),
            )
    if nat_far is None:
        far = ~in_band
        Rg = R // g + 1  # (block, group) key multiplier
        if far.any():
            # int64 keys: block * Rg overflows int32 at 1M+ points
            ubg = np.unique(bi[far].astype(np.int64) * Rg + (pj[far] // g))
            ub, ug = ubg // Rg, ubg % Rg
            grp_count = np.bincount(ub, minlength=nb)
        else:
            ub = ug = np.zeros(0, np.int64)
            grp_count = np.zeros(nb, np.int64)
        cuts = _bucket_cuts(grp_count, far_buckets)

    _tick("far group scan")
    far_blocks, far_groups_l, far_tabs, far_gs = [], [], [], []
    order_rows = []  # bucket-concat row order (block ids)
    if nat_far is not None:
        (block_bucket, _block_row, _bnb, _bnp,
         pair_bucket_n, pair_row_n, pair_col_n) = nat_far
        for t_idx, wmax in enumerate(cuts):
            blks = np.flatnonzero(block_bucket == t_idx)
            if len(blks) == 0:
                continue
            far_blocks.append(blks.astype(np.int32))
            order_rows.append(blks)
            # group lists from the phase-A flat segments (ascending ids,
            # pad entries stay group 0)
            cnts = grp_count[blks]
            grp_list = np.zeros((len(blks), wmax), np.int32)
            if cnts.sum():
                rows_idx = np.repeat(np.arange(len(blks)), cnts)
                startp = np.concatenate([[0], np.cumsum(cnts)[:-1]])
                col_idx = np.arange(int(cnts.sum())) - np.repeat(
                    startp, cnts
                )
                gather = np.repeat(off_n[blks], cnts) + col_idx
                grp_list[rows_idx, col_idx] = gflat_n[gather]
            far_groups_l.append(grp_list)
            psel = np.flatnonzero(pair_bucket_n == t_idx)
            _tick(
                f"far bucket {t_idx} assembly "
                f"({len(blks)} blk, {len(psel)} pr)"
            )
            tab, gst = fill_table(
                psel, pair_col_n[psel], pair_row_n[psel], len(blks),
                wmax * g,
            )
            _tick(f"far bucket {t_idx} fill")
            far_tabs.append(tab)
            far_gs.append(gst)
    else:
        # numpy fallback: bucket id per group-entry and per far PAIR,
        # computed ONCE (the per-bucket `grp_count[bi]` gathers were
        # 16 x 244 MB of temporaries at 1M points); bucket t covers
        # widths (cuts[t-1], cuts[t]]
        cuts_arr = np.asarray(cuts, np.int64)
        gc32 = grp_count.astype(np.int32)
        ub_bucket = np.searchsorted(cuts_arr, gc32[ub])
        pair_bucket = np.where(
            far, np.searchsorted(cuts_arr, gc32[bi]).astype(np.int8),
            np.int8(-1),
        )
        lo = 0
        for t_idx, wmax in enumerate(cuts):
            blks = np.where((grp_count > lo) & (grp_count <= wmax))[0]
            lo = wmax
            if len(blks) == 0:
                continue
            far_blocks.append(blks.astype(np.int32))
            order_rows.append(blks)
            row_of = np.full(nb, -1, np.int64)
            row_of[blks] = np.arange(len(blks))
            # this bucket's (block, group) entries — ubg is sorted,
            # block-major
            selb = ub_bucket == t_idx
            bsel, gsel = ub[selb], ug[selb]
            cnts = np.bincount(row_of[bsel], minlength=len(blks))
            startp = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            posn = np.arange(len(bsel)) - np.repeat(startp, cnts)
            grp_list = np.zeros((len(blks), wmax), np.int64)
            grp_list[row_of[bsel], posn] = gsel  # pad entries stay grp 0
            far_groups_l.append(grp_list.astype(np.int32))
            # pair columns: (group position in grp_list) * g + rj%g
            keys_bg = bsel * Rg + gsel  # sorted (subset of ubg)
            psel = np.flatnonzero(pair_bucket == t_idx)
            ppos = np.searchsorted(
                keys_bg, bi[psel].astype(np.int64) * Rg + pj[psel] // g
            )
            col = posn[ppos] * g + pj[psel] % g
            tab, gst = fill_table(psel, col, row_of[bi[psel]], len(blks),
                                  wmax * g)
            far_tabs.append(tab)
            far_gs.append(gst)

    _tick("far tables")
    order_rows.append(np.where(grp_count == 0)[0])
    all_rows = np.concatenate(order_rows)
    far_perm = np.empty(nb, np.int64)
    far_perm[all_rows] = np.arange(nb)

    # ---- quantize + derived arrays --------------------------------------
    # quantization happens host-side (ml_dtypes bfloat16 == TPU bf16) so
    # gsum can be derived from the exact quantized values without a
    # device round-trip; the native cast (sphgrid_cast_bf16_gsum, RTE —
    # same rounding as ml_dtypes) also produces the quantized row sums
    # in the same pass (the ml_dtypes casts profiled 15.6 s at 100k)
    _tick("quantize start")
    gs = None
    if fused:
        # tables were quantized during the fill; assemble gsum
        Tband_n, far_n = Tband, far_tabs
        gs = gs_band
        for blks, gst in zip(far_blocks, far_gs):
            gs[blks] += gst
    elif table_dtype == "bfloat16":
        nat = _native.cast_bf16_gsum(Tband)
        if nat is not None:
            Tband_n, gs = nat
            far_n = []
            for blks, t in zip(far_blocks, far_tabs):
                tq, gst = _native.cast_bf16_gsum(t)
                far_n.append(tq)
                gs[blks] += gst
        else:
            import ml_dtypes

            bf16 = ml_dtypes.bfloat16
            Tband_n = Tband.astype(bf16)
            far_n = [t.astype(bf16) for t in far_tabs]
    else:
        Tband_n = Tband
        far_n = far_tabs

    if gs is None:
        # gsum from the quantized tables (sum over window rows)
        gs = Tband_n.astype(np.float32).sum(axis=1)  # [nb, CC]
        for blks, tq in zip(far_blocks, far_n):
            if len(blks):
                gs[blks] += tq.astype(np.float32).sum(axis=1)
    gsum = sig_g * gs.reshape(nb, d + 1, P).transpose(0, 2, 1)[..., :d]
    Tband_q = jnp.asarray(Tband_n)
    far_q = [jnp.asarray(t) for t in far_n]

    _tick("quantize done")
    xs = np.full((R, d), PAD_POS, np.float32)
    xs[:n] = xr.astype(np.float32)
    vs = np.zeros((R,), np.float32)
    vs[:n] = v[:n]
    if ncnt_nat is not None:
        ncnt = np.pad(ncnt_nat, (0, R - n))
    else:
        ncnt = np.bincount(pi, minlength=R).astype(np.int32)

    # real-row indicator per far window row (pad rows of the group list
    # point at group 0 — REAL particles — but their table entries are
    # zero, so their mask value is irrelevant; vw>0 handles rank pads)
    np_tdt = np.float32 if table_dtype != "bfloat16" else Tband_n.dtype
    far_vwmask = []
    for grp_list in far_groups_l:
        rows_idx = (
            grp_list.astype(np.int64)[:, :, None] * g + np.arange(g)
        ).reshape(grp_list.shape[0], -1)
        far_vwmask.append((vs[rows_idx] > 0.0).astype(np_tdt))

    _tick("device arrays")
    return BandEngine(
        slot_of_particle=jnp.asarray(rank_of_particle, jnp.int32),
        xs=jnp.asarray(xs.reshape(nb, P, d)),
        vs=jnp.asarray(vs.reshape(nb, P)),
        Tband=Tband_q,
        gsum=jnp.asarray(gsum.astype(np.float32)),
        nbr_count=jnp.asarray(ncnt.reshape(nb, P)),
        far_blocks=tuple(jnp.asarray(bk) for bk in far_blocks),
        far_groups=tuple(jnp.asarray(gl) for gl in far_groups_l),
        far_tabs=tuple(far_q),
        far_vwmask=tuple(jnp.asarray(m) for m in far_vwmask),
        far_perm=jnp.asarray(far_perm, jnp.int32),
        h=jnp.float32(h),
        sig_w=jnp.float32(sig_w),
        sig_g=jnp.float32(sig_g),
    )
