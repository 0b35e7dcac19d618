"""Cell-dense SPH engine — the TPU fast path for neighborhood operators.

Why: XLA's per-row gather on TPU costs ~2.6ns/row regardless of row width,
so the neighbor-list formulation (ops/neighbor_ops.py) pays for N*K tiny
gathers per op (~10ms at N=1e5, K=40 on v5e) while the same bytes moved as
~1.5KB cell rows run at full HBM bandwidth (measured 735GB/s). This engine
therefore restructures the computation around whole cells:

  * particles live in a cell-dense layout S [C, M, F]: one row block per
    occupied SUBCELL (fat cells split into M=8-slot subcells so slot
    padding stays tight), Morton-ordered then regrouped by window size;
    padded slots sit at PAD_POS so every kernel weight against them is
    exactly 0 — there is no dummy row, and C pads to a multiple that
    shards evenly.
  * each op processes one subcell against its occupied stencil subcells:
    the window state is ONE cell-granularity gather S[win_cells]
    ([C, W, M*F] contiguous rows), window positions/volumes precomputed
    with periodic wrap shifts baked in.
  * pair weights W(d2), spiky magnitude are computed on the fly from
    positions, and the SPH sums become [M, W] x [W, *] matmuls (see the
    Pallas kernels in ops/pallas/pair_kernel.py for the fused fast path;
    this module's einsum forms are the XLA reference path).

This engine is semantically identical to the reference operators
(operators_batch.py): same kernels, same normalizations, sums over the
same neighborhoods (extra window pairs beyond |r| < h contribute exactly
zero because every kernel has compact support).

The whole rollout runs in cell layout; `scatter`/`gather_back` convert at
the boundaries (pool/loss want the original particle order).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels as K
from .hashgrid import _dims_tuple, _stencil_offsets, _strides

Array = jnp.ndarray

# Padded slot position: far enough that h^2 - d^2 underflows to -inf-ish
# and every smoothing kernel evaluates to exactly 0 in f32.
PAD_POS = 1.0e6


class CellEngine(NamedTuple):
    """Static per-geometry structure (a pytree of device arrays).

    C = number of occupied cells, M = slot capacity per cell,
    W = window cell capacity (occupied stencil cells), N = particles.
    """

    # layout maps
    slot_of_particle: Array  # [N] int32 -> flat slot id (cell*M + slot)
    # geometry (cell layout)
    xs: Array  # [C, M, D] slot positions (pad: PAD_POS)
    vs: Array  # [C, M]    slot volumes   (pad: 0)
    # window structure
    win_cells: Array  # [C, W] int32 cell ids (pad: 0, shifted to PAD_POS)
    xw: Array  # [C, W*M, D] window positions with periodic shifts baked in
    vw: Array  # [C, W*M]    window volumes
    # precomputed pair-weight matrices (static per geometry: particles do
    # not move during rollouts, reference nca.py:136). Reading these once
    # per op beats recomputing d2 (XLA would materialize the dot operand
    # anyway, paying write+read instead of read).
    Tw: Array  # [C, M, W*M] blur weights  sigma_W W(d2) v_w
    Tg: Array  # [C, M, W*M] gradient scalar sigma_g spiky_mag v_w
    # gsum_i = sigma_g sum_k mag_ik r_ik v_k — the self-term of the SPH
    # gradient adjoint (used by the Pallas custom_vjp backward)
    gsum: Array  # [C, M, D]
    # block structure for the Pallas kernels: BG Morton-consecutive subcells
    # share one union stencil window, giving [BG*M, Wu*M] pair tiles that
    # fill the MXU/VPU (single cells are too small a compute unit).
    # Positions are stored COORDINATE-MAJOR ([D, P] / [D, W]): per-axis
    # rows are then natural lane vectors in the kernels (slicing a
    # lane-dim-3 array per axis makes Mosaic spill catastrophically).
    # Blocks come in TWO buckets sorted by union-window size (blk_* =
    # first ~75% at a tight width, blk2_* = fat tail at the max width);
    # the split lives in the array shapes so everything stays static.
    blk_xs: Array  # [nb1, D, BG*M] block rows in block-local frame
    blk_win_cells: Array  # [nb1, Wu1] int32 (pad -> cell 0 at PAD_POS)
    blk_xw: Array  # [nb1, D, Wu1*M] union-window positions, block frame
    blk_vw: Array  # [nb1, Wu1*M]
    blk2_xs: Array  # [nb2, D, BG*M]
    blk2_win_cells: Array  # [nb2, Wu]
    blk2_xw: Array  # [nb2, D, Wu*M]
    blk2_vw: Array  # [nb2, Wu*M]
    # constants
    h: Array  # scalar f32
    sig_w: Array  # smoothing normalization sigma_W
    sig_g: Array  # gradient normalization sigma_g
    # OPTIONAL precomputed pair tables (build_cell_engine(pair_tables=...)).
    # Positions are static for a whole rollout (reference nca.py:136), so
    # the per-pair kernel evaluations are constants. Stored per block:
    # the DISPLACEMENT-SCALED spiky factors md_d = mag * (xw_d - xb_d)
    # (one [P, W] matrix per axis) and the poly6 core (h^2 - d2)^3. Every
    # pair pass then becomes [P, W] @ [W, K] MXU matmuls — the per-pair
    # sqrt/div/pow VPU work (the measured bottleneck of the recompute
    # kernels) disappears, traded for an HBM stream that reads ~4x faster
    # at N=1e5. Storing mag*r (not raw mag + moment expansion) keeps
    # bfloat16 quantization at the PAIR level: a raw-mag moment form
    # amplifies the rounding by |x_window|/|r_pair| (~6x measured).
    blk_md: Optional[Array] = None  # [nb1, D*P, Wu1*M] mag * r_d (d-major)
    blk_w6: Optional[Array] = None  # [nb1, P, Wu1*M] (h^2-d2)^3 (>=0)
    blk2_md: Optional[Array] = None  # [nb2, D*P, Wu*M]
    blk2_w6: Optional[Array] = None  # [nb2, P, Wu*M]

    @property
    def block_cells(self) -> int:
        return self.blk_xs.shape[2] // self.xs.shape[1]

    def block_window(self, S: Array, bucket: int = 1) -> Array:
        """[C, M, F] -> [nb_i, Wu_i*M, F] union-window states (one gather
        per bucket)."""
        c, m = self.num_cells, self.slots_per_cell
        F = S.shape[-1]
        wc = self.blk_win_cells if bucket == 1 else self.blk2_win_cells
        nb, wu = wc.shape
        return S.reshape(c, m * F)[wc].reshape(nb, wu * m, F)

    @property
    def num_cells(self) -> int:
        return self.win_cells.shape[0]

    @property
    def slots_per_cell(self) -> int:
        return self.xs.shape[1]

    @property
    def num_particles(self) -> int:
        return self.slot_of_particle.shape[0]

    # -- layout conversion -------------------------------------------------

    def scatter(self, A: Array) -> Array:
        """[N, F] particle-order values -> [C, M, F] cell layout
        (padded slots are zero)."""
        c, m = self.num_cells, self.slots_per_cell
        F = A.shape[-1]
        flat = jnp.zeros((c * m, F), A.dtype)
        flat = flat.at[self.slot_of_particle].set(A)
        return flat.reshape(c, m, F)

    def gather_back(self, S: Array) -> Array:
        """[C, M, F] cell layout -> [N, F] particle order."""
        c, m = self.num_cells, self.slots_per_cell
        return S.reshape(c * m, S.shape[-1])[self.slot_of_particle]

    # -- pair machinery ----------------------------------------------------

    def window(self, S: Array) -> Array:
        """Window states: [C, M, F] -> [C, W*M, F].

        One cell-granularity gather (rows of M*F values) — the only gather
        in the per-step hot path. Padded window entries read cell 0, whose
        values never contribute (their positions sit at PAD_POS).
        """
        if self.win_cells.shape[1] == 0:
            raise ValueError(
                "engine was built with xla_tables=False (no per-cell "
                "window tables); use the Pallas path or rebuild with "
                "xla_tables=True"
            )
        c, m = self.num_cells, self.slots_per_cell
        F = S.shape[-1]
        return S.reshape(c, m * F)[self.win_cells].reshape(
            c, self.win_cells.shape[1] * m, F
        )

    def pair_d2(self) -> Array:
        """Pairwise squared distances [C, M, W*M] (cell slots x window)."""
        xb = self.xs  # [C, M, D]
        d2 = (
            jnp.sum(xb * xb, -1)[:, :, None]
            + jnp.sum(self.xw * self.xw, -1)[:, None, :]
            - 2.0
            * jnp.einsum(
                "cmd,cwd->cmw", xb, self.xw,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        return jnp.maximum(d2, 0.0)

    # -- operators ---------------------------------------------------------

    def blur(self, S: Array, *, Sw: Optional[Array] = None) -> Array:
        """SPH blur in cell layout: [C, M, F] -> [C, M, F].

        Reference semantics: operators_batch.py:601-671. ``Sw`` lets the
        caller reuse an existing window gather of S.
        """
        Aw = self.window(S) if Sw is None else Sw
        return jnp.einsum(
            "cmw,cwf->cmf", self.Tw, Aw,
            precision=jax.lax.Precision.HIGHEST,
        )

    def gradient(self, S: Array, *, Sw: Optional[Array] = None) -> Array:
        """SPH gradient in cell layout: [C, M, F] -> [C, M, F, D].

        Reference semantics: operators_batch.py:159-235, via the moment
        expansion (one fused matmul per cell).
        """
        Tg = self.Tg
        c, m = self.num_cells, self.slots_per_cell
        F = S.shape[-1]
        D = self.xs.shape[-1]
        Aw = self.window(S) if Sw is None else Sw  # [C, WM, F]
        xb = self.xs  # [C, M, D]
        Ab = S  # [C, M, F]

        # rhs = [Aw (F), Aw*xw_d (F*D), xw (D), 1] -> [C, WM, F + F*D + D + 1]
        parts = [Aw]
        for d in range(D):
            parts.append(Aw * self.xw[..., d : d + 1])
        parts.append(self.xw)
        parts.append(jnp.ones_like(Aw[..., :1]))
        rhs = jnp.concatenate(parts, axis=-1)

        mom = jnp.einsum(
            "cmw,cwk->cmk", Tg, rhs, precision=jax.lax.Precision.HIGHEST
        )
        tAw = mom[..., :F]  # T @ Aw
        tAx = mom[..., F : F + F * D].reshape(c, m, D, F)  # T @ (Aw xw_d)
        tx = mom[..., F + F * D : F + F * D + D]  # T @ xw
        t1 = mom[..., -1:]  # T @ 1

        # grad[f,d] = tAx[d,f] - xb_d tAw_f - Ab_f tx_d + xb_d Ab_f t1
        grad = (
            jnp.swapaxes(tAx, -1, -2)  # [C, M, F, D]
            - xb[:, :, None, :] * tAw[..., None]
            - Ab[..., None] * tx[:, :, None, :]
            + (xb[:, :, None, :] * Ab[..., None]) * t1[..., None]
        )
        return grad

    def divergence(self, V: Array, *, Sw: Optional[Array] = None) -> Array:
        """SPH divergence of vector features in cell layout:
        V [C, M, F, D] -> [C, M, F] (reference operators_batch.py
        divergence; exported unused by the reference, sphops/__init__.py:2
        — provided for operator-tier completeness)."""
        c, m = self.num_cells, self.slots_per_cell
        F, D = V.shape[-2], V.shape[-1]
        Vf = V.reshape(c, m, F * D)
        Vw = self.window(Vf) if Sw is None else Sw  # [C, WM, F*D]
        Vw = Vw.reshape(c, -1, F, D)
        xb = self.xs  # [C, M, D]
        # div_i[f] = sum_w Tg_w sum_d (xw_d - xb_d)(Vw[f,d] - Vb[f,d])
        # expanded into window moments (same scheme as gradient())
        parts = [Vw.reshape(c, -1, F * D)]
        parts.append(jnp.sum(Vw * self.xw[:, :, None, :], -1))  # [C,WM,F]
        parts.append(self.xw)  # [C, WM, D]
        parts.append(jnp.ones_like(Vw[..., 0, :1]))
        rhs = jnp.concatenate(parts, axis=-1)
        mom = jnp.einsum(
            "cmw,cwk->cmk", self.Tg, rhs,
            precision=jax.lax.Precision.HIGHEST,
        )
        tV = mom[..., : F * D].reshape(c, m, F, D)  # T @ Vw
        tVx = mom[..., F * D : F * D + F]  # T @ (Vw . xw)
        tx = mom[..., F * D + F : F * D + F + D]  # T @ xw
        t1 = mom[..., -1:]  # T @ 1
        Vb = V
        div = (
            tVx
            - jnp.sum(tV * xb[:, :, None, :], -1)
            - jnp.sum(Vb * tx[:, :, None, :], -1)
            + jnp.sum(Vb * xb[:, :, None, :], -1) * t1
        )
        return div

    def count(self) -> Array:
        """Neighbor count within h (includes self) per slot [C, M] int32
        (reference operators_batch.py count; pad slots report 0)."""
        d2 = self.pair_d2()
        real_w = (self.vw > 0.0)[:, None, :]
        cnt = jnp.sum((d2 < self.h * self.h) & real_w, axis=-1)
        real_b = self.vs > 0.0
        return jnp.where(real_b, cnt, 0).astype(jnp.int32)

    def volume_consistency(self) -> Array:
        """sigma_W * sum_w W * v_w per slot — should be ~1 for real slots
        (Shepard partition of unity); used by tests."""
        ones = jnp.ones((self.num_cells, self.slots_per_cell, 1))
        return self.blur(ones)[..., 0]


def _morton_code(c: np.ndarray) -> np.ndarray:
    """Interleave coordinate bits -> Z-order code. c: [C, D] non-negative."""
    c = np.asarray(c, np.int64)
    nbits = max(1, int(np.max(c)).bit_length())
    d = c.shape[1]
    code = np.zeros(len(c), np.int64)
    for bit in range(nbits):
        for ax in range(d):
            code |= ((c[:, ax] >> bit) & 1) << (d * bit + ax)
    return code


def _hilbert_code(c: np.ndarray) -> np.ndarray:
    """Hilbert-curve index of integer cells c [C, D] (vectorized
    Skilling AxesToTranspose, AIP CP 707:381, 2004).

    The Hilbert curve is CONTINUOUS (consecutive indices are always
    face-adjacent cells), unlike Morton's quadrant jumps — spatially
    near cells land curve-near more often, which shrinks the band
    engine's far-pair population and the sharded halo's long-distance
    exports. O(D * nbits) vectorized passes over the cell array."""
    X = np.array(c, np.int64, copy=True)
    n, d = X.shape
    if d == 1:
        return X[:, 0].copy()
    nbits = max(1, int(np.max(X)).bit_length())
    M = np.int64(1) << (nbits - 1)

    # inverse undo excess work
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(d):
            hi = (X[:, i] & Q) != 0
            # invert X[0] where this axis has the Q bit set; otherwise
            # exchange the low bits of X[0] and X[i]
            t = np.where(hi, 0, (X[:, 0] ^ X[:, i]) & P)
            X[:, 0] = np.where(hi, X[:, 0] ^ P, X[:, 0]) ^ t
            X[:, i] ^= t
        Q >>= 1

    # Gray encode
    for i in range(1, d):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, np.int64)
    Q = M
    while Q > 1:
        t = np.where((X[:, d - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(d):
        X[:, i] ^= t

    # transpose form -> scalar index: bit b of axis i lands at position
    # b*D + (D-1-i) (X[0] carries the most significant bit per level)
    code = np.zeros(n, np.int64)
    for bit in range(nbits):
        for i in range(d):
            code |= ((X[:, i] >> bit) & 1) << (bit * d + (d - 1 - i))
    return code


# Subcells per Pallas block. P = BG * M = 64 rows halves MXU row
# utilization vs 128 but shrinks union windows ~25% (pair count dominates
# the VPU-bound pass; measured 138M vs 177M pairs on the 100k benchmark).
BG = 8


def build_cell_engine(
    x,
    h: float,
    dims=None,  # accepted for API symmetry with build_graph; unused
    *,
    max_per_cell: Optional[int] = None,
    max_window_cells: Optional[int] = None,
    period=None,
    smoothing: str = K.DEFAULT_SMOOTHING,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
    cell_pad_multiple: int = 16,
    n_shards: int = 1,
    xla_tables: bool = True,
    pair_tables: Optional[str] = None,
) -> CellEngine:
    """Build the engine for concrete positions (host-side, one-time).

    ``x``: [N, D] numpy/JAX array. Capacities default to exact counts.

    Cells are keyed by their TRUE floor coordinates (no modulo hash), so
    non-periodic domains have no cell aliasing at all. For periodic
    domains, cells tile the period exactly: cell_size_d =
    period_d / floor(period_d / h)  (>= h, so the 3^D stencil still covers
    the kernel support) and window copies of wrapped cells carry a
    whole-period world shift so displacements need no minimum-image.

    ``n_shards`` > 1 lays the engine out for particle-axis sharding over
    an ``n_shards``-way mesh: blocks are partitioned into ``n_shards``
    contiguous Morton ranges and the window-size bucketing runs PER
    SHARD with equal bucket sizes (cell order per shard =
    [bucket-1 blocks | bucket-2 blocks]), so every per-cell and
    per-block array divides the axis evenly and uniformly — the layout
    jax.shard_map requires (parallel/cell_shard.py). Pass the shard
    count to the sharded entry points (it is layout metadata, not a
    device array, so it is not stored on the engine pytree).

    ``xla_tables=False`` skips the per-cell window structures
    (win_cells/xw/vw/Tw/Tg — the XLA einsum path's tables, O(C*M*W)
    memory and the dominant build cost); volumes and the adjoint self
    term are then computed from the block structures in chunked passes.
    Use it for large N with the Pallas path (the XLA formulation raises
    if invoked on such an engine).

    ``pair_tables``: None (recompute pair weights in-kernel each step),
    "float32" or "bfloat16" (precompute the per-block pair-weight
    matrices once; the Pallas kernels then run as single MXU matmuls —
    see the CellEngine field comment). O(pairs) device memory:
    2 * nb * P * Wu * M * itemsize.
    """
    # The precomputed pair tables (_finalize) and the Pallas kernels
    # (ops/pallas/pair_kernel.py) hard-wire the poly6 / spiky pair math —
    # the only kernels any reference caller uses (nca.py never overrides
    # kernels.py:6-7 defaults). Refuse other selections loudly instead of
    # silently computing the wrong Tg/Tw; the graph and dense tiers
    # support every kernel.
    if smoothing != "poly6" or gradient_kernel != "spiky":
        raise NotImplementedError(
            f"CellEngine implements poly6/spiky only (got {smoothing!r}/"
            f"{gradient_kernel!r}); use ops.build_graph for other kernels"
        )

    import os
    import time as _time

    _prof = bool(os.environ.get("SPH_NCA_BUILD_PROFILE"))
    _t = [_time.time()]

    def _tick(stage: str) -> None:
        if _prof:
            now = _time.time()
            print(f"  build[{stage}]: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    x = np.asarray(x, np.float32)
    n, d = x.shape

    per = None if period is None else np.broadcast_to(
        np.asarray(period, np.float64), (d,)
    ).astype(np.float64)
    if per is not None:
        ncell = np.maximum(np.floor(per / h).astype(np.int64), 3)
        cell_size = per / ncell  # exact tiling
    else:
        ncell = None
        cell_size = np.full(d, float(h), np.float64)

    fl = np.floor(x.astype(np.float64) / cell_size).astype(np.int64)  # [N,D]
    _tick("floor")
    if per is not None:
        # canonical floor within one period (positions may sit outside
        # [0, period) — wrap them into the canonical tile)
        fl_canon = np.mod(fl, ncell)
    else:
        fl_canon = fl

    # occupied cells, renumbered 0..C-1 in MORTON order (so consecutive
    # cell ids are spatially adjacent — the Pallas block structure groups
    # 8 consecutive cells under one union stencil window)
    occ, inv, counts = np.unique(
        fl_canon, axis=0, return_inverse=True, return_counts=True
    )
    inv = inv.ravel()
    n_geo = len(occ)
    morton = _morton_code(occ - occ.min(axis=0))
    perm = np.argsort(morton, kind="stable")
    occ = occ[perm]
    counts = counts[perm]
    newid = np.empty(n_geo, np.int64)
    newid[perm] = np.arange(n_geo)
    inv = newid[inv]
    _tick("unique+morton")


    # SUBCELL SPLIT: cap slots per row-group at M (default 8) and split
    # fatter geometric cells into several subcells sharing the same floor
    # coords. This keeps slot padding tight when cell occupancy has a fat
    # tail (e.g. curved surfaces), which directly multiplies the pair-pass
    # compute. All downstream structures operate on subcells.
    M = 8 if max_per_cell is None else max(8, int(math.ceil(max_per_cell / 8)) * 8)
    n_sub = np.maximum(1, -(-counts // M))  # subcells per geometric cell
    sub_start = np.concatenate([[0], np.cumsum(n_sub)])
    C = int(sub_start[-1])
    # subcell -> geometric cell
    geo_of_sub = np.repeat(np.arange(n_geo), n_sub)
    # occ becomes per-subcell floor coords (occ_geo keeps one row per
    # geometric cell for the window lookup below)
    occ_geo = occ
    occ = occ[geo_of_sub]

    # slot assignment: within a geometric cell, particle k goes to
    # subcell k // M, slot k % M
    order = np.argsort(inv, kind="stable")
    cell_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_in_cell = np.zeros(n, np.int64)
    slot_in_cell[order] = np.arange(n) - np.repeat(cell_starts, counts)
    sub_of_particle = sub_start[inv] + slot_in_cell // M
    slot_of_particle = sub_of_particle * M + slot_in_cell % M
    inv = sub_of_particle  # particles' owning SUBCELL id

    # Positions are stored CELL-LOCAL (relative to the owning cell's
    # origin): the gradient moment expansion cancels terms of magnitude
    # |x| * sum|T A|, so keeping |x| at the cell scale (<= 2 cell_size)
    # instead of the domain scale preserves ~1 extra f32 digit.
    origins = (occ.astype(np.float64) * cell_size)  # [C, D]
    xs = np.full((C + 1, M, d), PAD_POS, np.float32)
    if per is not None:
        x_canon = x.astype(np.float64) - (fl - fl_canon) * cell_size
    else:
        x_canon = x.astype(np.float64)
    x_local = (x_canon - origins[inv]).astype(np.float32)
    xs.reshape(-1, d)[slot_of_particle] = x_local
    _tick("slots+xs")

    # ---- window construction (vectorized; scales to 1e7 subcells) -------
    # lookup: geometric floor -> its contiguous subcell range
    # [sub_start[g], sub_start[g] + n_sub[g]). Floors are raveled to
    # scalar keys over the occupied bounding box and resolved with one
    # searchsorted — replaces the reference's per-point modulo hash probe
    # (hashgrid/single_impl.py:34-60) and the round-1 Python dict loops.
    offsets = _stencil_offsets(d)  # [S, D]
    n_off = len(offsets)
    fmin = occ_geo.min(axis=0)
    span = occ_geo.max(axis=0) - fmin + 1
    strides = np.cumprod(np.concatenate([[1], span[::-1][:-1]]))[::-1]
    key_order = np.argsort(occ_geo @ strides, kind="stable")
    keys_sorted = (occ_geo @ strides)[key_order] - fmin @ strides

    T = occ[:, None, :] + offsets[None, :, :]  # [C, n_off, D] true floors
    if per is not None:
        t_canon = np.mod(T, ncell)
        wrap_f = ((T - t_canon) // ncell).astype(np.float64) * per
    else:
        t_canon = T
        wrap_f = np.zeros(T.shape, np.float64)
    in_range = np.all(
        (t_canon >= fmin) & (t_canon < fmin + span), axis=-1
    )
    q_key = (t_canon - fmin) @ strides  # aliases out of range: mask below
    pos = np.minimum(
        np.searchsorted(keys_sorted, q_key), len(keys_sorted) - 1
    )
    found = in_range & (keys_sorted[pos] == q_key)
    g = np.where(found, key_order[pos], 0)  # geo cell per (subcell, off)
    cnt = np.where(found, n_sub[g], 0).ravel()  # subcells contributed

    # expand each stencil hit into its subcell range, preserving
    # (query subcell, offset, target subcell) order
    E = int(cnt.sum())
    ent_rows = np.repeat(np.arange(C * n_off), cnt)
    ent_c = ent_rows // n_off
    grp_start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    ent_j = (
        sub_start[g.ravel()[ent_rows]]
        + (np.arange(E) - np.repeat(grp_start, cnt))
    )
    wcnt = np.bincount(ent_c, minlength=C)  # window size per subcell
    _tick("windows")

    # pad the cell count to a multiple of 16 so kernel grids can block
    # cells regularly and every array shards evenly over a device mesh
    # (padding cells have empty windows and PAD_POS slots; there is NO
    # dummy row — padded window entries point at cell 0 but carry a
    # PAD_POS shift, which zeroes their pair weights)
    n_shards = max(1, int(n_shards))
    # C must also make nb = C/BG divide n_shards: C % (16 * n_shards) == 0
    # suffices (BG = 8 -> nb multiple of 2 * n_shards).
    cell_pad_multiple = max(int(cell_pad_multiple), 16 * n_shards)
    pad_mult = max(16, int(math.ceil(cell_pad_multiple / 16)) * 16)
    C_pad = int(math.ceil(C / pad_mult)) * pad_mult
    if C_pad != C:
        xs = np.concatenate(
            [xs[:C], np.full((C_pad - C, M, d), PAD_POS, np.float32),
             xs[C:]]  # keep a trailing scratch row for xs[win] below
        )

    if xla_tables:
        Wc = int(wcnt.max())
        if max_window_cells is not None:
            Wc = max(Wc, int(max_window_cells))
    else:
        Wc = 0  # no per-cell tables: O(C*M*W) memory + top build cost
    win_cells = np.zeros((C_pad, Wc), np.int32)  # pad -> cell 0 ...
    win_shift = np.full((C_pad, Wc, d), PAD_POS, np.float32)  # ... pushed out
    if Wc:
        # per-cell-frame shift: origin_j + wrap - origin_c (XLA tables only)
        ent_shift = (
            origins[ent_j] + wrap_f.reshape(-1, d)[ent_rows] - origins[ent_c]
        ).astype(np.float32)
        wstart = np.concatenate([[0], np.cumsum(wcnt)[:-1]])
        wpos = np.arange(E) - np.repeat(wstart, wcnt)
        win_cells[ent_c, wpos] = ent_j
        win_shift[ent_c, wpos] = ent_shift
    _tick("win_fill")
    C = C_pad

    # window positions with wrap shifts baked in (pad entries land near
    # 2*PAD_POS, far outside every support radius)
    xw = xs[win_cells] + win_shift[:, :, None, :]  # [C, Wc, M, D]
    xw = xw.reshape(C, Wc * M, d)
    _tick("xw")

    # ---- block structure (BG Morton-consecutive cells, union window) ----
    # union of (target subcell, total-shift) entries over each block's
    # cells, re-expressed in the BLOCK frame (origin of the first cell);
    # entries shared by several of the block's cells dedup on the
    # h-quantized shift (vectorized np.unique over int rows)
    nb = C // BG
    origins_pad = np.zeros((C, d))
    origins_pad[: len(origins)] = origins
    ent_b = ent_c // BG
    # Single f64->f32 rounding for the block-frame total: origin_j + wrap
    # - origin_block. Composing it from the two cell-frame f32 shifts
    # would round differently per SOURCE cell, so dedup could keep a copy
    # of a row's own subcell offset by ~1e-8 from the row position — the
    # forward kernels cancel that algebraically (dA == 0 for the self
    # pair), but the gsum adjoint self-term would pick up a spurious
    # 3h^2/d * v contribution. With one rounding, the self copy is
    # bitwise equal to the row position (same expression as row_shift
    # below) and d2 == 0 exactly.
    ent_wrap = wrap_f.reshape(-1, d)[ent_rows]  # f64
    ent_total = (
        origins[ent_j] + ent_wrap - origins_pad[ent_b * BG]
    ).astype(np.float32)
    qshift = np.round(ent_total / max(float(h), 1e-9)).astype(np.int64)
    uniq, first = np.unique(
        np.concatenate(
            [ent_b[:, None], ent_j[:, None], qshift], axis=1
        ),
        axis=0,
        return_index=True,
    )
    u_b = uniq[:, 0]
    u_j = uniq[:, 1]
    u_total = ent_total[first]
    sizes = np.bincount(u_b, minlength=nb)
    _tick("blk_union")

    # ---- window-size bucketing ------------------------------------------
    # Union sizes have a fat tail (p75 ~ 0.6x max on curved surfaces); all
    # blocks padded to the max waste ~35% of the pair pass. Reorder blocks
    # by union size (a global subcell renumbering) so the Pallas wrappers
    # can run the first ~75% of blocks with a tight window width and only
    # the tail with the max — the split is carried in the array SHAPES
    # (blk_* = small bucket, blk2_* = tail), keeping everything static.
    #
    # With n_shards > 1 the sort runs WITHIN each of the n_shards
    # contiguous Morton block ranges and the split point is the same in
    # every range, so bucket arrays and the state both shard evenly on
    # dim 0 and each shard's local cell order is
    # [its bucket-1 blocks | its bucket-2 blocks].
    assert nb % n_shards == 0, (nb, n_shards)
    nb_loc = nb // n_shards
    border = np.concatenate([
        s * nb_loc
        + np.argsort(sizes[s * nb_loc : (s + 1) * nb_loc], kind="stable")
        for s in range(n_shards)
    ])
    old_cells = (border[:, None] * BG + np.arange(BG)).reshape(-1)
    newid = np.empty(C, np.int64)
    newid[old_cells] = np.arange(C)
    # permute every per-cell artifact and remap stored cell ids
    xs = np.concatenate([xs[:C][old_cells], xs[C:]])
    origins_pad = origins_pad[old_cells]
    win_cells = newid[win_cells[old_cells]].astype(np.int32)
    win_shift = win_shift[old_cells]
    xw = xw[old_cells]
    cell_old = slot_of_particle // M
    slot_of_particle = newid[cell_old] * M + slot_of_particle % M
    inv_border = np.empty(nb, np.int64)
    inv_border[border] = np.arange(nb)
    u_b = inv_border[u_b]
    u_j = newid[u_j]
    sizes = sizes[border]
    _tick("reorder")

    # per-shard bucket split at ~p75 (identical count in every shard)
    sizes_sh = sizes.reshape(n_shards, nb_loc)
    nb1_loc = int(np.clip(round(0.75 * nb_loc), 1, nb_loc))
    if np.all(sizes_sh[:, nb1_loc - 1] == sizes_sh[:, -1]):
        nb1_loc = nb_loc  # no tail to separate anywhere
    nb1 = n_shards * nb1_loc
    b1_mask = np.zeros(nb, bool)
    b1_mask.reshape(n_shards, nb_loc)[:, :nb1_loc] = True
    Wu1 = max(1, int(sizes[b1_mask].max()))
    Wu = max(1, int(sizes.max()))
    if nb1 == nb:
        Wu1 = Wu

    blk_win_cells = np.zeros((nb, Wu), np.int32)  # pad -> cell 0 ...
    blk_shift = np.full((nb, Wu, d), PAD_POS, np.float32)  # ... pushed out
    ord_u = np.argsort(u_b, kind="stable")
    ub_s = u_b[ord_u]
    bcnt = np.bincount(ub_s, minlength=nb)
    bstart = np.concatenate([[0], np.cumsum(bcnt)[:-1]])
    bpos = np.arange(len(ub_s)) - np.repeat(bstart, bcnt)
    blk_win_cells[ub_s, bpos] = u_j[ord_u]
    blk_shift[ub_s, bpos] = u_total[ord_u]

    blk_xw_full = xs[blk_win_cells] + blk_shift[:, :, None, :]  # [nb,Wu,M,D]
    # block rows in the block frame
    row_shift = (origins_pad - origins_pad[(np.arange(C) // BG) * BG])
    blk_xs_full = (xs[:C] + row_shift[:, None, :].astype(np.float32)).reshape(
        nb, BG * M, d
    ).transpose(0, 2, 1)  # [nb, D, P]

    def bucket_arrays(idx, wu):
        wc = np.ascontiguousarray(blk_win_cells[idx, :wu])
        bxw = (
            blk_xw_full[idx, :wu]
            .reshape(len(idx), wu * M, d)
            .transpose(0, 2, 1)
        )
        return wc, np.ascontiguousarray(bxw), blk_xs_full[idx]

    # rows are shard-major: [shard0's bucket blocks, shard1's, ...]
    win1, xw1, xs1 = bucket_arrays(np.where(b1_mask)[0], Wu1)
    win2, xw2, xs2 = bucket_arrays(np.where(~b1_mask)[0], Wu)
    _tick("blk_arrays")

    sig_w = K.get_smoothing_kernel(smoothing).norm(h, d)
    sig_g = K.get_gradient_kernel(gradient_kernel).norm(h, d)

    zero_t = jnp.zeros((C, M, Wc * M))
    eng = CellEngine(
        slot_of_particle=jnp.asarray(slot_of_particle, jnp.int32),
        xs=jnp.asarray(xs[:C]),
        vs=jnp.zeros((C, M)),  # placeholder until volumes computed
        win_cells=jnp.asarray(win_cells),
        xw=jnp.asarray(xw),
        vw=jnp.zeros((C, Wc * M)),
        Tw=zero_t,
        Tg=zero_t,
        gsum=jnp.zeros((C, M, d)),
        blk_xs=jnp.asarray(xs1),
        blk_win_cells=jnp.asarray(win1),
        blk_xw=jnp.asarray(xw1),
        blk_vw=jnp.zeros((nb1, Wu1 * M)),
        blk2_xs=jnp.asarray(xs2),
        blk2_win_cells=jnp.asarray(win2),
        blk2_xw=jnp.asarray(xw2),
        blk2_vw=jnp.zeros((nb - nb1, Wu * M)),
        h=jnp.float32(h),
        sig_w=jnp.float32(sig_w),
        sig_g=jnp.float32(sig_g),
    )

    # volumes (v = 1 / (sigma_W sum_w W(d2)), operators_batch.py:70-76)
    # and the static pair-weight matrices
    _tick("engine_pytree")
    # volumes + adjoint self-term from the BLOCK structures (chunked;
    # direct pair differences — more accurate than the cell-frame moment
    # form under periodic wrap shifts, and the only path that scales)
    eng = _finalize_from_blocks(
        eng, np.where(b1_mask)[0], np.where(~b1_mask)[0]
    )
    if xla_tables:
        eng = _finalize(
            eng, smoothing=smoothing, gradient_kernel=gradient_kernel
        )
    if pair_tables is not None:
        eng = _build_pair_tables(
            eng, jnp.dtype(pair_tables),
            np.where(b1_mask)[0], np.where(~b1_mask)[0],
        )
    _tick("finalize")
    return eng


def _blk_pair_diffs(xs_b: Array, xw_b: Array) -> Array:
    """Coordinate-major block rows/windows -> per-axis pair displacements
    [nb, D, P, W] (direct differences, same rule as the Pallas kernels)."""
    return xw_b[:, :, None, :] - xs_b[:, :, :, None]


@jax.jit
def _blk_vol_rows(xs_b: Array, xw_b: Array, h, sig_w) -> Array:
    """Inverse volumes per block row: sig_W sum_w W(d2) over the union
    window (a superset of each row's cell window; extra entries are
    beyond h, where W == 0 — so the sum equals the cell-window sum)."""
    diff = _blk_pair_diffs(xs_b, xw_b)
    d2 = jnp.sum(diff * diff, axis=1)  # [nb, P, W]
    w = jnp.maximum(h * h - d2, 0.0) ** 3
    return sig_w * jnp.sum(w, axis=-1)


@jax.jit
def _blk_gsum_rows(xs_b: Array, xw_b: Array, vw_b: Array, h, sig_g) -> Array:
    """Gradient-adjoint self term per block row:
    sig_g sum_k mag v_k (x_k - x_i)  -> [nb, P, D]."""
    diff = _blk_pair_diffs(xs_b, xw_b)  # [nb, D, P, W]
    d2 = jnp.sum(diff * diff, axis=1)
    dist = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    mag = jnp.where((d2 > 0.0) & (dist < h), 3.0 * (h - dist) ** 2 / dist, 0.0)
    t = sig_g * mag * vw_b[:, None, :]  # [nb, P, W]
    return jnp.einsum("npw,ndpw->npd", t, diff)


def _finalize_from_blocks(
    eng: CellEngine, b1_idx: np.ndarray, b2_idx: np.ndarray,
    chunk: int = 1024,
) -> CellEngine:
    """Volumes + gradient self-term computed from the BLOCK structures in
    chunked device passes — O(P*W*chunk) working memory, no per-cell
    window tables (the xla_tables=False path for large N)."""
    import os as _os
    import time as _time
    _prof = bool(_os.environ.get("SPH_NCA_BUILD_PROFILE"))
    _t = [_time.time()]

    def _tick(stage):
        if _prof:
            now = _time.time()
            print(f"    fin[{stage}]: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    C, M, D = eng.xs.shape
    P = eng.blk_xs.shape[2]
    nb = C * M // P
    h, sig_w, sig_g = eng.h, eng.sig_w, eng.sig_g

    def run(fn, rows_idx, *ops):
        nbk = ops[0].shape[0]
        outs = []
        for c0 in range(0, nbk, chunk):
            end = min(c0 + chunk, nbk)
            parts = [o[c0:end] for o in ops]
            if end - c0 < chunk and nbk > chunk:
                # pad the tail chunk to the full chunk shape: one
                # compiled program per (bucket, pass) instead of two
                # (each extra compile costs ~20-60 s on the tunneled
                # backend); pad rows sit at PAD_POS -> zero pair terms,
                # and the rows are sliced away below anyway
                pad = chunk - (end - c0)
                parts = [
                    np.concatenate(
                        [np.asarray(o),
                         np.full((pad,) + o.shape[1:], PAD_POS,
                                 np.asarray(o).dtype)]
                    )
                    for o in parts
                ]
                outs.append(np.asarray(fn(*parts))[: end - c0])
            else:
                outs.append(np.asarray(fn(*parts)))
        return np.concatenate(outs, 0) if outs else None

    inv = np.zeros((nb, P), np.float32)
    o1 = run(lambda a, b: _blk_vol_rows(a, b, h, sig_w), b1_idx,
             eng.blk_xs, eng.blk_xw)
    _tick("vol_b1")
    if o1 is not None and len(b1_idx):
        inv[b1_idx] = o1
    if len(b2_idx):
        inv[b2_idx] = run(lambda a, b: _blk_vol_rows(a, b, h, sig_w),
                          b2_idx, eng.blk2_xs, eng.blk2_xw)
    _tick("vol_b2")

    pad_slot = np.asarray((eng.xs >= PAD_POS / 2).any(-1))  # [C, M]
    v = np.where(inv > 0.0, 1.0 / np.maximum(inv, 1e-30), 0.0)
    vs = np.where(pad_slot, 0.0, v.reshape(C, M)).astype(np.float32)

    wc1 = np.asarray(eng.blk_win_cells)
    wc2 = np.asarray(eng.blk2_win_cells)
    blk_vw = vs[wc1].reshape(wc1.shape[0], wc1.shape[1] * M)
    blk2_vw = vs[wc2].reshape(wc2.shape[0], wc2.shape[1] * M)
    _tick("vw_gather")

    gsum = np.zeros((nb, P, D), np.float32)
    if len(b1_idx):
        gsum[b1_idx] = run(
            lambda a, b, c: _blk_gsum_rows(a, b, c, h, sig_g), b1_idx,
            eng.blk_xs, eng.blk_xw, jnp.asarray(blk_vw),
        )
    if len(b2_idx):
        gsum[b2_idx] = run(
            lambda a, b, c: _blk_gsum_rows(a, b, c, h, sig_g), b2_idx,
            eng.blk2_xs, eng.blk2_xw, jnp.asarray(blk2_vw),
        )

    gsum = np.where(pad_slot[..., None], 0.0, gsum.reshape(C, M, D))
    _tick("gsum")
    return eng._replace(
        vs=jnp.asarray(vs),
        gsum=jnp.asarray(gsum.astype(np.float32)),
        blk_vw=jnp.asarray(blk_vw),
        blk2_vw=jnp.asarray(blk2_vw),
    )


@partial(jax.jit, static_argnames=("dtype",))
def _blk_pair_mats(xs_b: Array, xw_b: Array, h, dtype) -> Tuple[Array, Array]:
    """Per-block pair tables: displacement-scaled spiky factors
    md [nb, D, P, W] = mag * (xw_d - xb_d) and poly6 core [nb, P, W].
    d2 is formed by direct per-axis differences in f32 (cancellation-free
    near d -> 0, same rule as the recompute kernels) BEFORE the cast."""
    diff = _blk_pair_diffs(xs_b, xw_b)  # [nb, D, P, W] = xw - xb
    d2 = jnp.sum(diff * diff, axis=1)
    dist = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    mag = jnp.where(
        (d2 > 0.0) & (dist < h), 3.0 * (h - dist) ** 2 / dist, 0.0
    )
    w6 = jnp.maximum(h * h - d2, 0.0) ** 3
    nb, ddim, p, w = diff.shape
    md = (mag[:, None] * diff).astype(dtype).reshape(nb, ddim * p, w)
    return md, w6.astype(dtype)


@jax.jit
def _blk_gsum_from_tables(md: Array, vw_b: Array, sig_g) -> Array:
    """Adjoint self-term re-derived from the QUANTIZED table:
    gsum[p, d] = sig_g sum_w md_q[d, p, w] v_w. The forward table kernel
    uses this as its rowsum correction, so a spatially-constant field
    cancels to f32-accumulation noise instead of table-quantization
    noise (grad(const) == 0 must hold at table precision, else bf16
    errors are amplified by |A| / |dA across h|)."""
    return sig_g * jnp.einsum(
        "nrw,nw->nr", md.astype(jnp.float32), vw_b,
        precision=jax.lax.Precision.HIGHEST,
    )  # [nb, D*P] (rows d-major, like md)


def _build_pair_tables(
    eng: CellEngine, dtype, b1_idx: np.ndarray, b2_idx: np.ndarray,
    chunk: int = 512,
) -> CellEngine:
    """Precompute the static per-block pair-weight matrices (chunked),
    and replace gsum with the quantization-consistent version."""
    C, M, D = eng.xs.shape
    P = eng.blk_xs.shape[2]
    nb = C * M // P

    def run(xs_b, xw_b, vw_b):
        nbk = xs_b.shape[0]
        ddim, p, wdim = xs_b.shape[1], xs_b.shape[2], xw_b.shape[2]
        mds, w6s, gss = [], [], []
        for c0 in range(0, nbk, chunk):
            end = min(c0 + chunk, nbk)
            xs_c, xw_c, vw_c = xs_b[c0:end], xw_b[c0:end], vw_b[c0:end]
            keep = end - c0
            if keep < chunk and nbk > chunk:
                # pad the tail chunk (see _finalize_from_blocks.run):
                # avoids a second compiled shape per bucket
                pad = chunk - keep
                xs_c = jnp.concatenate(
                    [xs_c, jnp.full((pad, ddim, p), PAD_POS)], 0)
                xw_c = jnp.concatenate(
                    [xw_c, jnp.full((pad, ddim, wdim), PAD_POS)], 0)
                vw_c = jnp.concatenate(
                    [vw_c, jnp.zeros((pad, wdim))], 0)
            m, w = _blk_pair_mats(xs_c, xw_c, eng.h, dtype)
            gs = np.asarray(_blk_gsum_from_tables(m, vw_c, eng.sig_g))
            mds.append(m[:keep])
            w6s.append(w[:keep])
            # [nbk, D*P] d-major -> [nbk, P, D]
            gss.append(gs[:keep].reshape(-1, ddim, p).transpose(0, 2, 1))
        if not mds:
            return (jnp.zeros((0, ddim * p, wdim), dtype),
                    jnp.zeros((0, p, wdim), dtype),
                    np.zeros((0, p, ddim), np.float32))
        return (jnp.concatenate(mds, 0), jnp.concatenate(w6s, 0),
                np.concatenate(gss, 0))

    import os as _os
    import time as _time
    _t0 = _time.time()
    md1, w61, gs1 = run(eng.blk_xs, eng.blk_xw, eng.blk_vw)
    md2, w62, gs2 = run(eng.blk2_xs, eng.blk2_xw, eng.blk2_vw)
    if _os.environ.get("SPH_NCA_BUILD_PROFILE"):
        print(f"    tab[chunks]: {_time.time() - _t0:.2f}s", flush=True)

    gsum = np.zeros((nb, P, D), np.float32)
    if len(b1_idx):
        gsum[b1_idx] = gs1
    if len(b2_idx):
        gsum[b2_idx] = gs2
    return eng._replace(
        blk_md=md1, blk_w6=w61, blk2_md=md2, blk2_w6=w62,
        gsum=jnp.asarray(gsum.reshape(C, M, D)),
    )


@partial(jax.jit, static_argnames=("smoothing", "gradient_kernel"))
def _finalize(
    eng: CellEngine,
    *,
    smoothing: str,
    gradient_kernel: str,
) -> CellEngine:
    """XLA-path tables Tw/Tg/vw from the per-cell windows. Volumes and
    the adjoint self-term (vs/gsum/blk_vw) are already on the engine —
    computed by _finalize_from_blocks, whose direct pair differences are
    more accurate than this cell-frame moment form."""
    kern = K.get_smoothing_kernel(smoothing)
    d2 = eng.pair_d2()
    w = kern.w(d2, eng.h)  # [C, M, WM]
    c, m = eng.num_cells, eng.slots_per_cell
    vw = eng.vs.reshape(c, m)[eng.win_cells].reshape(c, -1)

    Tw = eng.sig_w * w * vw[:, None, :]

    d = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    inside = (d2 > 0.0) & (d < eng.h)
    mag = jnp.where(inside, 3.0 * (eng.h - d) ** 2 / d, 0.0)
    Tg = eng.sig_g * mag * vw[:, None, :]

    return eng._replace(vw=vw, Tw=Tw, Tg=Tg)
