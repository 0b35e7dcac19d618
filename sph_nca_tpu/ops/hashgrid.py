"""TPU-native neighbor engine: periodic cell hash -> fixed-K neighbor lists.

The reference builds a hash grid (cell hash + sort + cell boundary scan,
code/sphops/preprocess.py:11-43, hashgrid/single_impl.py) and then has every
CUDA thread chase variable-length sorted cell slices at op time
(operators_batch.py:58-75). That pointer-chasing inner loop is hostile to
TPU vector units, so we restructure the neighbor search as data:

  1. cell ids via the same periodic (modulo-wrapped) hash as the reference
     (single_impl.py:34-44) — correctness does not depend on the hash being
     collision-free because every op re-checks |r| < h, exactly like the
     reference kernels (W == 0 beyond the support radius);
  2. one `argsort` over cell ids + `searchsorted` cell boundaries
     (replaces grid_hash -> torch.sort -> cell_index_init);
  3. a static-shape candidate expansion over the 3^D neighbor cells with a
     per-cell occupancy cap, then `lax.top_k` compaction by distance to a
     fixed neighbor budget K.

The result is a `NeighborList` of static shape [N, K] that every SPH op
consumes as plain gathers — XLA-friendly, differentiable, shardable.

Particles are static within (and across) reference rollouts (code/nca.py:136
builds the grid once per rollout), so the build cost amortizes over the
K-step scan and its BPTT backward.

Periodic boundaries: instead of materializing ghost particles every step
(reference code/nca.py:167-242), pass ``period`` — displacements use the
minimum-image convention and the modulo hash wires the cells into a torus.
This is exact whenever ``period[d] >= 2h`` (each pair has at most one image
within the kernel support, which holds for every reference config:
gsize = 2, h <= 0.1).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels as K

Array = jnp.ndarray
Dims = Union[int, Sequence[int]]


def default_dims(h: float, extent: float = 2.0) -> int:
    """Cells per axis, as the reference CLIs compute it (train.py:74)."""
    return math.ceil(extent / h)


def _dims_tuple(dims: Dims, d: int) -> Tuple[int, ...]:
    if isinstance(dims, int):
        dims = (dims,) * d
    dims = tuple(int(x) for x in dims)
    if len(dims) != d:
        raise ValueError(f"dims {dims} does not match point dimension {d}")
    if any(x < 3 for x in dims):
        # With fewer than 3 cells per axis the 3^D stencil would visit the
        # same cell twice and double-count pairs (the reference has the same
        # constraint implicitly: DIMS = ceil(2/h) >= 20 for its h <= 0.1).
        raise ValueError(f"need at least 3 cells per axis, got {dims}")
    return dims


def _strides(dims: Tuple[int, ...]) -> np.ndarray:
    """Flattening strides c_d with hash = sum_d cell_d * c_d.

    Matches the reference's mixed-radix hash (single_impl.py:22-32).
    """
    out = np.ones(len(dims), dtype=np.int32)
    for i in range(1, len(dims)):
        out[i] = out[i - 1] * dims[i - 1]
    return out


def _stencil_offsets(d: int) -> np.ndarray:
    """All 3^D offsets in {-1, 0, 1}^D, shape [3^D, D] (single_impl.py:58-62)."""
    grids = np.meshgrid(*([np.array([-1, 0, 1])] * d), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


def cell_index(x: Array, h, dims: Tuple[int, ...]) -> Array:
    """Per-axis periodic cell index floor(x/h) mod dims, shape [N, D].

    Reference: single_impl.py:14-20 (grid_index) + :34-44 (modulo wrap).
    """
    dims_arr = jnp.asarray(dims, dtype=jnp.int32)
    ci = jnp.floor(x / h).astype(jnp.int32)
    return jnp.mod(ci, dims_arr)


class NeighborList(NamedTuple):
    """Fixed-size neighborhood structure.

    idx:   [N, K] int32 — neighbor particle indices (self included);
           lanes with ``valid == False`` are clamped placeholders.
    valid: [N, K] bool  — which lanes are real neighbors (|r| < h).
    num_dropped: [] int32 — neighbors within h that did not fit in K
           (0 means the list is exact; tests assert this).
    """

    idx: Array
    valid: Array
    num_dropped: Array

    @property
    def k(self) -> int:
        return self.idx.shape[-1]


def minimum_image(r: Array, period: Optional[Array]) -> Array:
    """Minimum-image displacement for periodic domains (no-op if period None)."""
    if period is None:
        return r
    period = jnp.asarray(period)
    return r - jnp.round(r / period) * period


@partial(
    jax.jit,
    static_argnames=("dims", "max_per_cell", "k", "chunk", "h_static"),
)
def _build_neighbor_list_impl(
    x: Array,
    period: Optional[Array],
    *,
    h_static: float,
    dims: Tuple[int, ...],
    max_per_cell: int,
    k: int,
    chunk: int,
) -> NeighborList:
    n, d = x.shape
    h = h_static
    strides = jnp.asarray(_strides(dims))
    dims_arr = jnp.asarray(dims, dtype=jnp.int32)
    num_stencil = 3**d

    ci = cell_index(x, h, dims)  # [N, D]
    cell = ci @ strides  # [N]

    order = jnp.argsort(cell)  # stable; replaces torch.sort (preprocess.py:36)
    cell_sorted = cell[order]

    # Cell boundaries without a scatter kernel: binary search over the sorted
    # ids (replaces cell_index_init, single_impl.py:93-109).
    num_cells = int(np.prod(dims))
    cell_ids = jnp.arange(num_cells, dtype=cell_sorted.dtype)
    starts = jnp.searchsorted(cell_sorted, cell_ids, side="left")
    ends = jnp.searchsorted(cell_sorted, cell_ids, side="right")
    counts = (ends - starts).astype(jnp.int32)
    starts = starts.astype(jnp.int32)

    # Occupancy overflow (cell with more than max_per_cell points): counted
    # so callers/tests can detect a too-small capacity.
    num_cell_dropped = jnp.sum(jnp.maximum(counts - max_per_cell, 0))

    offsets = jnp.asarray(_stencil_offsets(d))  # [S, D]
    slot = jnp.arange(max_per_cell, dtype=jnp.int32)  # [M]

    # Process particles in fixed-size blocks so the [block, 3^D * M]
    # candidate tensors stay small (the full [N, ...] expansion at
    # N ~ 1e5 would need GBs of HBM).
    pad = (-n) % chunk
    ci_p = jnp.pad(ci, ((0, pad), (0, 0)))
    x_p = jnp.pad(x, ((0, pad), (0, 0)))
    nb = (n + pad) // chunk

    def process(args):
        ci_b, x_b = args  # [B, D], [B, D]
        b = ci_b.shape[0]
        nci = jnp.mod(ci_b[:, None, :] + offsets[None, :, :], dims_arr)
        ncell = nci @ strides  # [B, S]
        c_start = starts[ncell]  # [B, S]
        c_count = counts[ncell]  # [B, S]
        cand_pos = c_start[:, :, None] + slot  # [B, S, M]
        in_cell = slot < c_count[:, :, None]
        cand_idx = order[jnp.clip(cand_pos, 0, n - 1)]
        cand_idx = cand_idx.reshape(b, num_stencil * max_per_cell)
        in_cell = in_cell.reshape(b, num_stencil * max_per_cell)

        r = minimum_image(x[cand_idx] - x_b[:, None, :], period)
        d2 = jnp.sum(r * r, axis=-1)
        cand_valid = in_cell & (d2 < h * h)

        # Compact to the K nearest: distance key, +inf for invalid lanes.
        key = jnp.where(cand_valid, d2, jnp.inf)
        _, sel = jax.lax.top_k(-key, k)
        idx = jnp.take_along_axis(cand_idx, sel, axis=1)
        valid = jnp.take_along_axis(cand_valid, sel, axis=1)
        dropped = jnp.sum(cand_valid) - jnp.sum(valid)
        return jnp.where(valid, idx, 0).astype(jnp.int32), valid, dropped

    idx_b, valid_b, dropped_b = jax.lax.map(
        process,
        (ci_p.reshape(nb, chunk, d), x_p.reshape(nb, chunk, d)),
    )
    idx = idx_b.reshape(nb * chunk, k)[:n]
    valid = valid_b.reshape(nb * chunk, k)[:n]
    num_dropped = (jnp.sum(dropped_b) + num_cell_dropped).astype(jnp.int32)
    return NeighborList(idx=idx, valid=valid, num_dropped=num_dropped)


def build_neighbor_list(
    x: Array,
    h,
    dims: Dims,
    *,
    max_per_cell: int,
    k: int,
    period: Optional[Array] = None,
    chunk: int = 4096,
) -> NeighborList:
    """Build a fixed-K neighbor list for points ``x`` [N, D].

    Static arguments ``max_per_cell`` (occupancy cap per hash cell — note
    aliased cells share one slot pool, so leave headroom; see
    `suggest_capacity`) and ``k`` (neighbor budget) determine all shapes.
    Exactness is checkable post-hoc via ``num_dropped == 0``.
    The build is jitted and chunked (``chunk`` particles per block).
    """
    n, d = x.shape
    dims = _dims_tuple(dims, d)
    period_arr = None if period is None else jnp.asarray(period)
    return _build_neighbor_list_impl(
        x,
        period_arr,
        h_static=float(h),
        dims=dims,
        max_per_cell=int(max_per_cell),
        k=int(k),
        chunk=int(min(chunk, max(n, 1))),
    )


def suggest_capacity(
    x,
    h,
    dims: Dims,
    *,
    period=None,
    slack: float = 1.25,
    align: int = 8,
) -> Tuple[int, int]:
    """Eagerly compute (max_per_cell, k) for concrete positions.

    Returns the true max hash-cell occupancy and max neighbor count, padded by
    ``slack`` and rounded up to a multiple of ``align`` (TPU lane friendly).
    Host-side helper — call outside jit with concrete ``x``.
    """
    x = np.asarray(x)
    n, d = x.shape
    dims = _dims_tuple(dims, d)

    def pad(v: int) -> int:
        v = int(math.ceil(v * slack))
        return ((v + align - 1) // align) * align

    # Fast path: exact counts from the native grid analyzer (C++), which
    # is ~50x faster than the numpy pass at N ~ 1e5.
    from .. import native

    nat = native.capacity(x, float(h), dims, period=period)
    if nat is not None:
        max_occ, max_nbrs = nat
        return pad(max_occ), pad(max_nbrs)

    strides = _strides(dims)
    ci = np.mod(np.floor(x / h).astype(np.int64), np.asarray(dims))
    cell = ci.astype(np.int64) @ strides.astype(np.int64)
    occupancy = np.bincount(cell, minlength=int(np.prod(dims)))
    max_occ = int(occupancy.max())

    # Max neighbor count: exact for small n, sampled estimate for large n.
    # Chunked f32 so the pair matrix never exceeds ~100MB of host RAM.
    x32 = x.astype(np.float32)
    if n <= 4096:
        queries = x32
    else:
        sample = np.random.default_rng(0).choice(n, 2048, replace=False)
        queries = x32[sample]
    p = np.asarray(period, np.float32) if period is not None else None
    max_nbrs = 0
    chunk = max(1, (64 << 20) // (4 * d * n))
    for s in range(0, len(queries), chunk):
        r = x32[None] - queries[s : s + chunk, None]
        if p is not None:
            r = r - np.round(r / p) * p
        counts = (np.sum(r * r, axis=-1) < h * h).sum(axis=-1)
        max_nbrs = max(max_nbrs, int(counts.max()))

    return pad(max_occ), pad(max_nbrs)


# ---------------------------------------------------------------------------
# SPHGraph: neighbor list + precomputed kernel weights (the rollout fast path)
# ---------------------------------------------------------------------------


class SPHGraph(NamedTuple):
    """Static-geometry SPH graph with precomputed edge weights.

    Because particles do not move during a rollout (reference nca.py:136
    builds the grid once), the kernel evaluations W(r_ij), gk(r_ij) and the
    volumes are constants of the rollout. Precomputing them turns every
    per-step SPH op into gathers + multiply-accumulate (and leaves the MXU
    free for the NCA MLP).

    idx:    [N, K] int32 neighbor indices
    valid:  [N, K] bool
    v:      [N]      particle volumes
    wv:     [N, K]   sigma_W * W(r_ij) * v_j         (blur weights)
    gv:     [N, K, D] sigma_g * gk(r_ij) * v_j       (gradient weights)
    gv_sum: [N, D]   sum_k gv — lets gradient() skip forming (A_j - A_i)
    """

    idx: Array
    valid: Array
    v: Array
    wv: Array
    gv: Array
    gv_sum: Array

    @property
    def n(self) -> int:
        return self.idx.shape[0]

    @property
    def k(self) -> int:
        return self.idx.shape[-1]


def build_graph(
    x: Array,
    h,
    dims: Dims,
    *,
    max_per_cell: int,
    k: int,
    period: Optional[Array] = None,
    smoothing: str = K.DEFAULT_SMOOTHING,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
    exact: bool = True,
) -> SPHGraph:
    """Build neighbor list + volumes + precomputed edge weights for ``x``.

    ``exact`` (eager-only, ignored under jit tracing): if the fixed-K list
    dropped any true neighbor (``num_dropped > 0`` — possible when the
    capacities came from suggest_capacity's SAMPLED estimate at n > 4096),
    retry with 1.5x capacities until exact instead of silently computing
    on a truncated neighborhood. Pass ``exact=False`` to keep a
    deliberately undersized K (tests exercise the drop accounting).
    """
    nl = build_neighbor_list(
        x, h, dims, max_per_cell=max_per_cell, k=k, period=period
    )
    if exact and not isinstance(nl.num_dropped, jax.core.Tracer):
        import math as _math

        while int(nl.num_dropped) > 0:
            max_per_cell = int(_math.ceil(max_per_cell * 1.5 / 8)) * 8
            k = int(_math.ceil(k * 1.5 / 8)) * 8
            nl = build_neighbor_list(
                x, h, dims, max_per_cell=max_per_cell, k=k, period=period
            )
    return graph_from_neighbor_list(
        x, h, nl, period=period, smoothing=smoothing,
        gradient_kernel=gradient_kernel,
    )


def graph_from_neighbor_list(
    x: Array,
    h,
    nl: NeighborList,
    *,
    period: Optional[Array] = None,
    smoothing: str = K.DEFAULT_SMOOTHING,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
) -> SPHGraph:
    dim = x.shape[-1]
    skern = K.get_smoothing_kernel(smoothing)
    gkern = K.get_gradient_kernel(gradient_kernel)

    r = minimum_image(x[nl.idx] - x[:, None, :], period)  # [N, K, D]
    d2 = jnp.sum(r * r, axis=-1)
    w = jnp.where(nl.valid, skern.w(d2, h), 0.0)  # [N, K]

    # volume: v_i = 1 / (sigma_W sum_j W)   (operators_batch.py:70-76)
    v = 1.0 / (skern.norm(h, dim) * jnp.sum(w, axis=-1))

    vj = v[nl.idx] * nl.valid  # [N, K]
    wv = skern.norm(h, dim) * w * vj
    gk = jnp.where(nl.valid[..., None], gkern.grad(r, h), 0.0)
    gv = gkern.norm(h, dim) * gk * vj[..., None]
    return SPHGraph(
        idx=nl.idx, valid=nl.valid, v=v, wv=wv, gv=gv,
        gv_sum=jnp.sum(gv, axis=1),
    )
