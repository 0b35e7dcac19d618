"""Halo-exchange sharding of the band engine (the flagship throughput
path) — particle-axis parallelism with comm proportional to BOUNDARY
size, not state size.

The band engine's blocks are Morton-contiguous (ops/bands.py), so
sharding the block axis over the "particle" mesh axis gives each device
a contiguous curve segment. The two pair structures then need exactly
two kinds of exchange, both static per geometry:

  * BAND windows read blocks [b-1, b, b+1]: only the shard-edge blocks
    cross the boundary — ONE `ppermute` of the first/last block's rows
    per direction (2*P*L values per shard per pass). This is the
    textbook boundary halo the Morton layout was built for
    (SCALING.md), the structural cousin of ring attention's
    neighbor-exchange.
  * FAR groups can reference any shard (curve jumps). Each shard owns a
    static EXPORT list — the union of groups any other shard's far
    lists reference — and one `all_gather` of the export-compacted rows
    ([k, E, g*L]) satisfies every remote read via a static index map.
    E is the boundary population (measured ~3-8% of a shard's rows on
    the 100k sphere), so comm is ~E/(S*P/g) of the all-gather-the-state
    exchange parallel/cell_shard.py uses.

Everything inside the shard_map body is plain XLA (dots + gathers +
collectives), so jax autodiff differentiates the whole sharded rollout
— the collectives' transposes (ppermute^T = reverse permute,
all_gather^T = psum_scatter) give the sharded BPTT for free. The
reference has no multi-device capability at all (SURVEY.md §2e).

Comm accounting helpers quantify bytes/step for the SCALING.md model;
tests pin sharded == unsharded on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bands import (
    ALIVE_THRESHOLD,
    BandEngine,
    _pair_dot,
    _take_lanes,
)
from .mesh import PARTICLE_AXIS

Array = jnp.ndarray


class BandShards(NamedTuple):
    """Per-shard band structure: every field is [k, ...] and sharded on
    axis 0 over the particle mesh axis (one shard's slice per device).
    S = blocks per shard, E = export groups, H = halo groups (max over
    shards, zero-padded)."""

    Tband: Array  # [k, S, 3P, CC]
    gsum: Array  # [k, S, P, D] f32
    vs: Array  # [k, S, P]
    export_idx: Array  # [k, E] int32 local group ids this shard exports
    halo_src: Array  # [k, H] int32 into the received-rows buffer
    # ([k*E] all_gather mode / [sum Edelta] targeted mode)
    far_groups: Tuple[Array, ...]  # [k, nbt, Wt] int32, local+halo space
    far_tabs: Tuple[Array, ...]  # [k, nbt, Wt*g, CC]
    far_vwmask: Tuple[Array, ...]  # [k, nbt, Wt*g]
    far_perm: Array  # [k, S] int32 into concat(bucket outs + 1 zero row)
    # targeted mode: per curve-distance delta, the local group ids each
    # shard ppermutes to shard (s+delta)%k — see _halo_rows
    send_idx: Tuple[Array, ...] = ()  # per delta: [k, Edelta] int32

    @property
    def k(self) -> int:
        return self.Tband.shape[0]

    @property
    def blocks_per_shard(self) -> int:
        return self.Tband.shape[1]

    @property
    def rows_per_block(self) -> int:
        return self.Tband.shape[2] // 3


class BandShardStatic(NamedTuple):
    """Python-level constants for the sharded ops (closure args, not
    traced)."""

    k: int
    g: int  # far group size
    d: int
    P: int
    sig_w: float
    sig_g: float
    # non-empty -> targeted far exchange: one ppermute per curve
    # distance delta instead of the global export all_gather
    deltas: Tuple[int, ...] = ()


def shard_band_engine(
    eng: BandEngine, k: int, *, halo: str = "targeted"
) -> Tuple[BandShards, BandShardStatic]:
    """Partition a band engine (built with ``block_multiple=k`` so
    nb % k == 0) into k contiguous block shards + the static halo
    exchange structure (host-side numpy).

    ``halo``: "targeted" (default) exchanges far groups with one
    ppermute per populated curve distance — comm proportional to the
    boundary; "allgather" replicates every shard's exports to all k
    shards (the round-3 exchange, kept for comparison/measurement)."""
    nb, Pr = eng.num_cells, eng.slots_per_cell
    if nb % k:
        raise ValueError(
            f"nb={nb} not divisible by k={k}; build the engine with "
            f"block_multiple={k}"
        )
    S = nb // k
    g = eng.far_group_size
    if Pr % g:
        raise ValueError(f"far_group {g} must divide block rows {Pr}")
    gpb = Pr // g
    gps = S * gpb  # groups per shard
    d = eng.dim
    cc = (d + 1) * Pr

    far_blocks = [np.asarray(b) for b in eng.far_blocks]
    far_groups = [np.asarray(x) for x in eng.far_groups]
    far_tabs = [np.asarray(t) for t in eng.far_tabs]
    far_vwmask = [np.asarray(m) for m in eng.far_vwmask]

    # ---- halo/export structure (far refs crossing shard boundaries) ---
    # valid-entry masks: each group-list row holds its real entries in
    # positions 0..cnt-1 with STRICTLY increasing group ids (np.unique
    # order, bands.py grp_list fill); pad entries repeat group 0. Pads
    # must not enter the needed/halo sets — they would drag global
    # group 0 into every shard's all_gather for nothing.
    valid_l = []
    for grps in far_groups:
        v = np.ones(grps.shape, bool)
        if grps.shape[1] > 1:
            v[:, 1:] = grps[:, 1:] > grps[:, :-1]
        valid_l.append(np.logical_and.accumulate(v, axis=1))

    needed = [set() for _ in range(k)]
    for blks, grps, valid in zip(far_blocks, far_groups, valid_l):
        if not len(blks):
            continue
        sh = blks // S
        for s in range(k):
            sel = sh == s
            if sel.any():
                gset = np.unique(grps[sel][valid[sel]])
                needed[s].update(gset[gset // gps != s].tolist())
    needed = [
        np.sort(np.fromiter(ns, np.int64)) if ns else
        np.zeros(0, np.int64)
        for ns in needed
    ]

    H = max(1, max(len(n) for n in needed))
    halo_src = np.zeros((k, H), np.int32)

    if halo == "targeted":
        # Neighbor-targeted exchange: shard s ppermutes, per curve
        # distance delta, exactly the groups shard (s+delta)%k needs
        # from it. Morton locality makes most far refs land at
        # delta in {1, k-1}, so total sent rows track the BOUNDARY
        # population instead of the all_gather's k*E replication
        # (export fraction grew 12.8% @k=4 -> 20.4% @k=8 under the
        # global all_gather, SCALING.md round 3).
        send_lists = {}
        deltas = []
        for delta in range(1, k):
            lists = []
            nz = False
            for s in range(k):
                nt = needed[(s + delta) % k]
                mine = nt[nt // gps == s]
                lists.append(mine)
                nz = nz or len(mine) > 0
            if nz:
                deltas.append(delta)
                send_lists[delta] = lists
        offsets = {}
        off = 0
        for dlt in deltas:
            offsets[dlt] = off
            off += max(len(l) for l in send_lists[dlt])
        send_idx = []
        for dlt in deltas:
            Ed = max(len(l) for l in send_lists[dlt])
            arr = np.zeros((k, Ed), np.int32)
            for s in range(k):
                loc = send_lists[dlt][s] - s * gps
                arr[s, : len(loc)] = loc
            send_idx.append(arr)
        for s in range(k):
            for j, gid in enumerate(needed[s]):
                t = int(gid) // gps
                dlt = (s - t) % k
                pos = offsets[dlt] + int(
                    np.searchsorted(send_lists[dlt][t], gid)
                )
                halo_src[s, j] = pos
        export_idx = np.zeros((k, 1), np.int32)  # unused in this mode
        deltas = tuple(deltas)
        send_idx = tuple(jnp.asarray(a) for a in send_idx)
    elif halo == "allgather":
        exports = []
        for s in range(k):
            exp = set()
            for t in range(k):
                if t == s:
                    continue
                nt = needed[t]
                exp.update(nt[nt // gps == s].tolist())
            exports.append(np.sort(np.fromiter(exp, np.int64)) if exp
                           else np.zeros(0, np.int64))
        E = max(1, max(len(e) for e in exports))
        export_idx = np.zeros((k, E), np.int32)
        for s in range(k):
            loc = exports[s] - s * gps
            export_idx[s, : len(loc)] = loc
            for j, gid in enumerate(needed[s]):
                t = int(gid) // gps
                pos = int(np.searchsorted(exports[t], gid))
                halo_src[s, j] = t * E + pos
        deltas = ()
        send_idx = ()
    else:
        raise ValueError(f"unknown halo mode {halo!r}")

    def remap_groups(s, grps, valid):
        """Global group ids -> shard-local window indices: own groups
        map to [0, gps), halo groups to gps + position in needed[s],
        pad entries to 0 (their table columns are zero — any in-range
        index works). Vectorized: at 1M points the group lists are
        millions of entries."""
        g64 = grps.astype(np.int64)
        own = g64 - s * gps
        halo = gps + np.searchsorted(needed[s], g64)
        out = np.where(g64 // gps == s, own, halo)
        return np.where(valid, out, 0).astype(np.int32)

    # ---- per-shard far buckets: rank-profile rebucketing ---------------
    # Slicing the GLOBAL width-class buckets per shard pads each bucket's
    # block count to the max across shards — measured 1.89x far work at
    # k=8 on the 32k sphere (runs/scaling_trend.md round 5). SPMD needs
    # identical shapes on every shard, but each shard may fill them with
    # ITS OWN blocks: sort each shard's far blocks by true width
    # descending and bucket the RANK-PROFILE width R[i] = max_s
    # width(i-th widest block of shard s) — the floor for identical
    # per-shard shapes (1.10x here; <=16 contiguous rank buckets via the
    # same padding-optimal DP reach ~1.15x). Zero-padded table rows are
    # inert (zero columns, grp 0), exactly like the global build's pads.
    cols = far_tabs[0].shape[-1] if far_tabs else 0
    tdtype = far_tabs[0].dtype if far_tabs else np.float32
    mdtype = far_vwmask[0].dtype if far_vwmask else np.float32
    per_shard = [[] for _ in range(k)]  # (w, grps, valid, tab, mask, lb)
    for blks, grps, tabs, masks, valid in zip(far_blocks, far_groups,
                                              far_tabs, far_vwmask,
                                              valid_l):
        if not len(blks):
            continue
        sh = blks // S
        w = valid.sum(1)
        for i in range(len(blks)):
            s = int(sh[i])
            per_shard[s].append(
                (int(w[i]), grps[i], valid[i], tabs[i], masks[i],
                 int(blks[i] - s * S))
            )
    for p in per_shard:
        p.sort(key=lambda r: -r[0])
    n_ranks = max((len(p) for p in per_shard), default=0)

    fg_l, ft_l, fm_l = [], [], []
    perm = np.zeros((k, S), np.int32)
    total_rows = 0
    if n_ranks:
        from ..ops.bands import _bucket_cuts

        R = np.zeros(n_ranks, np.int64)
        for p in per_shard:
            for i, r in enumerate(p):
                R[i] = max(R[i], r[0])
        cuts = _bucket_cuts(np.sort(R), 16)  # ascending bucket widths
        # rank i -> bucket with the smallest cut >= R[i]; R descending
        # in rank order makes each bucket a contiguous rank range
        bucket_of = np.searchsorted(np.asarray(cuts), R)
        row_cursor = 0
        for bi, Wr in enumerate(cuts):
            ranks = np.where(bucket_of == bi)[0]
            if not len(ranks):
                continue
            nbt = len(ranks)
            Wr = int(Wr)
            gk = np.zeros((k, nbt, Wr), np.int32)
            tk = np.zeros((k, nbt, Wr * g, cols), tdtype)
            mk = np.zeros((k, nbt, Wr * g), mdtype)
            for s in range(k):
                for j, rank in enumerate(ranks):
                    if rank >= len(per_shard[s]):
                        continue
                    w, grow, vrow, trow, mrow, lb = per_shard[s][rank]
                    gk[s, j, :w] = remap_groups(
                        s, grow[None, :w], vrow[None, :w]
                    )[0]
                    tk[s, j, : w * g] = trow[: w * g]
                    mk[s, j, : w * g] = mrow[: w * g]
                    perm[s, lb] = row_cursor + j
            fg_l.append(gk)
            ft_l.append(tk)
            fm_l.append(mk)
            row_cursor += nbt
        total_rows = row_cursor
    # blocks with no far entries point at the appended zero row
    has_far = np.zeros((k, S), bool)
    for blks in far_blocks:
        if len(blks):
            sh = blks // S
            for s in range(k):
                sel = sh == s
                has_far[s, blks[sel] - s * S] = True
    perm[~has_far] = total_rows  # the zero row

    shards = BandShards(
        Tband=jnp.asarray(np.asarray(eng.Tband).reshape(k, S, 3 * Pr, cc)),
        gsum=jnp.asarray(np.asarray(eng.gsum).reshape(k, S, Pr, d)),
        vs=jnp.asarray(np.asarray(eng.vs).reshape(k, S, Pr)),
        export_idx=jnp.asarray(export_idx),
        halo_src=jnp.asarray(halo_src),
        far_groups=tuple(jnp.asarray(x) for x in fg_l),
        far_tabs=tuple(jnp.asarray(x) for x in ft_l),
        far_vwmask=tuple(jnp.asarray(x) for x in fm_l),
        far_perm=jnp.asarray(perm),
        send_idx=send_idx,
    )
    static = BandShardStatic(
        k=k, g=g, d=d, P=Pr,
        sig_w=float(eng.sig_w), sig_g=float(eng.sig_g),
        deltas=deltas,
    )
    return shards, static


def place_shards(shards: BandShards, mesh: Mesh) -> BandShards:
    """Device_put every field with its axis-0 sharded over the particle
    mesh axis (replicated over any data axis)."""
    spec = NamedSharding(mesh, P(PARTICLE_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, spec), shards)


def comm_bytes_per_pass(shards: BandShards, static: BandShardStatic,
                        lanes: int, itemsize: int = 2) -> dict:
    """Static comm-volume accounting for ONE pair pass at ``lanes``
    window lanes: ppermute moves 2 boundary blocks per shard; the far
    exchange moves sum_delta E_delta group rows per shard (targeted)
    or k*E (all_gather). Returns bytes per device per pass (the
    SCALING.md model inputs); ``allgather_bytes`` is the far-exchange
    volume in both modes."""
    k, g, Pr = static.k, static.g, static.P
    S = shards.blocks_per_shard
    if static.deltas:
        # sent == received per shard: one ppermute per distance
        sent_rows = sum(int(a.shape[1]) for a in shards.send_idx)
        recv_rows = sent_rows
        mode = "targeted"
    else:
        # each shard sends its E export rows once; the all_gather
        # delivers every shard's exports to everyone (k*E received)
        sent_rows = int(shards.export_idx.shape[1])
        recv_rows = k * sent_rows
        mode = "allgather"
    return {
        "mode": mode,
        "ppermute_bytes": 2 * Pr * lanes * itemsize,
        "allgather_bytes": recv_rows * g * lanes * itemsize,
        # sent rows / this shard's group rows — the SCALING.md metric
        "export_fraction": sent_rows / (S * Pr / g),
        "full_state_bytes": k * S * Pr * lanes * itemsize,
    }


# ---------------------------------------------------------------------------
# Sharded ops (inside shard_map; every array is this shard's slice)
# ---------------------------------------------------------------------------


def _band_window_halo(X: Array, k: int) -> Array:
    """[S, P, L] -> [S, 3P, L] band windows with the shard-edge blocks
    exchanged by ppermute (the wrap across shard 0/k-1 matches the
    global jnp.roll semantics — table zeros make it inert unless the
    domain is genuinely periodic)."""
    fwd = [(i, (i + 1) % k) for i in range(k)]
    bwd = [(i, (i - 1) % k) for i in range(k)]
    prev = jax.lax.ppermute(X[-1], PARTICLE_AXIS, fwd)
    nxt = jax.lax.ppermute(X[0], PARTICLE_AXIS, bwd)
    Xext = jnp.concatenate([prev[None], X, nxt[None]], axis=0)
    return jnp.concatenate(
        [Xext[:-2], Xext[1:-1], Xext[2:]], axis=1
    )


def _halo_rows(Xflat_g: Array, loc: "BandShards",
               st: BandShardStatic) -> Array:
    """Far-group halo exchange, Xflat_g [gps, g*L] -> [H, g*L].

    Targeted mode (st.deltas non-empty): one ppermute per populated
    curve distance delta — shard s sends exactly the groups shard
    (s+delta)%k needs; received buffers concatenate in delta order and
    halo_src indexes into that. Comm per shard = sum_delta E_delta rows
    (boundary-proportional) instead of the all_gather's k*E.

    All_gather mode: gather this shard's export rows, all_gather them,
    index out this shard's halo rows ([k*E] buffer)."""
    if st.deltas:
        k = st.k
        parts = []
        for delta, sidx in zip(st.deltas, loc.send_idx):
            buf = Xflat_g[sidx]  # [Edelta, gL]
            perm = [(s, (s + delta) % k) for s in range(k)]
            parts.append(jax.lax.ppermute(buf, PARTICLE_AXIS, perm))
        # st.deltas non-empty -> one part per delta; never empty here
        return jnp.concatenate(parts, axis=0)[loc.halo_src]
    exp = Xflat_g[loc.export_idx]  # [E, gL]
    allb = jax.lax.all_gather(exp, PARTICLE_AXIS, axis=0)  # [k, E, gL]
    return allb.reshape(-1, Xflat_g.shape[-1])[loc.halo_src]


def _far_window_l(src_g: Array, grp: Array, g: int, L: int) -> Array:
    """src_g [(gps+H), g*L] local+halo group rows -> [nbt, Wt*g, L]."""
    nbt, wt = grp.shape
    return src_g[grp].reshape(nbt, wt * g, L)


def _combine_far_l(outs, perm: Array, out_rows: int, L: int,
                   dtype=jnp.float32) -> Array:
    """Concat bucket outputs + one zero row, permute to block order."""
    parts = list(outs) + [jnp.zeros((1, out_rows, L), dtype)]
    return jnp.concatenate(parts, axis=0)[perm]


def _alive_cols_l(vs: Array, XB: Array, b: int, use_alpha: bool,
                  tdt) -> Array:
    """Per-(row, sample) alive indicator [S, P, B] (ops/bands._alive_cols
    on this shard's rows)."""
    S, Pr = XB.shape[0], XB.shape[1]
    rows = S * Pr
    if not use_alpha:
        return jnp.broadcast_to(
            (vs > 0.0)[..., None], (S, Pr, b)
        ).astype(tdt)
    f = XB.shape[-1] // b
    alpha = _take_lanes(XB.reshape(rows, b * f), jnp.arange(b) * f + 3, b)
    alive = (alpha > ALIVE_THRESHOLD) & (vs.reshape(rows, 1) > 0.0)
    return alive.astype(tdt).reshape(S, Pr, b)


def perceive_band_sharded(
    loc: BandShards,  # this shard's slices (leading k axis squeezed)
    st: BandShardStatic,
    XB: Array,  # [S, P, B*F]
    b: int,
    use_alpha: bool = True,
    out_dtype=None,
    extra: Optional[Array] = None,  # [S, P, Ke]
    split_d: bool = False,  # d-tuple gaB (no lane concat), see
    # ops/bands.perceive_band_batched
):
    """Sharded twin of ops.bands.perceive_band_batched: same math, same
    outputs for this shard's rows; band halo via ppermute, far halo via
    the export all_gather (shared by the md dot, the alive derivation,
    and the fused extra lanes)."""
    d, Pr, g, k = st.d, st.P, st.g, st.k
    S = XB.shape[0]
    tdt = loc.Tband.dtype
    odt = jnp.dtype(out_dtype) if out_dtype else jnp.float32
    Xc = XB.astype(tdt)
    L = XB.shape[-1]
    f = L // b
    ke = 0 if extra is None else extra.shape[-1]
    alpha_idx = jnp.arange(b) * f + 3

    acol = _alive_cols_l(loc.vs, Xc, b, use_alpha, tdt)
    if extra is not None:
        acol = jnp.concatenate([acol, extra.astype(tdt)], axis=-1)

    Wb = _band_window_halo(Xc, k)
    mom = _pair_dot(loc.Tband[:, :, : d * Pr], Wb, odt)
    sm = _pair_dot(loc.Tband[:, :, d * Pr :], _band_window_halo(acol, k))

    if loc.far_tabs:
        Xg = Xc.reshape(-1, g * L)  # [gps, gL] group-packed
        halo = _halo_rows(Xg, loc, st)
        src = jnp.concatenate([Xg, halo], axis=0)
        esrc = None
        if extra is not None:
            Eg = extra.astype(tdt).reshape(-1, g * ke)
            ehalo = _halo_rows(Eg, loc, st)
            esrc = jnp.concatenate([Eg, ehalo], axis=0)

        def alive_of(Xw, vm):
            if use_alpha:
                nw, W = Xw.shape[0], Xw.shape[1]
                al = _take_lanes(Xw.reshape(nw * W, L), alpha_idx, b)
                al = al.reshape(nw, W, b) > ALIVE_THRESHOLD
                return al.astype(tdt) * vm
            return jnp.broadcast_to(vm, Xw.shape[:-1] + (b,)).astype(tdt)

        mouts, souts = [], []
        for t, tab in enumerate(loc.far_tabs):
            grp = loc.far_groups[t]
            Xw = _far_window_l(src, grp, g, L)
            mouts.append(_pair_dot(tab[:, :, : d * Pr], Xw, odt))
            vm = loc.far_vwmask[t][..., None]
            aw = alive_of(Xw, vm)
            if extra is not None:
                aw = jnp.concatenate(
                    [aw, _far_window_l(esrc, grp, g, ke)], axis=-1
                )
            souts.append(_pair_dot(tab[:, :, d * Pr :], aw))
        mom = mom + _combine_far_l(mouts, loc.far_perm, d * Pr, L, odt)
        sm = sm + _combine_far_l(souts, loc.far_perm, Pr, b + ke)

    Xo = XB.astype(odt) if out_dtype else XB
    gsl = loc.gsum.astype(odt)
    comps = [
        (jnp.asarray(st.sig_g, odt) * mom[:, i * Pr : (i + 1) * Pr])
        - Xo * gsl[..., i : i + 1]
        for i in range(d)
    ]
    # split_d: per-axis components as free sublane slices — the lane
    # concat is a relayout the tangent projection undoes (the round-5
    # single-chip win, +8.3% pps; same layout argument sharded)
    gaB = tuple(comps) if split_d else jnp.concatenate(comps, axis=-1)
    sm = jnp.asarray(st.sig_w, sm.dtype) * sm
    if extra is None:
        return gaB, sm
    return gaB, sm[..., :b], sm[..., b:]


def mask_blur_band_sharded(
    loc: BandShards,
    st: BandShardStatic,
    XB: Array,  # [S, P, B*F]
    b: int,
    use_alpha: bool = True,
) -> Array:
    """Sharded life-mask blur (ops.bands.mask_blur_band twin)."""
    d, Pr, g, k = st.d, st.P, st.g, st.k
    tdt = loc.Tband.dtype
    acol = _alive_cols_l(loc.vs, XB.astype(tdt), b, use_alpha, tdt)
    out = _pair_dot(loc.Tband[:, :, d * Pr :], _band_window_halo(acol, k))
    if loc.far_tabs:
        Ag = acol.reshape(-1, g * b)
        halo = _halo_rows(Ag, loc, st)
        src = jnp.concatenate([Ag, halo], axis=0)
        outs = [
            _pair_dot(tab[:, :, d * Pr :],
                      _far_window_l(src, loc.far_groups[t], g, b)
                      * loc.far_vwmask[t][..., None])
            for t, tab in enumerate(loc.far_tabs)
        ]
        out = out + _combine_far_l(outs, loc.far_perm, Pr, b)
    return jnp.asarray(st.sig_w, out.dtype) * out


def _step_sharded(params, cfg, loc: BandShards, st: BandShardStatic,
                  XB: Array, b: int, key: Array, h, fire_rate,
                  mlp_dtype) -> Array:
    """One batched NCA step on this shard's rows (the sharded twin of
    models.cell_step.nca_step_cells_batched: sharded perceive ->
    shared update core -> sharded post mask)."""
    from ..models.cell_step import _update_core
    from ..ops.batched import expand_lanes

    S, Pr = XB.shape[0], XB.shape[1]
    f = XB.shape[-1] // b
    rows = S * Pr
    gaB, pre_sm = perceive_band_sharded(
        loc, st, XB, b, cfg.use_alpha, out_dtype=mlp_dtype
    )
    prev_mask = pre_sm > ALIVE_THRESHOLD
    nS = _update_core(
        params, cfg, XB.reshape(rows, b * f), gaB.reshape(rows, -1),
        b, f, key, h, fire_rate, mlp_dtype,
    )
    nXB = nS.reshape(S, Pr, b * f)
    new_sm = mask_blur_band_sharded(
        loc, st, jax.lax.stop_gradient(nXB), b, cfg.use_alpha
    )
    new_mask = new_sm > ALIVE_THRESHOLD
    living = expand_lanes(
        (prev_mask & new_mask).reshape(rows, b).astype(nS.dtype), f
    )
    return (nS * living).reshape(S, Pr, b * f)


def rollout_band_sharded(
    params,
    cfg,
    shards: BandShards,
    static: BandShardStatic,
    mesh: Mesh,
    SB0: Array,  # [nb, P, B*F] global rank layout (batched_scatter)
    b: int,
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    mlp_dtype: Optional[str] = None,
    remat: bool = True,
) -> Array:
    """Halo-sharded scan rollout over the particle mesh axis. Per-step
    comm: 2 ppermutes of one block + 2 export all_gathers (state +
    alive), see comm_bytes_per_pass. The fire-mask RNG folds the shard
    index into the step key (an independent stream per shard — the same
    Bernoulli(fire_rate) law as the global path; trajectories match
    exactly at fire_rate=1, distributionally otherwise, as with the
    cell layout's per-slot stream, models/cell_step.py)."""
    if fire_rate is None:
        fire_rate = cfg.fire_rate
    k = static.k
    S = shards.blocks_per_shard
    Pr = static.P
    L = SB0.shape[-1]
    X0 = SB0.reshape(k, S, Pr, L)
    keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
        jnp.arange(n_steps)
    )

    shard_specs = jax.tree.map(lambda _: P(PARTICLE_AXIS), shards)

    def body_fn(loc: BandShards, X0s: Array, keys_r: Array) -> Array:
        loc = jax.tree.map(lambda a: a[0], loc)  # squeeze shard dim
        X = X0s[0]
        idx = jax.lax.axis_index(PARTICLE_AXIS)

        def step(Xc, kstep):
            ks = jax.random.fold_in(kstep, idx)
            nX = _step_sharded(
                params, cfg, loc, static, Xc, b, ks, h, fire_rate,
                mlp_dtype,
            )
            return nX, None

        if remat:
            step = jax.checkpoint(step, prevent_cse=False)
        Xf, _ = jax.lax.scan(step, X, keys_r)
        return Xf[None]

    out = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(shard_specs, P(PARTICLE_AXIS), P()),
        out_specs=P(PARTICLE_AXIS),
        check_vma=False,
    )(shards, X0, keys)
    return out.reshape(k * S, Pr, L)


def rollout_mesh_band_sharded(
    params,
    cfg,
    shards: BandShards,
    static: BandShardStatic,
    mesh: Mesh,
    SB0: Array,  # [nb, P, B*F] global rank layout (batched_scatter)
    nc: Array,  # [nb, P, 3] shared normals in rank layout (eng.scatter)
    tB0: Array,  # [nb*P, B, 3] per-sample tangents in rank layout
    b: int,
    key: Array,
    n_steps: int,
    h,
    *,
    fire_rate: Optional[float] = None,
    lerp_multiplier: float = 1.0,
    w_multiplier: float = 1.0,
    mlp_dtype: Optional[str] = None,
):
    """Halo-sharded SURFACE rollout — the flagship bench configuration
    (tangent-projected perception + fused tangent diffusion,
    models/surface.rollout_mesh_batched) over the particle mesh axis.
    The tangent machinery is per-row (no comm); the diffusion blur rides
    the perception pass's extra lanes through the same halo exchange.
    Returns (final_S [nb, P, B*F], final_td 3x [nb*P, B]) in rank
    layout — the caller runs the final T_K = diffuse(A_K, T_{K-1}) on
    the global engine and gathers back (one standalone blur outside the
    scan, as in rollout_mesh_batched)."""
    from ..models.cell_step import _update_core
    from ..models.surface import (
        _diffuse_combine,
        _diffuse_mt,
        _diffuse_weights,
        _project_td,
        normal_components,
    )
    from ..ops.batched import expand_lanes

    if fire_rate is None:
        fire_rate = cfg.fire_rate
    k = static.k
    S = shards.blocks_per_shard
    Pr = static.P
    L = SB0.shape[-1]
    f = L // b
    rows_s = S * Pr
    pdt = jnp.bfloat16 if mlp_dtype == "bfloat16" else SB0.dtype
    X0 = SB0.reshape(k, S, Pr, L)
    nd_g = tuple(
        x.astype(pdt).reshape(k, rows_s, 1)
        for x in normal_components(nc)
    )
    td_g = tuple(
        tB0[..., i].reshape(k, rows_s, b) for i in range(3)
    )
    keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
        jnp.arange(n_steps)
    )
    first = (jnp.arange(n_steps) == 0)

    shard_specs = jax.tree.map(lambda _: P(PARTICLE_AXIS), shards)

    def body_fn(loc, X0s, nd0, td0, keys_r, first_r):
        loc = jax.tree.map(lambda a: a[0], loc)
        X = X0s[0]
        nd = tuple(x[0] for x in nd0)
        td0 = tuple(t[0] for t in td0)
        idx = jax.lax.axis_index(PARTICLE_AXIS)

        def step(carry, xs):
            Xc, td = carry
            kstep, is_first = xs
            ks = jax.random.fold_in(kstep, idx)
            w = jax.lax.stop_gradient(
                _diffuse_weights(Xc, b)
            )
            mt = _diffuse_mt(
                w, tuple(jax.lax.stop_gradient(t) for t in td), b,
                w_multiplier,
            )
            gaB, pre_sm, mt2 = perceive_band_sharded(
                loc, static, Xc, b, cfg.use_alpha, out_dtype=mlp_dtype,
                extra=mt.reshape(S, Pr, 4 * b), split_d=True,
            )
            dtd = _diffuse_combine(
                mt2.reshape(rows_s, 4 * b), w, td, nd, b, lerp_multiplier
            )
            ntd = tuple(
                jnp.where(is_first, t, dt) for t, dt in zip(td, dtd)
            )
            gaB = _project_td(gaB, nd, ntd, b, include_normal=False)
            prev_mask = pre_sm > ALIVE_THRESHOLD
            nS = _update_core(
                params, cfg, Xc.reshape(rows_s, b * f),
                gaB.reshape(rows_s, -1), b, f, ks, h, fire_rate, mlp_dtype,
            )
            nXB = nS.reshape(S, Pr, b * f)
            new_sm = mask_blur_band_sharded(
                loc, static, jax.lax.stop_gradient(nXB), b, cfg.use_alpha
            )
            living = expand_lanes(
                (prev_mask & (new_sm > ALIVE_THRESHOLD)).reshape(
                    rows_s, b
                ).astype(nS.dtype), f,
            )
            return ((nS * living).reshape(S, Pr, b * f), ntd), None

        (Xf, tdf), _ = jax.lax.scan(step, (X, td0), (keys_r, first_r))
        return Xf[None], tuple(t[None] for t in tdf)

    out, td_out = jax.shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(shard_specs, P(PARTICLE_AXIS), (P(PARTICLE_AXIS),) * 3,
                  (P(PARTICLE_AXIS),) * 3, P(), P()),
        out_specs=(P(PARTICLE_AXIS), (P(PARTICLE_AXIS),) * 3),
        check_vma=False,
    )(shards, X0, nd_g, td_g, keys, first)
    final_S = out.reshape(k * S, Pr, L)
    final_td = tuple(t.reshape(k * rows_s, b) for t in td_out)
    return final_S, final_td
