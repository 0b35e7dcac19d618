"""Multi-chip execution of the fused Pallas pair kernels (shard_map).

pallas_call is opaque to GSPMD, so the fast path is sharded explicitly:
the cell state S [C, M, F] and every per-cell / per-block engine array
shard over the "particle" mesh axis (dim 0), and each device runs the
bucket kernels on its own blocks. Window reads cross shard boundaries,
so each pass all_gathers the (small) operand it windows over ICI:

    perception fwd : all_gather(S)        C*M*F floats   (~6 MB @ N=1e5)
    perception bwd : all_gather(gbar)     C*M*F*D floats
    life-mask blur : all_gather(alive)    C*M   floats

The engine must be built with ``build_cell_engine(..., n_shards=k)`` so
bucket rows are shard-major with equal per-shard counts (ops/cells.py);
each shard's local cell order is then [bucket-1 blocks | bucket-2
blocks] and the kernels read contiguous local rows.

The all_gather is the simplest correct exchange and is cheap relative to
the pair pass at the 1e5–1e6 scale (the pass moves W*M*F window floats
per block — ~30x the state size). The Morton-contiguous shard ranges
are already the layout a true boundary-halo exchange needs; swapping the
all_gather for ppermute halos is a contained optimization inside `_fwd`
/`_bwd` below.

The reference has no multi-device story at all (SURVEY.md §2e); this
module plus parallel/mesh.py is the new capability.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.cells import CellEngine
from ..ops.pallas.pair_kernel import (
    bwd_bucket,
    fwd_bucket,
    mask_bucket,
    scal_vec,
    window_from_flat,
)
from .mesh import PARTICLE_AXIS

Array = jnp.ndarray


def _blk_args(eng: CellEngine):
    args = (
        eng.blk_xs, eng.blk_win_cells, eng.blk_xw, eng.blk_vw,
        eng.blk2_xs, eng.blk2_win_cells, eng.blk2_xw, eng.blk2_vw,
    )
    if eng.blk_md is not None:
        args += (eng.blk_md, eng.blk_w6, eng.blk2_md, eng.blk2_w6)
    return args


def _blk_specs(eng: CellEngine):
    n = 8 if eng.blk_md is None else 12
    return (P(PARTICLE_AXIS),) * n


def _unpack_blk(blk):
    """(bucket-1 tuple, bucket-2 tuple): (xs, win, xw, vw, md, w6) each,
    with md/w6 None when the engine carries no pair tables."""
    if len(blk) == 8:
        blk = blk + (None,) * 4
    (bxs1, bwin1, bxw1, bvw1, bxs2, bwin2, bxw2, bvw2,
     mag1, w61, mag2, w62) = blk
    return ((bxs1, bwin1, bxw1, bvw1, mag1, w61),
            (bxs2, bwin2, bxw2, bvw2, mag2, w62))


@functools.partial(jax.jit, static_argnames=("mesh", "use_alpha"))
def _fwd(mesh: Mesh, eng: CellEngine, S: Array, use_alpha: bool):
    c, m, f = S.shape
    ddim = eng.xs.shape[-1]
    p = eng.blk_xs.shape[2]
    scal = scal_vec(eng)

    def body(scal, S_loc, gsum_loc, *blk):
        (bxs1, bwin1, bxw1, bvw1, md1, w61), \
            (bxs2, bwin2, bxw2, bvw2, md2, w62) = _unpack_blk(blk)
        S_full = jax.lax.all_gather(S_loc, PARTICLE_AXIS, axis=0, tiled=True)
        flat = S_full.reshape(c, m * f)
        ab = S_loc.reshape(-1, p, f)
        gs = gsum_loc.reshape(-1, p, ddim)
        nb1_loc = bxs1.shape[0]

        Sw1 = window_from_flat(flat, bwin1, m)
        ga1, sm1 = fwd_bucket(scal, bxs1, ab[:nb1_loc], bxw1, bvw1, Sw1,
                              use_alpha=use_alpha, md=md1, w6=w61,
                              gsum=gs[:nb1_loc] if md1 is not None else None)
        if bxs2.shape[0]:
            Sw2 = window_from_flat(flat, bwin2, m)
            ga2, sm2 = fwd_bucket(scal, bxs2, ab[nb1_loc:], bxw2, bvw2,
                                  Sw2, use_alpha=use_alpha, md=md2,
                                  w6=w62,
                                  gsum=(gs[nb1_loc:] if md2 is not None
                                        else None))
            ga = jnp.concatenate([ga1, ga2], axis=0)
            sm = jnp.concatenate([sm1, sm2], axis=0)
        else:
            ga, sm = ga1, sm1
        c_loc = S_loc.shape[0]
        return ga.reshape(c_loc, m, ddim * f), sm.reshape(c_loc, m)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma metadata
        in_specs=(P(), P(PARTICLE_AXIS), P(PARTICLE_AXIS)) + _blk_specs(eng),
        out_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS)),
    )
    return fn(scal, S, eng.gsum, *_blk_args(eng))


@functools.partial(jax.jit, static_argnames=("mesh",))
def _bwd(mesh: Mesh, eng: CellEngine, gflat: Array) -> Array:
    c, m, fd = gflat.shape
    ddim = eng.xs.shape[-1]
    f = fd // ddim
    p = eng.blk_xs.shape[2]
    scal = scal_vec(eng)

    def body(scal, g_loc, vs_loc, gsum_loc, *blk):
        (bxs1, bwin1, bxw1, bvw1, mag1, _w61), \
            (bxs2, bwin2, bxw2, bvw2, mag2, _w62) = _unpack_blk(blk)
        g_full = jax.lax.all_gather(g_loc, PARTICLE_AXIS, axis=0, tiled=True)
        flatg = g_full.reshape(c, m * fd)
        gb = g_loc.reshape(-1, p, fd)
        vs = vs_loc.reshape(-1, 1, p)
        gs = gsum_loc.reshape(-1, p, ddim)
        nb1_loc = bxs1.shape[0]

        gw1 = window_from_flat(flatg, bwin1, m)
        da1 = bwd_bucket(scal, bxs1, vs[:nb1_loc], gs[:nb1_loc],
                         gb[:nb1_loc], bxw1, gw1, md=mag1)
        if bxs2.shape[0]:
            gw2 = window_from_flat(flatg, bwin2, m)
            da2 = bwd_bucket(scal, bxs2, vs[nb1_loc:], gs[nb1_loc:],
                             gb[nb1_loc:], bxw2, gw2, md=mag2)
            da = jnp.concatenate([da1, da2], axis=0)
        else:
            da = da1
        return da.reshape(g_loc.shape[0], m, f)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma metadata
        in_specs=(P(), P(PARTICLE_AXIS), P(PARTICLE_AXIS),
                  P(PARTICLE_AXIS)) + _blk_specs(eng),
        out_specs=P(PARTICLE_AXIS),
    )
    return fn(scal, gflat, eng.vs, eng.gsum, *_blk_args(eng))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def perceive_cells_dmajor_sharded(
    mesh: Mesh, eng: CellEngine, S: Array, use_alpha: bool = True
) -> Tuple[Array, Array]:
    """Sharded fused perception, d-major output [C, M, D*F] + smoothed
    alive [C, M]. Differentiable w.r.t. S (the adjoint is the sharded
    backward pair pass); the mask output is stop-gradient (nca.py:76)."""
    ga, sm = _fwd(mesh, eng, S, use_alpha)
    return ga, jax.lax.stop_gradient(sm)


def _perceive_sh_fwd(mesh, eng, S, use_alpha):
    ga, sm = _fwd(mesh, eng, S, use_alpha)
    return (ga, jax.lax.stop_gradient(sm)), eng


def _perceive_sh_bwd(mesh, use_alpha, eng, cots):
    gbar, _ = cots
    return (None, _bwd(mesh, eng, gbar))


perceive_cells_dmajor_sharded.defvjp(_perceive_sh_fwd, _perceive_sh_bwd)


@functools.partial(jax.jit, static_argnames=("mesh", "use_alpha"))
def mask_blur_sharded(
    mesh: Mesh, eng: CellEngine, S: Array, *, use_alpha: bool = True
) -> Array:
    """Sharded life-mask smoothing: S [C, M, F] -> sm [C, M]."""
    c, m, f = S.shape
    scal = scal_vec(eng)

    def body(scal, S_loc, *blk):
        (bxs1, bwin1, bxw1, bvw1, _mag1, w61), \
            (bxs2, bwin2, bxw2, bvw2, _mag2, w62) = _unpack_blk(blk)
        if use_alpha:
            act_loc = (S_loc[..., 3] > 0.1).astype(jnp.float32)
            act_full = jax.lax.all_gather(
                act_loc, PARTICLE_AXIS, axis=0, tiled=True
            )
            flat = act_full.reshape(c, m)

        def bucket(bxs, bwin, bxw, bvw, w6):
            if use_alpha:
                aw = window_from_flat(flat, bwin, m)[..., 0]
            else:
                aw = (bvw > 0.0).astype(jnp.float32)
            return mask_bucket(scal, bxs, bxw, bvw, aw, w6=w6)

        sm1 = bucket(bxs1, bwin1, bxw1, bvw1, w61)
        if bxs2.shape[0]:
            sm2 = bucket(bxs2, bwin2, bxw2, bvw2, w62)
            sm = jnp.concatenate([sm1, sm2], axis=0)
        else:
            sm = sm1
        return sm.reshape(S_loc.shape[0], m)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma metadata
        in_specs=(P(), P(PARTICLE_AXIS)) + _blk_specs(eng),
        out_specs=P(PARTICLE_AXIS),
    )
    return fn(scal, S, *_blk_args(eng))
