"""Fused per-sample update-MLP Pallas kernel — the anti-redundancy shot
at the MLP wall (VERDICT r4 item 2 / RESULTS roofline accounting).

The lane-batched step packs B=8 rollouts into the lane dim, so the
reference's per-cell 48->256->33 MLP (nca.py:87-117) runs as
block-diagonal GEMMs with 8x redundant FLOPs (models/cell_step.py
`_blockdiag_mlp_weights`): profiled 1.82 ms/step of the 7.2 ms step at
bench scale. Two prior falsifications shaped this design:

  * XLA sample-major reshape ("sublane" impl): loses to HBM relayouts
    (64.3M pps, RESULTS r4).
  * In-kernel restack via VMEM scratch stores: 24 lane-rotated
    [TM, 16] stores/tile cost more than the 8x FLOP saving (measured
    1.19x isolated — same class as the r4 VMEM-fusion attempt).

This version does the sample de-interleave in the BLOCKSPEC instead:
the grid is (row_tiles, B) and every program's input blocks are 16-lane
strided slices (sample s's channels / gA_x / gA_y), fetched by the DMA
engines and double-buffered by the Pallas pipeline — the kernel body is
just two dense dots on offset-0 operands:

    X = [S_s | gAx_s | gAy_s]          [TM, 3F]
    H = relu(X @ W1 + b1)              [TM, hid]   shared 1x weights
    gate|delta|mult = H @ W2 + b2      [TM, C|C|1] three outputs

The outputs land as the THREE arrays the gated update rule consumes
(gate lanes, delta lanes, mult column) — no [rows, B*(2C+1)] packing
and no unstack.

Differentiation: `mlp_fused` carries a custom_vjp whose backward runs
jax.vjp over the algebraically identical jnp reference (`_mlp_ref`) —
exact math, XLA-optimized backward; the kernel only accelerates the
forward/rollout hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from .pair_kernel import _interpret


def _mlp_kernel(s_ref, gx_ref, gy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                gate_ref, delta_ref, mult_ref, *, f: int):
    X = jnp.concatenate([s_ref[:], gx_ref[:], gy_ref[:]], axis=1)
    H = (
        jnp.dot(X, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    H = jnp.maximum(H, 0.0).astype(s_ref.dtype)
    O = (
        jnp.dot(H, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )  # [TM, K] f32
    k = O.shape[-1]
    if k == 2 * f + 1:  # gated: gate C | delta C | mult 1 per sample
        gate_ref[:] = O[:, :f]
        delta_ref[:] = O[:, f : 2 * f]
        mult_ref[:] = O[:, 2 * f :]
    else:  # orig: dA C per sample (delta/mult outputs unused)
        gate_ref[:] = O


def _mlp_ref(S2, ga2, w1k, b1, w2, b2, b: int, f: int):
    """jnp reference of the kernel (same math, per-sample weights):
    used for the custom_vjp backward and as the CPU/oracle path.
    Returns (gate_pre [rows, B*F], delta_pre [rows, B*F],
    mult_pre [rows, B]) pre-activation, or (dA, None, None) for orig."""
    rows = S2.shape[0]
    bf = b * f
    X = jnp.concatenate(
        [
            S2.reshape(rows, b, f),
            ga2[:, :bf].reshape(rows, b, f),
            ga2[:, bf:].reshape(rows, b, f),
        ],
        axis=-1,
    )  # [rows, b, 3F]
    H = jnp.einsum("rbk,kh->rbh", X, w1k,
                   preferred_element_type=jnp.float32) + b1
    H = jnp.maximum(H, 0.0).astype(S2.dtype)
    O = jnp.einsum("rbh,ho->rbo", H, w2,
                   preferred_element_type=jnp.float32) + b2  # [rows,b,K]
    k = O.shape[-1]
    if k == 2 * f + 1:
        return (
            O[..., :f].reshape(rows, bf),
            O[..., f : 2 * f].reshape(rows, bf),
            O[..., 2 * f].reshape(rows, b),
        )
    return O.reshape(rows, bf), None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def mlp_fused(S2, ga2, w1k, b1, w2, b2, b: int, f: int,
              tile_rows: int = 1024):
    """Per-sample update MLP without lane-batch FLOP redundancy.

    S2 [rows, B*F] and ga2 [rows, 2*B*F] in the MLP dtype; w1k [3F, hid]
    per-sample layer-1 weights with the perception scale pre-folded into
    the gA parts; w2 [hid, 2C+1] (gated) or [hid, C] (orig); b1/b2 f32
    row vectors [1, hid] / [1, K]. Returns PRE-activation
    (gate [rows, B*F], delta [rows, B*F], mult [rows, B]) for gated, or
    (dA [rows, B*F], zeros, zeros) for orig. rows must be a multiple of
    tile_rows."""
    return _mlp_fused_fwd_impl(S2, ga2, w1k, b1, w2, b2, b, f, tile_rows)


def _mlp_fused_fwd_impl(S2, ga2, w1k, b1, w2, b2, b, f, tile_rows):
    rows = S2.shape[0]
    tm = tile_rows
    if rows % tm:
        raise ValueError(f"rows {rows} not a multiple of tile_rows {tm}")
    bf = b * f
    gated = w2.shape[-1] == 2 * f + 1
    grid = (rows // tm, b)
    gate, delta, mult = pl.pallas_call(
        functools.partial(_mlp_kernel, f=f),
        out_shape=(
            jax.ShapeDtypeStruct((rows, bf), jnp.float32),
            jax.ShapeDtypeStruct((rows, bf), jnp.float32),
            jax.ShapeDtypeStruct((rows, b), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            # sample s's 16-lane blocks — strided DMA does the restack
            pl.BlockSpec((tm, f), lambda i, s: (i, s)),
            pl.BlockSpec((tm, f), lambda i, s: (i, s)),          # gA_x
            pl.BlockSpec((tm, f), lambda i, s: (i, s + b)),      # gA_y
            pl.BlockSpec(w1k.shape, lambda i, s: (0, 0)),
            pl.BlockSpec(b1.shape, lambda i, s: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i, s: (0, 0)),
            pl.BlockSpec(b2.shape, lambda i, s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tm, f), lambda i, s: (i, s)),
            pl.BlockSpec((tm, f), lambda i, s: (i, s)),
            pl.BlockSpec((tm, 1), lambda i, s: (i, s)),
        ),
        interpret=_interpret(),
    )(S2, ga2, ga2, w1k, b1, w2, b2)
    if not gated:
        return gate, delta, mult  # delta/mult are untouched padding
    return gate, delta, mult


def _mlp_fused_fwd(S2, ga2, w1k, b1, w2, b2, b, f, tile_rows):
    out = _mlp_fused_fwd_impl(S2, ga2, w1k, b1, w2, b2, b, f, tile_rows)
    return out, (S2, ga2, w1k, b1, w2, b2)


def _mlp_fused_bwd(b, f, tile_rows, res, douts):
    S2, ga2, w1k, b1, w2, b2 = res
    gated = w2.shape[-1] == 2 * f + 1

    def ref(*a):
        g, d, m = _mlp_ref(*a, b=b, f=f)
        return (g, d, m) if gated else (g,)

    _, vjp = jax.vjp(ref, S2, ga2, w1k, b1, w2, b2)
    return vjp(tuple(douts)[: 3 if gated else 1])


mlp_fused.defvjp(_mlp_fused_fwd, _mlp_fused_bwd)
