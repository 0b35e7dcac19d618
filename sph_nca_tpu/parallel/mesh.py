"""Device mesh construction and sharding specs.

The reference is single-GPU (SURVEY.md §2e: no torch.distributed anywhere);
this layer is new capability, designed TPU-first:

  * axis "data"     — pool-batch data parallelism (B independent rollouts;
                      gradients all-reduced by XLA across the axis)
  * axis "particle" — particle-axis sharding, this domain's sequence
                      parallelism: the Morton/cell-sorted particle buffer is
                      split across devices; SPH gathers have compact support
                      h, so cross-shard reads are a halo of width h that
                      XLA lowers to collectives over ICI.

All communication is XLA collectives inserted by GSPMD from sharding
annotations — there is no hand-written comm library (the scaling-book
recipe: pick a mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PARTICLE_AXIS = "particle"


def factorize(n: int, prefer_data: int = 0) -> Tuple[int, int]:
    """Split n devices into (data, particle) — as square as possible,
    biased toward the data axis (pure DP has no halo traffic)."""
    if prefer_data:
        assert n % prefer_data == 0
        return prefer_data, n // prefer_data
    d = int(np.sqrt(n))
    while n % d:
        d -= 1
    return max(d, 1), n // max(d, 1)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    particle: Optional[int] = None,
) -> Mesh:
    """Build a (data, particle) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and particle is None:
        data, particle = factorize(n)
    elif data is None:
        data = n // particle
    elif particle is None:
        particle = n // data
    if data * particle != n:
        raise ValueError(f"{data} x {particle} != {n} devices")
    arr = np.asarray(devices).reshape(data, particle)
    return Mesh(arr, (DATA_AXIS, PARTICLE_AXIS))


# -- sharding specs ---------------------------------------------------------


def batch_state_spec() -> P:
    """[B, N, C] pool states: batch over data, particles over particle."""
    return P(DATA_AXIS, PARTICLE_AXIS)


def graph_spec() -> P:
    """[N, ...] per-particle graph arrays: particles over particle axis,
    replicated across data."""
    return P(PARTICLE_AXIS)


def replicated_spec() -> P:
    return P()


def shard_graph(graph, mesh: Mesh):
    """Place an SPHGraph with its leading (particle) axis sharded."""
    s = NamedSharding(mesh, graph_spec())
    return jax.tree.map(lambda a: jax.device_put(a, s), graph)


def shard_batch(A, mesh: Mesh):
    """Place a [B, N, C] batch sharded over (data, particle)."""
    return jax.device_put(A, NamedSharding(mesh, batch_state_spec()))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, replicated_spec())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_cell_engine(eng, mesh: Mesh, batch_scatter=None):
    """Place a CellEngine with cells/blocks sharded over the particle axis.

    Build the engine with ``build_cell_engine(..., n_shards=
    mesh.shape['particle'])`` — that pads the cell dim AND lays the block
    buckets out shard-major with equal per-shard counts, so every
    per-cell / per-block array shards evenly on dim 0 (required by the
    shard_map fast path, parallel/cell_shard.py; the XLA path's
    cross-shard window reads lower to GSPMD gathers + collectives).
    """
    s = NamedSharding(mesh, P(PARTICLE_AXIS))
    axis = mesh.shape[PARTICLE_AXIS]
    sharded = {}
    for n in (
        "xs", "vs", "win_cells", "xw", "vw", "Tw", "Tg", "gsum",
        "blk_xs", "blk_win_cells", "blk_xw", "blk_vw",
        "blk2_xs", "blk2_win_cells", "blk2_xw", "blk2_vw",
        "blk_md", "blk_w6", "blk2_md", "blk2_w6",
    ):
        a = getattr(eng, n)
        if a is None:
            continue
        if a.shape[0] % axis:
            raise ValueError(
                f"CellEngine.{n} (dim0={a.shape[0]}) does not divide the "
                f"{axis}-way particle axis; build the engine with "
                f"n_shards={axis}"
            )
        sharded[n] = jax.device_put(a, s)
    return eng._replace(**sharded)
