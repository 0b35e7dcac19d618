"""Sharded training step: DP over the pool batch x particle-axis sharding.

One jitted function contains the full training step — K-step rollout
(BPTT), loss, gradients, optimizer update — with GSPMD shardings:

  params / opt_state   replicated        (21k-param MLP)
  A0 batch [B, N, C]   P('data', 'particle')
  SPHGraph [N, ...]    P('particle')     (replicated over data)

Gradients are all-reduced across the mesh automatically (the loss is a
scalar; GSPMD inserts the psum). Neighbor gathers that cross particle
shards lower to ICI collectives; because particles are cell-sorted, the
index locality keeps the halo small.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.nca import MLPParams, SPHNCAConfig
from ..models.rollout import rollout_batch
from ..ops.hashgrid import SPHGraph
from .mesh import batch_state_spec, graph_spec, replicated_spec

Array = jnp.ndarray


class ShardedTrainStep(NamedTuple):
    """fn(params, opt_state, graph, A0, key, n_steps, collect_steps)
    -> (params, opt_state, loss, final)."""

    fn: Callable
    mesh: Mesh


def make_sharded_train_step(
    model_cfg: SPHNCAConfig,
    optimizer: optax.GradientTransformation,
    batch_total_loss: Callable[[Array, Array], Array],  # (A_batch, key)->scalar
    h: float,
    mesh: Mesh,
    max_steps: int,
    *,
    aux_states: int = 4,
    aux_weight: float = 0.1,
) -> ShardedTrainStep:
    """Build the jitted sharded step.

    ``batch_total_loss(A_batch, key)`` must close over positions/target
    (replicated constants) and reduce over the whole batch with the
    packed-batch semantics of trainer.make_mse_bundle.
    """
    rep = NamedSharding(mesh, replicated_spec())
    gspec = NamedSharding(mesh, graph_spec())
    bspec = NamedSharding(mesh, batch_state_spec())

    def step(params, opt_state, graph: SPHGraph, A0, key, n_steps,
             collect_steps):
        kroll, kloss = jax.random.split(key)

        def loss_fn(params):
            out = rollout_batch(
                params, model_cfg, graph, A0, kroll, max_steps, h,
                n_steps=n_steps, collect_steps=collect_steps,
            )
            total = batch_total_loss(out.final, kloss)
            for s in range(aux_states):
                total = total + aux_weight * batch_total_loss(
                    out.collected[:, s], jax.random.fold_in(kloss, s)
                )
            return total, out.final

        (loss, final), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, final

    graph_shardings = SPHGraph(
        idx=gspec, valid=gspec, v=gspec, wv=gspec, gv=gspec, gv_sum=gspec
    )
    fn = jax.jit(
        step,
        in_shardings=(rep, rep, graph_shardings, bspec, rep, rep, rep),
        out_shardings=(rep, rep, rep, bspec),
    )
    return ShardedTrainStep(fn=fn, mesh=mesh)


# ---------------------------------------------------------------------------
# Multi-device dry run (used by __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------


def dryrun_train_step(mesh: Mesh, *, n_side: int = 16, h: float = 0.25,
                      batch: int = 0, steps: int = 4) -> float:
    """Compile + execute ONE sharded training step on tiny shapes.

    batch defaults to the mesh's data-axis size (one sample per DP rank).
    Returns the (finite) loss value.
    """
    import numpy as np

    from .. import ops
    from ..models.nca import init_params
    from ..training.losses import MSELossConfig
    from ..training.trainer import make_mse_bundle, make_optimizer
    from ..utils.geometry import grange
    from ..utils.seeds import plane_seed
    from .mesh import replicate, shard_batch, shard_graph

    if batch == 0:
        batch = mesh.shape["data"] * 2

    x = grange(
        (n_side, n_side), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])
    ).reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    # pad K to a multiple of the particle axis for even sharding
    graph = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)

    model_cfg = SPHNCAConfig(channels=8, hidden=32,
                             normalize_perception=1.0 / h)
    img = jnp.asarray(
        np.tile(np.asarray([1.0, 0.5, 0.0, 1.0], np.float32), (8, 8, 1))
    )
    loss_cfg = MSELossConfig(gmin=(-1, -1), gsize=(2, 2), image_scale=1.0)
    bundle = make_mse_bundle(img, loss_cfg)
    optimizer = make_optimizer(3e-3)

    step = make_sharded_train_step(
        model_cfg, optimizer,
        lambda A_batch, key: bundle.batch_total(x, A_batch, key),
        h, mesh, max_steps=steps,
    )

    params = init_params(jax.random.key(0), model_cfg)
    opt_state = optimizer.init(params)
    A_seed = plane_seed(x, model_cfg.channels, gmin=(-1, -1), gsize=(2, 2),
                        radius=h)
    A0 = jnp.broadcast_to(A_seed, (batch,) + A_seed.shape)

    with mesh:
        graph = shard_graph(graph, mesh)
        A0 = shard_batch(A0, mesh)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        params, opt_state, loss, final = step.fn(
            params, opt_state, graph, A0, jax.random.key(1),
            jnp.int32(steps),
            jnp.asarray([0, 1, steps - 1, steps], jnp.int32),
        )
        loss = float(loss)
    assert jnp.isfinite(loss), f"dryrun loss not finite: {loss}"
    return loss
