"""Training system: jitted train step + pool orchestration.

Re-design of the reference training loop (train.py:295-318 +
nca.sample_plane:124-164):

  * the entire rollout + loss + backward + optimizer update is ONE jitted
    function (the reference pays a host sync per CUDA op launch);
  * the neighbor graph is built once per geometry and closed over;
  * rollout length is a *traced* argument, bucketed to multiples of
    ``STEP_BUCKET`` so the progressive-growing schedule (train.py:297-300)
    and the random 32..48-step draws compile O(6) programs, not O(48);
  * the 4 random auxiliary-loss states (nca.py:149-150) are chosen up front
    and collected inside the scan.

Optimizer = optax Adam + the reference's LinearLR (1.0 -> 0.1 over 2000
iters, train.py:285) + optional per-parameter gradient normalization
g / (|g| + 1e-8) applied before Adam (nca.py:119-122).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.nca import MLPParams, SPHNCAConfig
from ..models.rollout import rollout_batch
from ..ops.hashgrid import SPHGraph
from .pool import Pool

Array = jnp.ndarray

STEP_BUCKET = 8  # rollout-length quantization for jit caching


class LossBundle(NamedTuple):
    """Loss functions for one training mode.

    per_sample(x, A, key) -> scalar      (pool ranking + reporting)
    batch_total(x, A_batch, key) -> scalar  (the trained objective;
        reductions over the batch must match the reference's packed-batch
        semantics — see make_mse_bundle)
    """

    per_sample: Callable[[Array, Array, Array], Array]
    batch_total: Callable[[Array, Array, Array], Array]


def make_mse_bundle(img: Array, mse_cfg) -> LossBundle:
    """Image-mode losses (reference losses.py:17-42).

    The reference evaluates the loss over the *packed* batch [B*N, ...]:
    MSE therefore averages over B*N*4 while the overflow term is a sum over
    everything. Equivalent batched form: mean_B(mse_b) + w * sum_B(of_b).
    """
    from .losses import mse_loss, overflow_penalty, rgba_with_margin
    from ..utils.geometry import bilinear_sample

    def per_sample(x, A, key=None):
        return mse_loss(x, A, img, mse_cfg)

    def batch_total(x, A_batch, key=None):
        img_gmin = jnp.asarray(mse_cfg.gmin, jnp.float32) * mse_cfg.image_scale
        img_gsize = jnp.asarray(mse_cfg.gsize, jnp.float32) * mse_cfg.image_scale
        img_x = bilinear_sample(x, img, img_gmin, img_gsize)  # [N, 4]

        def one(A):
            rgba = rgba_with_margin(A, mse_cfg.use_alpha, margin=None)
            return jnp.mean((rgba - img_x) ** 2), overflow_penalty(A)

        mse_b, of_b = jax.vmap(one)(A_batch)
        return jnp.mean(mse_b) + mse_cfg.overflow_weight * jnp.sum(of_b)

    return LossBundle(per_sample=per_sample, batch_total=batch_total)


def make_ot_bundle(target_img: Array, feature_fn, ot_cfg) -> LossBundle:
    """Exemplar-mode losses (reference losses.py:44-70)."""
    from .losses import ot_loss

    target_rgb = target_img[..., :3]
    target_feats = [jax.lax.stop_gradient(f) for f in feature_fn(target_rgb)]

    def per_sample(x, A, key):
        return ot_loss(x, A, target_feats, target_rgb, feature_fn, key, ot_cfg)

    def batch_total(x, A_batch, key):
        keys = jax.random.split(key, A_batch.shape[0])
        losses = jax.vmap(lambda A, k: per_sample(x, A, k))(A_batch, keys)
        return jnp.mean(losses)

    return LossBundle(per_sample=per_sample, batch_total=batch_total)


def make_clip_bundle(text_features: Array, encode_image, clip_cfg) -> LossBundle:
    """Text-mode losses (reference losses.py:72-102)."""
    from .losses import clip_loss

    def per_sample(x, A, key):
        return clip_loss(x, A, text_features, encode_image, key, clip_cfg)

    def batch_total(x, A_batch, key):
        keys = jax.random.split(key, A_batch.shape[0])
        losses = jax.vmap(lambda A, k: per_sample(x, A, k))(A_batch, keys)
        return jnp.mean(losses)

    return LossBundle(per_sample=per_sample, batch_total=batch_total)


# ---------------------------------------------------------------------------
# Optimizer (reference train.py:283-285, nca.py:119-122)
# ---------------------------------------------------------------------------


def normalize_grads() -> optax.GradientTransformation:
    """Per-parameter g / (|g| + 1e-8) (reference normalize_grads)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree.map(
            lambda g: g / (jnp.linalg.norm(g) + 1e-8), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lion": optax.lion,
    "lamb": optax.lamb,
}


def make_optimizer(
    lr: float = 3e-3,
    *,
    end_factor: float = 0.1,
    decay_steps: int = 2000,
    grad_norm: bool = True,
    name: str = "adam",
) -> optax.GradientTransformation:
    """LinearLR(1 -> end_factor over decay_steps) + the named optax
    optimizer (reference train.py:56,283-285: --optimizer selects any
    torch.optim class by name, falling back to Adam; same contract here
    over optax, case-insensitive)."""
    schedule = optax.linear_schedule(
        init_value=lr, end_value=lr * end_factor, transition_steps=decay_steps
    )
    chain = []
    if grad_norm:
        chain.append(normalize_grads())
    chain.append(_OPTIMIZERS.get(name.lower(), optax.adam)(schedule))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Progressive growing (reference train.py:92-94, 297-300)
# ---------------------------------------------------------------------------


def progressive_steps(
    i: int,
    steps_range: Tuple[int, int],
    steps_increment: int,
    rng: np.random.Generator,
) -> int:
    """Rollout length for training iteration i."""
    lo, hi = steps_range
    mean = (lo + hi) // 2
    if steps_increment > 0 and i < mean * steps_increment:
        return i // steps_increment + 1
    return int(rng.integers(lo, hi))  # [lo, hi) as torch.randint


def bucket_steps(n: int, cap: int) -> int:
    """Round n up to a multiple of STEP_BUCKET (static scan length)."""
    b = ((n + STEP_BUCKET - 1) // STEP_BUCKET) * STEP_BUCKET
    return min(max(b, STEP_BUCKET), max(cap, STEP_BUCKET))


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainConfig:
    """Training hyper-parameters (defaults = reference train.py:27-61)."""

    batch_size: int = 8
    pool_size: int = 1024
    training_iter: int = 8000
    steps_range: Tuple[int, int] = (32, 48)
    steps_increment: int = 5
    lr: float = 3e-3
    lr_end_factor: float = 0.1
    lr_decay_steps: int = 2000
    normalize_grads: bool = True
    aux_states: int = 4  # random intermediate states in the loss
    aux_weight: float = 0.1
    degrade_prob: float = 0.0
    erase_radius: float = 0.0
    optimizer: str = "adam"  # reference train.py:56 --optimizer
    seed: int = 0


class Trainer:
    """End-to-end trainer for plane (and wrapped-plane) texture NCA.

    Geometry is fixed: one SPHGraph serves the pool, the rollouts, and the
    loss (reference pool slots all share the seed grid, train.py:236-250).
    """

    def __init__(
        self,
        model_cfg: SPHNCAConfig,
        train_cfg: TrainConfig,
        graph: SPHGraph,
        x: Array,  # [N, D] particle positions
        loss: LossBundle,
        h: float,
        *,
        params: Optional[MLPParams] = None,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.graph = graph
        self.x = x
        self.loss = loss
        self.h = h

        self.np_rng = np.random.default_rng(train_cfg.seed)
        self.key = jax.random.key(train_cfg.seed)

        from ..models.nca import init_params

        if params is None:
            self.key, k = jax.random.split(self.key)
            params = init_params(k, model_cfg)
        self.params = params

        self.optimizer = make_optimizer(
            train_cfg.lr,
            end_factor=train_cfg.lr_end_factor,
            decay_steps=train_cfg.lr_decay_steps,
            grad_norm=train_cfg.normalize_grads,
            name=train_cfg.optimizer,
        )
        self.opt_state = self.optimizer.init(self.params)

        # x for losses: the reference drops the padded z before the loss
        # (nca.py:145-148); particle positions given here should already be
        # the loss-space coordinates (2D for plane mode).
        self._loss_x = x

        self._step_fn = jax.jit(
            self._train_step, static_argnames=("max_steps",)
        )

    # -- jitted core -------------------------------------------------------

    def _train_step(
        self,
        params: MLPParams,
        opt_state,
        graph: SPHGraph,  # passed explicitly: closed-over arrays would be
        # embedded as program constants (bloats the executable; defeats
        # donation/sharding)
        A0: Array,  # [B, N, C]
        seed_A: Array,  # [N, C] fresh seed for replace-worst
        key: Array,
        n_steps: Array,  # traced scalar
        collect_steps: Array,  # [aux_states] traced
        max_steps: int,  # static bucket
    ):
        krank, kroll, kloss = jax.random.split(key, 3)

        # replace-worst ranking fused into the step (reference
        # Pool.sample(replace_worst=True), nca.py:436-443): rank by
        # per-sample loss desc, swap the worst for a fresh seed
        rank_keys = jax.random.split(krank, A0.shape[0])
        rank_losses = jax.vmap(
            lambda A, k: self.loss.per_sample(self._loss_x, A, k)
        )(A0, rank_keys)
        order = jnp.argsort(-rank_losses)
        A0 = A0[order].at[0].set(seed_A)

        def run_rollout(params):
            """Rollout on either engine; returns (final, collected) in
            PARTICLE order [B, N, C] / [B, S, N, C]."""
            from ..ops.bands import BandEngine
            from ..ops.cells import CellEngine

            if isinstance(graph, (CellEngine, BandEngine)):
                bsz = A0.shape[0]
                if isinstance(graph, BandEngine) or graph.blk_md is not None:
                    # batched-lane fast path (ops/batched.py): all B
                    # rollouts share the lane dim; tables read once per
                    # batch instead of once per sample
                    from ..models.cell_step import rollout_cells_batched
                    from ..ops.batched import (
                        batched_gather_back,
                        batched_scatter,
                    )

                    SB0 = batched_scatter(graph, A0)
                    out = rollout_cells_batched(
                        params, self.model_cfg, graph, SB0, bsz, kroll,
                        max_steps, self.h,
                        n_steps=jnp.broadcast_to(n_steps, (bsz,)),
                        collect_steps=collect_steps,
                    )
                    final = batched_gather_back(graph, out.final, bsz)
                    collected = jnp.swapaxes(
                        jax.vmap(
                            lambda S: batched_gather_back(graph, S, bsz)
                        )(out.collected),
                        0, 1,
                    )  # [B, S, N, C]
                    return final, collected
                from ..models.cell_step import rollout_cells

                S0 = jax.vmap(graph.scatter)(A0)
                keys = jax.random.split(kroll, A0.shape[0])
                out = jax.vmap(
                    lambda S, k: rollout_cells(
                        params, self.model_cfg, graph, S, k, max_steps,
                        self.h, n_steps=n_steps,
                        collect_steps=collect_steps,
                    )
                )(S0, keys)
                final = jax.vmap(graph.gather_back)(out.final)
                collected = jax.vmap(
                    jax.vmap(graph.gather_back)
                )(out.collected)
                return final, collected
            out = rollout_batch(
                params, self.model_cfg, graph, A0, kroll, max_steps,
                self.h, n_steps=n_steps, collect_steps=collect_steps,
            )
            return out.final, out.collected

        def loss_fn(params):
            final, collected = run_rollout(params)
            total = self.loss.batch_total(self._loss_x, final, kloss)
            # 0.1x losses on aux_states random intermediate states
            # (reference nca.py:149-150)
            for s in range(self.cfg.aux_states):
                total = total + self.cfg.aux_weight * self.loss.batch_total(
                    self._loss_x, collected[:, s],
                    jax.random.fold_in(kloss, s),
                )
            return total, final

        (loss, final), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, final, order

    # -- resume support ------------------------------------------------------

    def rng_state(self):
        """Host + device RNG state for exact resume (see io.checkpoint)."""
        return {
            "np_rng": self.np_rng.bit_generator.state,
            "key_data": np.asarray(jax.random.key_data(self.key)),
        }

    def set_rng_state(self, np_rng_state, key_data) -> None:
        self.np_rng.bit_generator.state = np_rng_state
        self.key = jax.random.wrap_key_data(jnp.asarray(key_data))

    # -- host loop ---------------------------------------------------------

    def run_iteration(self, i: int, pool: Pool):
        """One training iteration (reference train.py:295-308).

        With a host Pool this returns a float (synchronizing). With a
        DevicePool everything stays on device and the returned loss is
        an UN-materialized jax scalar — iterations then pipeline through
        the async dispatch queue (the per-iteration host sync profiled
        at ~40% of wall time on the tunneled backend); convert with
        float() only at logging points.
        """
        idx, A0 = pool.sample(
            self.cfg.batch_size,
            degrade_prob=self.cfg.degrade_prob,
            erase_radius=self.cfg.erase_radius,
        )
        seed_A = pool.initial_feature()

        n = progressive_steps(
            i, self.cfg.steps_range, self.cfg.steps_increment, self.np_rng
        )
        max_steps = bucket_steps(n, self.cfg.steps_range[1])
        collect = self.np_rng.integers(0, n + 1, size=self.cfg.aux_states)

        self.key, kstep = jax.random.split(self.key)
        self.params, self.opt_state, loss, final, order = self._step_fn(
            self.params,
            self.opt_state,
            self.graph,
            jnp.asarray(A0),
            jnp.asarray(seed_A),
            kstep,
            jnp.int32(n),
            jnp.asarray(collect, jnp.int32),
            max_steps=max_steps,
        )
        if getattr(pool, "device", False):
            pool.update(jnp.asarray(idx)[order], final)
            return loss
        pool.update(idx[np.asarray(order)], np.asarray(final))
        return float(loss)

    def train(
        self,
        pool: Pool,
        iterations: Optional[int] = None,
        callback: Optional[Callable[[int, float], None]] = None,
    ):
        iters = self.cfg.training_iter if iterations is None else iterations
        for i in range(iters):
            loss = self.run_iteration(i, pool)
            if callback is not None:
                callback(i, loss)
        return self.params
