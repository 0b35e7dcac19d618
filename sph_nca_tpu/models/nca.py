"""SPHNCA — the SPH Neural Cellular Automaton, TPU-native.

Functional re-design of the reference model (code/nca.py:33-122 ``SPHNCA``):
parameters are a plain pytree, the step is a pure function of
``(params, graph, A, key)`` so the whole K-step rollout jits into a single
XLA program via ``lax.scan`` (the reference launches ~6 CUDA kernels + 2
GEMMs per step, each followed by a blocking ``cuda.synchronize()``).

One NCA step (reference nca.py:87-117):
    activity   = A[..., 3]                      (or ones if not use_alpha)
    prev_mask  = blur(activity > 0.1) > 0.1     (stop-gradient)
    gA         = sph_gradient(A)                 # perception
    gA         = h * k * gA                      (if normalize_perception k>0)
    y          = concat[A, gA_x, gA_y]           # 3C features
    dA         = Linear(3C->hidden) -> ReLU -> Linear(hidden->out)
    gated:     nA = A * sig(dA[:C]) + tanh(dA[C:2C]) * sig(dA[-1:])
    orig:      nA = A + dA * fire_rate0 / fire_rate
    nA         = where(U(0,1) <= fire_rate, nA, A)   # stochastic update
    new_mask   = blur(activity(nA) > 0.1) > 0.1
    nA        *= prev_mask & new_mask
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.hashgrid import SPHGraph
from ..ops.neighbor_ops import graph_blur, graph_gradient

Array = jnp.ndarray

# Magic constants of the reference (train.py:84, nca.py:34).
DEFAULT_CHANNELS = 16
DEFAULT_HIDDEN = 256
ALIVE_THRESHOLD = 0.1


@dataclasses.dataclass(frozen=True)
class SPHNCAConfig:
    """Static model configuration (hashable -> usable as a jit static arg)."""

    channels: int = DEFAULT_CHANNELS
    hidden: int = DEFAULT_HIDDEN
    fire_rate: float = 0.5
    update_rule: str = "gated"  # 'gated' | 'orig'  (nca.py:46-49)
    use_alpha: bool = True
    # k in gA <- h * gA * k; <= 0 disables. The reference trains with
    # k = 1/h_train (train.py:106-108) making perception scale-free.
    normalize_perception: float = -1.0
    # SPH smoothing kernel name (reference sphops/ops/kernels.py:6
    # module constant). Engines bake the kernel into their pair weights
    # at build time; this field makes the choice travel with the
    # checkpoint so test/eval rebuild matching engines.
    smoothing: str = "poly6"

    @property
    def in_features(self) -> int:
        return 3 * self.channels

    @property
    def out_features(self) -> int:
        if self.update_rule == "gated":
            return 2 * self.channels + 1
        if self.update_rule == "orig":
            return self.channels
        raise ValueError(f"unknown update rule {self.update_rule!r}")


class MLPParams(NamedTuple):
    """Two-layer update MLP (reference nca.py:50-54)."""

    w1: Array  # [3C, H]
    b1: Array  # [H]
    w2: Array  # [H, out]
    b2: Array  # [out]


def init_params(key: Array, cfg: SPHNCAConfig, dtype=jnp.float32) -> MLPParams:
    """Initialize like torch.nn.Linear (U(-1/sqrt(fan_in), 1/sqrt(fan_in)));
    the 'orig' rule zero-inits the last layer (nca.py:56-58)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fi, hid, out = cfg.in_features, cfg.hidden, cfg.out_features
    b1 = 1.0 / jnp.sqrt(fi)
    b2 = 1.0 / jnp.sqrt(hid)
    p = MLPParams(
        w1=jax.random.uniform(k1, (fi, hid), dtype, -b1, b1),
        b1=jax.random.uniform(k2, (hid,), dtype, -b1, b1),
        w2=jax.random.uniform(k3, (hid, out), dtype, -b2, b2),
        b2=jax.random.uniform(k4, (out,), dtype, -b2, b2),
    )
    if cfg.update_rule == "orig":
        p = p._replace(w2=jnp.zeros_like(p.w2), b2=jnp.zeros_like(p.b2))
    return p


def num_params(p: MLPParams) -> int:
    return sum(int(x.size) for x in p)


def apply_mlp(p: MLPParams, y: Array) -> Array:
    """y [N, 3C] -> dA [N, out]; two MXU GEMMs + ReLU.

    Precision.HIGH (bf16x3 passes, ~tf32 accuracy) — the default bf16
    single pass is too coarse for the NCA's long recurrent rollouts
    (state errors compound over K steps x thousands of training
    iterations), while full f32 (6 passes) doubles MXU time for accuracy
    beyond the reference's own f32-fastmath CUDA."""
    prec = jax.lax.Precision.HIGH
    h = jnp.maximum(jnp.matmul(y, p.w1, precision=prec) + p.b1, 0.0)
    return jnp.matmul(h, p.w2, precision=prec) + p.b2


def cell_activity(A: Array, use_alpha: bool = True) -> Array:
    """Alpha channel as activity (reference nca.py:17-21)."""
    if use_alpha:
        return A[..., 3]
    return jnp.ones_like(A[..., 3])


def life_mask(graph: SPHGraph, activity: Array) -> Array:
    """blur(activity > 0.1) > 0.1, stop-gradient (reference nca.py:71-79)."""
    m = (activity > ALIVE_THRESHOLD).astype(jnp.float32)[:, None]
    sm = jax.lax.stop_gradient(graph_blur(graph, m))
    return sm[:, 0] > ALIVE_THRESHOLD


def to_rgba(A: Array, use_alpha: bool = True) -> Array:
    """rgb = A[:, :3], a = activity (reference nca.py:81-85)."""
    rgb = A[..., :3]
    a = cell_activity(A, use_alpha)[..., None]
    return jnp.concatenate([rgb, a], axis=-1)


# A perception transform maps raw gA [N, C, D] -> processed gA [N, C, >=2];
# the mesh path uses it for tangent-space projection (nca.py:332-336).
PerceptionTransform = Callable[[Array], Array]


def perceive(
    cfg: SPHNCAConfig,
    graph: SPHGraph,
    A: Array,
    h,
    transform: Optional[PerceptionTransform] = None,
) -> Array:
    """SPH-gradient perception (reference nca.py:65-69) + feature concat
    (default_feature_processs, nca.py:23-31: only gA components 0 and 1
    feed the MLP, also in 3D — the mesh path first rotates gA into the
    tangent frame so components 0,1 are the tangential derivatives)."""
    gA = graph_gradient(graph, A)  # [N, C, D]
    if cfg.normalize_perception > 0:
        gA = h * gA * cfg.normalize_perception
    if transform is not None:
        gA = transform(gA)
    return jnp.concatenate([A, gA[..., 0], gA[..., 1]], axis=-1)


def _mask_blur(graph: SPHGraph, Aj: Array, use_alpha: bool) -> Array:
    """life_mask from pre-gathered neighbor states Aj [N, K, C]:
    blur((activity > 0.1).float) > 0.1, stop-gradient (nca.py:71-79)."""
    from ..ops.neighbor_ops import graph_blur_from

    mj = (cell_activity(Aj, use_alpha) > ALIVE_THRESHOLD).astype(jnp.float32)
    sm = jax.lax.stop_gradient(graph_blur_from(graph, mj[..., None]))
    return sm[:, 0] > ALIVE_THRESHOLD


def nca_step(
    params: MLPParams,
    cfg: SPHNCAConfig,
    graph: SPHGraph,
    A: Array,
    key: Array,
    h,
    fire_rate: Optional[float] = None,
    perception_transform: Optional[PerceptionTransform] = None,
) -> Array:
    """One NCA update step A -> nA (reference nca.py:87-117).

    Fused memory plan (TPU): the state is gathered to neighbors ONCE per
    phase ([N, K, C]) and both the life-mask blur and the SPH-gradient
    perception are contracted from that tensor — narrow standalone gathers
    are the slowest op XLA emits on TPU (see ops.gather_neighbors).
    """
    from ..ops.neighbor_ops import gather_neighbors, graph_gradient_from

    if fire_rate is None:
        fire_rate = cfg.fire_rate

    Aj = gather_neighbors(graph, A)  # [N, K, C]
    prev_mask = _mask_blur(graph, Aj, cfg.use_alpha)

    gA = graph_gradient_from(graph, A, Aj)  # [N, C, D]
    if cfg.normalize_perception > 0:
        gA = h * gA * cfg.normalize_perception
    if perception_transform is not None:
        gA = perception_transform(gA)
    y = jnp.concatenate([A, gA[..., 0], gA[..., 1]], axis=-1)
    dA = apply_mlp(params, y)

    c = cfg.channels
    if cfg.update_rule == "gated":
        gate = jax.nn.sigmoid(dA[..., :c])
        delta = jnp.tanh(dA[..., c : 2 * c])
        mult = jax.nn.sigmoid(dA[..., -1:])
        nA = A * gate + delta * mult
    elif cfg.update_rule == "orig":
        nA = A + dA * (cfg.fire_rate / fire_rate)
    else:
        raise ValueError(f"unknown update rule {cfg.update_rule!r}")

    u = jax.random.uniform(key, (A.shape[0],))
    update_mask = u <= fire_rate
    nA = jnp.where(update_mask[:, None], nA, A)

    nAj = gather_neighbors(graph, nA)
    new_mask = _mask_blur(graph, nAj, cfg.use_alpha)
    living = (prev_mask & new_mask).astype(nA.dtype)
    return nA * living[:, None]
