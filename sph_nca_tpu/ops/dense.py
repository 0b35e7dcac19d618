"""Dense O(N^2) SPH operators — exact reference semantics, no neighbor lists.

These serve two roles:
  1. the *oracle* for correctness tests of the neighbor-list / Pallas paths
     (SURVEY.md §4: brute-force dense-pair reference), and
  2. an exact, fully differentiable path for small point clouds.

The math replicates the reference CUDA kernels
(code/sphops/ops/operators_batch.py):
  volume     v_i  = 1 / (sigma_W * sum_j W(x_j - x_i))          (:70-76)
  gradient   GA_i = sigma_g * sum_j (A_j - A_i) gk(x_j - x_i) v_j  (:222-229)
  divergence DA_i = sigma_g * sum_j v_j dot(A_j - A_i, gk)      (:411-419)
  blur       SA_i = sigma_W * sum_j A_j W(x_j - x_i) v_j        (:661-667)
  count      c_i  = sum_j [|x_j - x_i|^2 < h^2]                 (:590-596)

Sums run over ALL j including i itself (the reference's cell scan visits the
particle's own cell), which matters for `volume` and `blur` (W(0) > 0).

All functions operate on a single point cloud [N, ...]; batch via `jax.vmap`.
`cell_size` enables periodic (minimum-image) displacements, which is the
TPU-native replacement for the reference's ghost-particle wrapping
(code/nca.py:167-242) — see ops/hashgrid.py for the parity argument.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import kernels as K

Array = jnp.ndarray


def displacements(
    x: Array, period: Optional[Array] = None
) -> Array:
    """All-pairs displacement r[i, j] = x[j] - x[i], shape [N, N, D].

    If ``period`` (shape [D] or scalar) is given, applies the minimum-image
    convention per axis: r -> r - round(r / L) * L.
    """
    r = x[None, :, :] - x[:, None, :]
    if period is not None:
        period = jnp.asarray(period)
        r = r - jnp.round(r / period) * period
    return r


def volume(
    x: Array,
    h: float,
    *,
    smoothing: str = K.DEFAULT_SMOOTHING,
    period: Optional[Array] = None,
) -> Array:
    """Particle volume (inverse number density), shape [N]."""
    dim = x.shape[-1]
    kern = K.get_smoothing_kernel(smoothing)
    r = displacements(x, period)
    d2 = jnp.sum(r * r, axis=-1)  # [N, N]
    inv_v = kern.norm(h, dim) * jnp.sum(kern.w(d2, h), axis=-1)
    return 1.0 / inv_v


def gradient(
    x: Array,
    v: Array,
    A: Array,
    h: float,
    *,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
    period: Optional[Array] = None,
) -> Array:
    """SPH gradient of per-particle features A [N, F] -> [N, F, D]."""
    dim = x.shape[-1]
    kern = K.get_gradient_kernel(gradient_kernel)
    r = displacements(x, period)  # [N, N, D]
    gk = kern.grad(r, h) * v[None, :, None]  # [N, N, D], weighted by v_j
    dA = A[None, :, :] - A[:, None, :]  # [N, N, F]
    # GA[i, f, d] = sum_j dA[i, j, f] * gk[i, j, d]
    ga = jnp.einsum("ijf,ijd->ifd", dA, gk,
                    precision=jax.lax.Precision.HIGHEST)
    return kern.norm(h, dim) * ga


def divergence(
    x: Array,
    v: Array,
    A: Array,
    h: float,
    *,
    gradient_kernel: str = K.DEFAULT_GRADIENT,
    period: Optional[Array] = None,
) -> Array:
    """SPH divergence of vector features A [N, F, D] -> [N, F]."""
    dim = x.shape[-1]
    kern = K.get_gradient_kernel(gradient_kernel)
    r = displacements(x, period)
    gk = kern.grad(r, h)  # [N, N, D]
    dA = A[None, :, :, :] - A[:, None, :, :]  # [N, N, F, D]
    da = jnp.einsum("ijfd,ijd,j->if", dA, gk, v,
                    precision=jax.lax.Precision.HIGHEST)
    return kern.norm(h, dim) * da


def blur(
    x: Array,
    v: Array,
    A: Array,
    h: float,
    *,
    smoothing: str = K.DEFAULT_SMOOTHING,
    period: Optional[Array] = None,
) -> Array:
    """SPH smoothing (Shepard-style gather) of A [N, F] -> [N, F]."""
    dim = x.shape[-1]
    kern = K.get_smoothing_kernel(smoothing)
    r = displacements(x, period)
    d2 = jnp.sum(r * r, axis=-1)
    wv = kern.w(d2, h) * v[None, :]  # [N, N]
    return kern.norm(h, dim) * jnp.matmul(
        wv, A, precision=jax.lax.Precision.HIGHEST
    )


def count(
    x: Array,
    h: float,
    *,
    period: Optional[Array] = None,
) -> Array:
    """Neighbor count within radius h (includes self), shape [N] int32."""
    r = displacements(x, period)
    d2 = jnp.sum(r * r, axis=-1)
    return jnp.sum(d2 < h * h, axis=-1).astype(jnp.int32)
