"""SPH smoothing / gradient kernel functions.

TPU-native (pure-JAX, vectorized) implementations of the SPH kernel functions
the reference defines as Numba-CUDA device functions
(reference: code/sphops/ops/kernels_impl.py).

All functions are elementwise over arbitrary leading batch dimensions and are
written so XLA fuses them into the surrounding gather/matmul code. Every
kernel has compact support ``h``: W(r) == 0 and dW == 0 for |r| >= h, which is
what makes fixed-radius neighbor lists exact.

Conventions (identical to the reference):
  * smoothing kernels return the *unnormalized* value; the per-``h``
    normalization constant is applied once by the calling op
    (cf. reference code/sphops/ops/operators_batch.py:76,234,670).
  * the "gradient kernel" is the spiky-kernel vector
    ``gk(r) = 3 (h-d)^2 * r / d`` for 0 < d < h (zero at d==0 and d>=h),
    which equals ``-grad_r W_spiky`` — the sign convention the reference uses
    (kernels_impl.py:144-156) and that its NCA perception depends on.

Unlike the reference we do NOT hand-write the derivative ("_dr") functions
for the backward pass: JAX autodiff differentiates these closed forms
exactly. (Note: the reference's ``wendlandC2/C4 _dr`` functions carry an
extra factor of ``d`` relative to the true derivative — kernels_impl.py:87,
:125; autodiff gives the mathematically correct adjoint instead.)
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-20


# ---------------------------------------------------------------------------
# Smoothing kernels: W(d2, h) -> scalar, plus normalization(h, dim)
# ---------------------------------------------------------------------------


def poly6_w(d2: Array, h) -> Array:
    """Unnormalized poly6 kernel, W = max(h^2 - d^2, 0)^3.

    Reference: kernels_impl.py:33-40 (``smoothing_poly6_nd``).
    """
    return jnp.maximum(h * h - d2, 0.0) ** 3


def poly6_norm(h, dim: int) -> float:
    """Poly6 normalization. Reference: kernels_impl.py:21-29."""
    if dim == 2:
        return 4.0 / (math.pi * h**8)
    if dim == 3:
        return 315.0 / (64.0 * math.pi * h**9)
    raise NotImplementedError(f"poly6 normalization for dim={dim}")


def wendland_c2_w(d2: Array, h) -> Array:
    """Unnormalized Wendland C2 kernel, (1-q)^4 (4q+1) for q = d/h < 1.

    Reference: kernels_impl.py:68-77. The d2 > 0 guard keeps autodiff
    finite at r == 0 (sqrt'(0) is inf; every neighborhood contains the
    self-pair, so this matters for every dL/dx).
    """
    q = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0)) / h
    w = jnp.where(q < 1.0, (1.0 - q) ** 4 * (4.0 * q + 1.0), 0.0)
    return jnp.where(d2 > 0.0, w, 1.0)  # W(0) = 1


def wendland_c2_norm(h, dim: int) -> float:
    """Reference: kernels_impl.py:56-66."""
    if dim == 2:
        return 7.0 / (math.pi * h**2)
    if dim == 3:
        return 21.0 / (2.0 * math.pi * h**3)
    raise NotImplementedError(f"wendlandC2 normalization for dim={dim}")


def wendland_c4_w(d2: Array, h) -> Array:
    """Unnormalized Wendland C4 kernel, (1-q)^6 (35q^2+18q+3)/3 for q < 1.

    Reference: kernels_impl.py:105-115.
    """
    q2 = d2 / (h * h)
    q = jnp.sqrt(jnp.where(q2 > 0.0, q2, 1.0))  # autodiff-safe at r == 0
    w = jnp.where(
        q < 1.0, (1.0 - q) ** 6 * (35.0 * q2 + 18.0 * q + 3.0) / 3.0, 0.0
    )
    return jnp.where(q2 > 0.0, w, 1.0)  # W(0) = 3/3 = 1


def wendland_c4_norm(h, dim: int) -> float:
    """Reference: kernels_impl.py:93-103."""
    if dim == 2:
        return 9.0 / (math.pi * h**2)
    if dim == 3:
        return 495.0 / (32.0 * math.pi * h**3)
    raise NotImplementedError(f"wendlandC4 normalization for dim={dim}")


# ---------------------------------------------------------------------------
# Gradient kernel (spiky): gk(r, h) -> vector [..., D]
# ---------------------------------------------------------------------------


def spiky_grad(r: Array, h) -> Array:
    """Spiky gradient-kernel vector ``3 (h-d)^2 * r/d`` (0 at d==0, d>=h).

    ``r``: displacement vectors ``x_j - x_i`` with shape [..., D].
    Reference: kernels_impl.py:143-156 (``gradient_spiky_nd``); the zero at
    d==0 reproduces the reference's ``r[i] and mag * r[i]`` short-circuit.
    """
    d2 = jnp.sum(r * r, axis=-1, keepdims=True)
    # sqrt of a strictly positive value keeps autodiff finite at r == 0
    # (the self-pair is in every neighborhood).
    d = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    inside = (d2 > 0.0) & (d < h)
    mag = jnp.where(inside, 3.0 * (h - d) ** 2 / d, 0.0)
    return mag * r


def spiky_norm(h, dim: int) -> float:
    """Reference: kernels_impl.py:131-141."""
    if dim == 2:
        return 10.0 / (math.pi * h**5)
    if dim == 3:
        return 15.0 / (math.pi * h**6)
    raise NotImplementedError(f"spiky normalization for dim={dim}")


# ---------------------------------------------------------------------------
# Selection layer (reference: code/sphops/ops/kernels.py)
# ---------------------------------------------------------------------------


class SmoothingKernel(NamedTuple):
    """A smoothing kernel: unnormalized W(d^2, h) and its normalization."""

    name: str
    w: Callable[[Array, float], Array]
    norm: Callable[[float, int], float]


class GradientKernel(NamedTuple):
    """A gradient kernel: vector gk(r, h) and its normalization."""

    name: str
    grad: Callable[[Array, float], Array]
    norm: Callable[[float, int], float]


_SMOOTHING_KERNELS = {
    "poly6": SmoothingKernel("poly6", poly6_w, poly6_norm),
    "wendlandC2": SmoothingKernel("wendlandC2", wendland_c2_w, wendland_c2_norm),
    "wendlandC4": SmoothingKernel("wendlandC4", wendland_c4_w, wendland_c4_norm),
}

_GRADIENT_KERNELS = {
    "spiky": GradientKernel("spiky", spiky_grad, spiky_norm),
}

# Defaults match the reference config (code/sphops/ops/kernels.py:6-7).
DEFAULT_SMOOTHING = "poly6"
DEFAULT_GRADIENT = "spiky"


def get_smoothing_kernel(name: str = DEFAULT_SMOOTHING) -> SmoothingKernel:
    try:
        return _SMOOTHING_KERNELS[name]
    except KeyError:
        raise ValueError(
            f"unknown smoothing kernel {name!r}; "
            f"available: {sorted(_SMOOTHING_KERNELS)}"
        ) from None


def get_gradient_kernel(name: str = DEFAULT_GRADIENT) -> GradientKernel:
    try:
        return _GRADIENT_KERNELS[name]
    except KeyError:
        raise ValueError(
            f"unknown gradient kernel {name!r}; "
            f"available: {sorted(_GRADIENT_KERNELS)}"
        ) from None
