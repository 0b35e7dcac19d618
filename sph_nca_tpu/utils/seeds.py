"""Seeding utilities (reference nca.py:383-398 ``add_radial_seed``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def radial_seed_weights(x: Array, center: Array, radius: float) -> Array:
    """w = clamp(1 - d^2/R^2, 0, 1)^3 around ``center`` (nca.py:390-392)."""
    d2 = jnp.sum((x - center) ** 2, axis=-1)
    return jnp.clip(1.0 - d2 / radius**2, 0.0, 1.0) ** 3


def add_radial_seed(
    x: Array,
    A: Array,
    center: Array,
    radius: float,
    texture: Optional[Array] = None,
) -> Array:
    """A + texture * w (texture defaults to ones, nca.py:392-393).

    Pure-functional: returns the new A instead of mutating.
    """
    w = radial_seed_weights(x, center, radius)
    if texture is None:
        texture = jnp.ones_like(A)
    return A + texture * w[..., None]


def plane_seed(
    x: Array,
    channels: int,
    *,
    gmin,
    gsize,
    radius: float,
    randomized: bool = False,
    key: Optional[Array] = None,
) -> Array:
    """The train/test CLI seed: zeros + central radial seed, or uniform
    random features (reference train.py:236-248, test.py:135-147)."""
    if randomized:
        assert key is not None
        return jax.random.uniform(key, (x.shape[0], channels))
    A = jnp.zeros((x.shape[0], channels))
    center = jnp.asarray(gmin) + jnp.asarray(gsize) / 2.0
    return add_radial_seed(x, A, center, radius)
