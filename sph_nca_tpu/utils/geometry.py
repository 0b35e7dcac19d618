"""Grid generation and differentiable image sampling.

TPU-native equivalents of the reference's commons/geometry.py:
  grange            (:138-152)  regular particle grids
  bilinear_sample   (:99-135)   corner-weighted 2D interpolation
  trilinear_sample  (:31-71)    corner-weighted 3D interpolation

The reference routes interpolation through a custom batched gather library
(commons/indexing.py) with a CUDA long-matmul workaround; in JAX a plain
``grid[ix, iy]`` advanced-index JIT-compiles to one XLA gather, so none of
that machinery is needed.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp

Array = jnp.ndarray


def grange(
    gshape: Sequence[int],
    gmin: Array,
    gsize: Array,
    grid_offset: float = 0.5,
) -> Array:
    """Regular grid of particle positions, shape [*gshape, D].

    pos = gmin + gsize * (index + grid_offset) / gshape
    (reference geometry.py:138-152).
    """
    gmin = jnp.asarray(gmin, dtype=jnp.float32)
    gsize = jnp.asarray(gsize, dtype=jnp.float32)
    axes = [jnp.arange(s, dtype=jnp.float32) for s in gshape]
    idx = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    gshape_arr = jnp.asarray(gshape, dtype=jnp.float32)
    return gmin + gsize * (idx + grid_offset) / gshape_arr


def _linear_sample(p: Array, grid: Array, gmin, gsize, d: int,
                   grid_center_offset: float) -> Array:
    """Shared n-linear interpolation core for d in {2, 3}.

    p: [P, d] sample positions; grid: [g0..g_{d-1}, *value]; returns
    [P, *value]. Out-of-range corners are clamped (same as the reference's
    clipped grid index, geometry.py:26,94).
    """
    gmin = jnp.asarray(gmin, dtype=p.dtype)
    gsize = jnp.asarray(gsize, dtype=p.dtype)
    gshape = jnp.asarray(grid.shape[:d], dtype=p.dtype)
    cell = gsize / gshape

    gp = (p - gmin) / cell  # grid-space position in [0, g)
    gi = jnp.floor(gp - grid_center_offset).astype(jnp.int32)

    value_dims = grid.ndim - d
    out = 0.0
    for offset in itertools.product((0, 1), repeat=d):
        off = jnp.asarray(offset, dtype=jnp.int32)
        ogi = gi + off
        # weight = prod_d (1 - |gp - (ogi + center_offset)|)
        w = jnp.prod(1.0 - jnp.abs(gp - (ogi + grid_center_offset)), axis=-1)
        cgi = jnp.clip(ogi, 0, jnp.asarray(grid.shape[:d], jnp.int32) - 1)
        gv = grid[tuple(cgi[..., i] for i in range(d))]  # [P, *value]
        out = out + w[(...,) + (None,) * value_dims] * gv
    return out


def bilinear_sample(p: Array, grid: Array, gmin, gsize,
                    grid_center_offset: float = 0.5) -> Array:
    """Sample a 2D grid of values at positions p [P, 2] -> [P, *value].

    Reference: geometry.py:99-135. Differentiable w.r.t. both p and grid.
    """
    return _linear_sample(p, grid, gmin, gsize, 2, grid_center_offset)


def trilinear_sample(p: Array, grid: Array, gmin, gsize,
                     grid_center_offset: float = 0.5) -> Array:
    """Sample a 3D grid of values at positions p [P, 3] -> [P, *value].

    Reference: geometry.py:31-71.
    """
    return _linear_sample(p, grid, gmin, gsize, 3, grid_center_offset)
