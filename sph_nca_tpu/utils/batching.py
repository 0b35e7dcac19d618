"""Ragged-batch compatibility helpers (reference U1, sphops/utils:31-38).

The framework's native batching is dense [B, N, ...] + vmap; these helpers
exist for API parity with the reference's pack/sections convention and for
interop with genuinely ragged point clouds (pad to the max and mask).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pack(*xx: Array) -> Tuple[Array, List[int]]:
    """Concatenate along axis 0 -> (packed, sections). Reference U1."""
    packed = jnp.concatenate(xx, axis=0)
    return packed, [int(x.shape[0]) for x in xx]


def unpack(packed: Array, sections: Sequence[int]) -> List[Array]:
    """Split a packed array back into its sections. Reference U1."""
    out = []
    start = 0
    for s in sections:
        out.append(packed[start : start + s])
        start += s
    return out


def pad_ragged(
    xs: Sequence[np.ndarray], pad_value: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged list of [n_i, ...] -> dense [B, N_max, ...] + mask [B, N_max].

    The TPU-native replacement for ragged sections: static shapes + mask.
    """
    n_max = max(x.shape[0] for x in xs)
    b = len(xs)
    out = np.full((b, n_max) + xs[0].shape[1:], pad_value, xs[0].dtype)
    mask = np.zeros((b, n_max), bool)
    for i, x in enumerate(xs):
        out[i, : x.shape[0]] = x
        mask[i, : x.shape[0]] = True
    return out, mask
