"""Persistent-CA sample pool (reference nca.py:400-460 ``Pool``).

Host-side numpy ring of NCA states. Design deltas vs the reference:

  * positions are stored ONCE ([N, D]) instead of per-slot [P, N, D]:
    particle geometry never changes during training (pool slots only ever
    differ in state A — reference nca.py:432,459 copies x around anyway);
  * sampling returns dense [B, N, C] batches (no ragged pack/sections);
  * the replace-worst ranking is done by the caller with a vmapped
    per-sample loss on device (see trainer.py), keeping the pool free of
    device code.

Damage-based fault injection for regeneration training is kept:
``degrade_prob`` re-randomizes random cells, ``erase_radius`` zeroes a
random disk per sample (reference nca.py:445-454).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class Pool:
    def __init__(
        self,
        seed_x: np.ndarray,  # [N, D]
        seed_A: np.ndarray,  # [N, C]
        total_size: int,
        *,
        randomized_feat: bool = False,
        rng: Optional[np.random.Generator] = None,
    ):
        self.rng = rng if rng is not None else np.random.default_rng(0)
        self.x = np.asarray(seed_x, np.float32)
        self.seed_A = np.asarray(seed_A, np.float32)
        self.total_size = total_size
        self.num_points, self.num_features = self.seed_A.shape
        self.randomized_feat = randomized_feat

        self.A = np.empty(
            (total_size, self.num_points, self.num_features), np.float32
        )
        for i in range(total_size):
            self.A[i] = self.initial_feature()

    def initial_feature(self) -> np.ndarray:
        """Fresh seed state (reference nca.py:421-427)."""
        if self.randomized_feat:
            return self.rng.random(
                (self.num_points, self.num_features), dtype=np.float32
            )
        return self.seed_A

    def sample(
        self,
        batch_size: int,
        *,
        degrade_prob: float = 0.0,
        erase_radius: float = 0.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Draw a batch without replacement -> (idx [B], A [B, N, C]).

        Worst-sample replacement is the caller's job (it needs the loss);
        use `replace_worst` after ranking.
        """
        idx = self.rng.permutation(self.total_size)[:batch_size]
        A = self.A[idx].copy()

        if degrade_prob > 0.0:
            mask = self.rng.random(A.shape[:2]) < degrade_prob
            A[mask] = self.rng.random(
                (int(mask.sum()), self.num_features), dtype=np.float32
            )
        if erase_radius > 0.0:
            for b in range(batch_size):
                i = self.rng.integers(self.num_points)
                d2 = np.sum((self.x - self.x[i]) ** 2, axis=-1)
                A[b, d2 < erase_radius**2] = 0.0
        return idx, A

    def replace_worst(
        self, idx: np.ndarray, A: np.ndarray, losses: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Sort batch by loss (desc) and replace the worst with a fresh seed
        (reference nca.py:436-443). Returns reordered (idx, A)."""
        order = np.argsort(losses)[::-1]
        idx = idx[order]
        A = A[order]
        A[0] = self.initial_feature()
        return idx, A

    def update(self, idx: np.ndarray, A: np.ndarray) -> None:
        """Write rolled-out states back (reference nca.py:457-460)."""
        self.A[idx] = np.asarray(A, np.float32)


class DevicePool:
    """Device-resident replay pool — the TPU-native Pool.

    The state ring lives in HBM ([total_size, N, C], ~650 MB at the
    reference config) and sample/update are on-device gather/scatter,
    so a training iteration moves NO state between host and device (the
    host only draws indices). With the trainer returning an
    un-materialized loss, iterations pipeline through the async
    dispatch queue and the per-iteration host/tunnel sync cost
    (profiled at ~40% of wall time) collapses to the logging cadence.

    Index draws use the same host numpy Generator as Pool (exact-resume
    compatible); damage RNG derives jax keys from it.
    """

    device = True

    def __init__(
        self,
        seed_x: np.ndarray,  # [N, D]
        seed_A: np.ndarray,  # [N, C]
        total_size: int,
        *,
        randomized_feat: bool = False,
        rng: Optional[np.random.Generator] = None,
    ):
        import jax
        import jax.numpy as jnp

        self.rng = rng if rng is not None else np.random.default_rng(0)
        self.x = jnp.asarray(seed_x, jnp.float32)
        self.seed_A = jnp.asarray(seed_A, jnp.float32)
        self.total_size = total_size
        self.num_points, self.num_features = self.seed_A.shape
        self.randomized_feat = randomized_feat

        if randomized_feat:
            key = jax.random.key(self.rng.integers(2**63))
            self.A = jax.random.uniform(
                key, (total_size, self.num_points, self.num_features)
            )
        else:
            self.A = jnp.broadcast_to(
                self.seed_A[None], (total_size,) + self.seed_A.shape
            ) + jnp.zeros((total_size, 1, 1))  # materialize

    def initial_feature(self):
        if self.randomized_feat:
            import jax

            key = jax.random.key(self.rng.integers(2**63))
            return jax.random.uniform(
                key, (self.num_points, self.num_features)
            )
        return self.seed_A

    def sample(
        self,
        batch_size: int,
        *,
        degrade_prob: float = 0.0,
        erase_radius: float = 0.0,
    ):
        """(idx [B] host, A [B, N, C] device). Damage on device."""
        import jax
        import jax.numpy as jnp

        idx = self.rng.permutation(self.total_size)[:batch_size]
        A = self.A[jnp.asarray(idx)]
        if degrade_prob > 0.0 or erase_radius > 0.0:
            key = jax.random.key(self.rng.integers(2**63))
            A = _damage(
                A, self.x, key, float(degrade_prob), float(erase_radius)
            )
        return idx, A

    def update(self, idx, A) -> None:
        """Write back on device; idx may be a device array (e.g. already
        reordered by the in-step ranking)."""
        import jax.numpy as jnp

        self.A = self.A.at[jnp.asarray(idx)].set(A)

    # -- resume support ----------------------------------------------------

    def state_np(self) -> np.ndarray:
        return np.asarray(self.A)

    def load_state(self, A: np.ndarray) -> None:
        import jax.numpy as jnp

        self.A = jnp.asarray(A, jnp.float32)


def _damage(A, x, key, degrade_prob: float, erase_radius: float):
    """Device-side pool damage (reference nca.py:445-454)."""
    import jax
    import jax.numpy as jnp

    b, n, f = A.shape
    k1, k2, k3 = jax.random.split(key, 3)
    if degrade_prob > 0.0:
        mask = jax.random.uniform(k1, (b, n)) < degrade_prob
        repl = jax.random.uniform(k2, A.shape)
        A = jnp.where(mask[..., None], repl, A)
    if erase_radius > 0.0:
        centers = x[jax.random.randint(k3, (b,), 0, n)]
        d2 = jnp.sum((x[None] - centers[:, None]) ** 2, axis=-1)
        A = jnp.where((d2 < erase_radius**2)[..., None], 0.0, A)
    return A
