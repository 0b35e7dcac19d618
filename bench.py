"""Headline benchmark: particle-steps/sec on a 100k-particle 3D surface rollout.

Mirrors BASELINE.json's metric ("particle-steps/sec on 100k-particle bunny
rollout"): a 102,400-point procedurally-generated closed surface (Fibonacci
sphere — same scale/structure class as the reference's FPS-sampled bunny,
test.py:36 default 25,600 points x4) rolled out with the flagship 16-channel
gated SPHNCA. The timed unit is the full NCA step (2 life-mask blurs +
gradient perception + 48->256->33 MLP + gated update, nca.py:87-117) inside
one jitted lax.scan.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
reported against the stated north-star target of 1e9 particle-steps/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


N_POINTS = 102_400
STEPS = 64
NORTH_STAR = 1e9  # particle-steps/sec (BASELINE.json)


def fibonacci_sphere(n: int, radius: float = 0.8) -> np.ndarray:
    """Quasi-uniform points on a sphere surface, [n, 3] in [-1, 1]^3."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))  # golden angle
    y = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    pts = np.stack([r * np.cos(theta), y, r * np.sin(theta)], axis=-1)
    return (radius * pts).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from sph_nca_tpu import ops
    from sph_nca_tpu.models import SPHNCAConfig, init_params, rollout

    x_np = fibonacci_sphere(N_POINTS)
    # Support radius sized for ~30 neighbors on the surface disc
    # (demo shows 20-40 neighbors at its defaults, SURVEY.md §7).
    area_per_point = 4.0 * np.pi * 0.8**2 / N_POINTS
    h = float(np.sqrt(30.0 * area_per_point / np.pi))
    dims = ops.default_dims(h)

    x = jnp.asarray(x_np)
    mpc, k = ops.suggest_capacity(x_np, h, dims)
    graph = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
    graph = jax.tree.map(lambda a: a.block_until_ready(), graph)
    assert int(graph.valid.sum(-1).min()) > 0

    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    A0 = jax.random.uniform(jax.random.key(1), (N_POINTS, cfg.channels))

    roll = jax.jit(
        lambda p, g, A, key: rollout(
            p, cfg, g, A, key, STEPS, h, remat=False
        ).final
    )

    # warmup/compile; force full completion with a host readback
    # (block_until_ready alone does not block under the axon tunnel)
    np.asarray(roll(params, graph, A0, jax.random.key(2)).ravel()[:1])

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(roll(params, graph, A0, jax.random.key(3 + rep)).ravel()[:1])
        best = min(best, time.perf_counter() - t0)

    value = N_POINTS * STEPS / best
    print(
        json.dumps(
            {
                "metric": "particle-steps/sec, 100k-point 3D surface NCA rollout",
                "value": value,
                "unit": "particle-steps/sec",
                "vs_baseline": value / NORTH_STAR,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
