"""Round-4 follow-up A/Bs past the roofline grid (VERDICT r3 #2).

The grid (scripts/tpu_roofline.py) sweeps curve x far_buckets x unroll
x mlp_impl at the bench shape (100k points, batch 8). The remaining
levers are amortization knobs the grid holds fixed:

  * batch: 8 -> 16 lanes-packed rollouts. Per-particle MLP cost is
    flat (block-diagonal either way), but loop overhead, dispatch and
    layout residue (~2 ms/step in the round-3 accounting) amortize
    over 2x the particles, and the band/far table reads are shared
    across the whole lane batch.
  * unroll: 8 (the grid stops at 4).
  * donation: donate A0/t0/key so XLA can alias the scan carry
    in-place instead of double-buffering 420 MB of state.

Prints one JSON line per config, same schema as tpu_roofline.py.
Usage (TPU required): python scripts/tpu_extra.py [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fibonacci_sphere  # noqa: E402

N_POINTS = 102_400
STEPS = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default="runs/tpu_extra.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sph_nca_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.surface import (
        normalize,
        orthogonalize,
        rollout_mesh_batched,
    )
    from sph_nca_tpu.ops.bands import build_band_engine

    x_np = fibonacci_sphere(N_POINTS)
    area = 4.0 * np.pi * 0.8**2 / N_POINTS
    h = float(np.sqrt(30.0 * area / np.pi))
    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    nrm_np = x_np / np.linalg.norm(x_np, axis=-1, keepdims=True)

    grid = [
        dict(batch=8, unroll=2, donate=True),
        dict(batch=8, unroll=4, donate=True),
        dict(batch=8, unroll=6, donate=True),
        dict(batch=8, unroll=8, donate=True),
    ]

    # the engine is geometry-only (batch rides the activation lanes)
    eng = build_band_engine(
        x_np, h, table_dtype="bfloat16", curve="hilbert", far_buckets=16,
    )

    outf = open(args.out, "a")
    best = None
    for g in grid:
        B = g["batch"]
        A0 = jax.random.uniform(
            jax.random.key(1), (B, N_POINTS, cfg.channels)
        )
        nrm = jnp.asarray(nrm_np)
        t0r = jax.random.normal(jax.random.key(5), (B, N_POINTS, 3))
        tan0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)

        def roll_fn(e, A, t, key, _u=g["unroll"]):
            return rollout_mesh_batched(
                params, cfg, e, A, nrm, t, key, STEPS, h,
                mlp_dtype="bfloat16", unroll=_u,
            )[0]

        donate = (1, 2) if g["donate"] else ()
        roll = jax.jit(roll_fn, donate_argnums=donate)
        try:
            out = roll(eng, A0, tan0, jax.random.key(2))
            np.asarray(out.ravel()[:1])
            t_best = float("inf")
            for rep in range(args.reps):
                A_in = A0 if not g["donate"] else jax.random.uniform(
                    jax.random.key(11 + rep), (B, N_POINTS, cfg.channels)
                )
                t_in = tan0 if not g["donate"] else jax.vmap(
                    lambda t: orthogonalize(nrm, normalize(t))
                )(jax.random.normal(jax.random.key(21 + rep),
                                    (B, N_POINTS, 3)))
                jax.block_until_ready((A_in, t_in))
                t0s = time.perf_counter()
                np.asarray(
                    roll(eng, A_in, t_in, jax.random.key(3 + rep))
                    .ravel()[:1]
                )
                t_best = min(t_best, time.perf_counter() - t0s)
        except Exception as e:
            rec = {**g, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            outf.write(json.dumps(rec) + "\n")
            continue
        pps = B * N_POINTS * STEPS / t_best
        rec = {**g, "ms_per_step": 1e3 * t_best / STEPS, "pps": pps}
        print(json.dumps(rec), flush=True)
        outf.write(json.dumps(rec) + "\n")
        outf.flush()
        if best is None or pps > best[1]:
            best = (g, pps)
    if best:
        print(f"BEST: {best[0]} -> {best[1] / 1e6:.1f}M pps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
