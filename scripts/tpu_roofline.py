"""Single-chip roofline sweep for the 100k surface bench (VERDICT r3 #2).

Runs the bench.py configuration (102,400-point fibonacci sphere, batch 8,
bf16 tables + bf16 MLP, 64-step scan, tangent perception + fused
diffusion) across the named round-4 levers and prints one JSON line per
configuration:

  * mlp_impl: blockdiag (default) vs sublane (shared 1x-FLOP weights,
    lane<->sublane reshape cost) — SPH_NCA_MLP_IMPL plumbing
  * far_buckets: fewer width classes = fewer, larger far dots (the 16
    small far dots cost ~0.8 ms of dispatch/padding in round 3)
  * unroll: scan unroll factor (loop overhead ~0.5 ms)
  * curve: hilbert (round-4 default) vs morton

Usage (TPU required):
  python scripts/tpu_roofline.py [--quick]
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fibonacci_sphere  # noqa: E402 — same geometry as the bench

N_POINTS = 102_400
BATCH = 8
STEPS = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the headline A/Bs, not the full grid")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default="runs/roofline_sweep.jsonl")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry on CPU — validates the harness "
                         "plumbing without a TPU")
    args = ap.parse_args()

    global N_POINTS, BATCH, STEPS
    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        N_POINTS, BATCH, STEPS = 2048, 2, 4
        args.reps = 1
    jax.config.update("jax_compilation_cache_dir", "/tmp/sph_nca_jax_cache")

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
    A0 = jax.random.uniform(
        jax.random.key(1), (BATCH, N_POINTS, cfg.channels)
    )
    nrm = jnp.asarray(x_np / np.linalg.norm(x_np, axis=-1, keepdims=True))
    t0r = jax.random.normal(jax.random.key(5), (BATCH, N_POINTS, 3))
    tan0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)

    engines = {}

    def get_engine(curve, far_buckets):
        key = (curve, far_buckets)
        if key not in engines:
            engines[key] = build_band_engine(
                x_np, h, table_dtype="bfloat16", curve=curve,
                far_buckets=far_buckets,
            )
        return engines[key]

    if args.quick:
        grid = [
            dict(curve="hilbert", far_buckets=16, unroll=2,
                 mlp="blockdiag"),
            dict(curve="hilbert", far_buckets=16, unroll=2, mlp="sublane"),
            dict(curve="hilbert", far_buckets=8, unroll=2, mlp="blockdiag"),
            dict(curve="hilbert", far_buckets=4, unroll=2, mlp="blockdiag"),
            dict(curve="hilbert", far_buckets=16, unroll=4,
                 mlp="blockdiag"),
            dict(curve="morton", far_buckets=16, unroll=2,
                 mlp="blockdiag"),
        ]
    else:
        grid = [
            dict(curve=c, far_buckets=fb, unroll=u, mlp=m)
            for c, fb, u, m in itertools.product(
                ("hilbert", "morton"), (4, 8, 16), (1, 2, 4),
                ("blockdiag", "sublane"),
            )
        ]

    import sph_nca_tpu.models.cell_step as cs

    outf = open(args.out, "a")
    best = None
    for g in grid:
        eng = get_engine(g["curve"], g["far_buckets"])
        cs._MLP_IMPL_DEFAULT = g["mlp"]  # traced at jit time
        roll = jax.jit(
            lambda e, A, t, key, _u=g["unroll"]: rollout_mesh_batched(
                params, cfg, e, A, nrm, t, key, STEPS, h,
                mlp_dtype="bfloat16", unroll=_u,
            )[0]
        )
        try:
            np.asarray(roll(eng, A0, tan0, jax.random.key(2)).ravel()[:1])
            t_best = float("inf")
            for rep in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(
                    roll(eng, A0, tan0, jax.random.key(3 + rep)).ravel()[:1]
                )
                t_best = min(t_best, time.perf_counter() - t0)
        except Exception as e:
            rec = {**g, "error": repr(e)[:200]}
            print(json.dumps(rec), flush=True)
            outf.write(json.dumps(rec) + "\n")
            continue
        pps = BATCH * N_POINTS * STEPS / t_best
        rec = {**g, "ms_per_step": 1e3 * t_best / STEPS, "pps": pps}
        print(json.dumps(rec), flush=True)
        outf.write(json.dumps(rec) + "\n")
        outf.flush()
        if best is None or pps > best[1]:
            best = (g, pps)
        # jit caches keyed on the lambda identity pile up; drop them
        roll._clear_cache() if hasattr(roll, "_clear_cache") else None
    cs._MLP_IMPL_DEFAULT = os.environ.get("SPH_NCA_MLP_IMPL", "blockdiag")
    if best:
        print(f"BEST: {best[0]} -> {best[1] / 1e6:.1f}M pps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
