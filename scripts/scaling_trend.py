"""Measured multi-shard scaling trend for the band-engine halo path.

VERDICT r3 #5: back the SCALING.md efficiency projection with a measured
trend. On a virtual CPU mesh (one physical core — all shards timeshare,
so k-way WALLTIME measures total work: compute + comm + padding
overhead, not parallel speedup), roll the same fixed geometry at
k = 1/2/4/8 shards and record:

  * walltime/step of the sharded rollout (overhead trend: flat == the
    halo path adds no super-linear work as k grows),
  * far-exchange rows sent per shard (export fraction) and bytes/pass
    for BOTH exchange modes (targeted ppermute vs round-3 all_gather).

Writes one JSON line per configuration to stdout and a markdown table
to --out (default runs/scaling_trend.md).

Usage:
  python scripts/scaling_trend.py [--n 32768] [--steps 8] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fibonacci_sphere  # noqa: E402 — same geometry as the bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", type=str, default="runs/scaling_trend.md")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sph_nca_jax_cache")
    import jax.numpy as jnp

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.ops.bands import build_band_engine
    from sph_nca_tpu.ops.batched import batched_scatter
    from sph_nca_tpu.parallel import make_mesh
    from sph_nca_tpu.parallel.band_shard import (
        comm_bytes_per_pass,
        rollout_band_sharded,
        shard_band_engine,
    )

    x = fibonacci_sphere(args.n)
    area = 4.0 * np.pi * 0.8**2 / args.n
    h = float(np.sqrt(30.0 * area / np.pi))
    b = args.batch
    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)

    # one engine built at block_multiple=8 serves every k (8 % k == 0)
    eng = build_band_engine(x, h, table_dtype="float32", block_multiple=8)
    A = jax.random.uniform(
        jax.random.key(1), (b, args.n, cfg.channels)
    )
    SB = batched_scatter(eng, A)
    lanes = b * cfg.channels

    rows = []
    for k in (1, 2, 4, 8):
        rec = {"k": k, "n": args.n, "steps": args.steps}
        for mode in ("targeted", "allgather"):
            shards, static = shard_band_engine(eng, k, halo=mode)
            acc = comm_bytes_per_pass(shards, static, lanes=lanes,
                                      itemsize=4)
            mesh = make_mesh(jax.devices()[:k], data=1)
            roll = jax.jit(
                lambda sh, S: rollout_band_sharded(
                    params, cfg, sh, static, mesh, S, b,
                    jax.random.key(2), args.steps, h, remat=False,
                )
            )
            np.asarray(roll(shards, SB)).ravel()[:1]  # compile+run
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(roll(shards, SB)).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            rec[mode] = {
                "ms_per_step": 1e3 * best / args.steps,
                "export_fraction": acc["export_fraction"],
                "far_bytes": acc["allgather_bytes"],
                "ppermute_bytes": acc["ppermute_bytes"],
            }
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    base = rows[0]["targeted"]["ms_per_step"]
    lines = [
        "# Band halo scaling trend (virtual CPU mesh, 1 physical core)",
        "",
        f"n={args.n} sphere, batch {args.batch}, {args.steps} steps; "
        "walltime is TOTAL work (all shards timeshare one core) — flat "
        "ms/step means no super-linear halo overhead.",
        "",
        "| k | targeted ms/step | overhead vs k=1 | export frac "
        "(targeted) | far bytes (targeted) | allgather ms/step | "
        "export frac (allgather sent) | far bytes (allgather recv) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        t, a = r["targeted"], r["allgather"]
        lines.append(
            f"| {r['k']} | {t['ms_per_step']:.1f} | "
            f"{t['ms_per_step'] / base:.2f}x | "
            f"{t['export_fraction']:.3f} | {t['far_bytes']} | "
            f"{a['ms_per_step']:.1f} | {a['export_fraction']:.3f} | "
            f"{a['far_bytes']} |"
        )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
