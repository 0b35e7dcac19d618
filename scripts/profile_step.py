"""Trace one bench-configuration rollout on the real chip and dump
per-op device self-times (via scripts/xplane_ops.py's parser).

Targets the 125M/chip roofline residue (VERDICT r4 item 2): attributes
the measured ms/step to named HLO fusions so the layout/gather residue
and far-dot overhead can be chased op by op.

Usage:  python scripts/profile_step.py [--steps 64] [--train]
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, N_POINTS, fibonacci_sphere  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--logdir", default="/tmp/sph_nca_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--unroll", type=int, default=4)
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
    area_per_point = 4.0 * np.pi * 0.8**2 / N_POINTS
    h = float(np.sqrt(30.0 * area_per_point / np.pi))
    eng = build_band_engine(x_np, h, table_dtype="bfloat16")

    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    nrm = jnp.asarray(x_np / np.linalg.norm(x_np, axis=-1, keepdims=True))
    t0r = jax.random.normal(jax.random.key(5), (BATCH, N_POINTS, 3))
    tan0 = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)
    A0 = jax.random.uniform(
        jax.random.key(1), (BATCH, N_POINTS, cfg.channels)
    )

    if args.train:
        import optax

        from sph_nca_tpu.models.nca import to_rgba

        target = jax.random.uniform(jax.random.key(7), (N_POINTS, 4))
        opt = optax.adam(2e-3)
        opt_state = opt.init(params)

        def loss_fn(p, e, A, t, key):
            fA, _ = rollout_mesh_batched(
                p, cfg, e, A, nrm, t, key, args.steps, h,
                mlp_dtype="bfloat16", unroll=1, remat=True,
            )
            return jnp.mean((to_rgba(fA) - target[None]) ** 2)

        @jax.jit
        def run(p, s, e, A, t, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, e, A, t, key)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates)[  # any leaf to sync
                "w1"
            ] if isinstance(p, dict) else loss

        def call(key):
            return run(params, opt_state, eng, A0, tan0, key)
    else:
        roll = jax.jit(
            lambda e, A, t, key: rollout_mesh_batched(
                params, cfg, e, A, nrm, t, key, args.steps, h,
                mlp_dtype="bfloat16", unroll=args.unroll,
            )[0]
        )

        def call(key):
            return roll(eng, A0, tan0, key)

    # warmup/compile
    np.asarray(jax.tree_util.tree_leaves(call(jax.random.key(2)))[0]
               .ravel()[:1])

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    out = call(jax.random.key(3))
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    per_step = wall / args.steps
    print(f"WALL {wall:.4f}s for {args.steps} steps = "
          f"{per_step * 1e3:.3f} ms/step = "
          f"{BATCH * N_POINTS * args.steps / wall / 1e6:.1f}M pps")

    latest = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*")))[-1]
    pb = glob.glob(os.path.join(latest, "*.xplane.pb"))[0]
    os.execv(sys.executable, [
        sys.executable, os.path.join(os.path.dirname(__file__),
                                     "xplane_ops.py"),
        pb, "--plane", "TPU", "--line", "XLA Ops",
        "--merge", "--top", str(args.top),
    ])


if __name__ == "__main__":
    sys.exit(main())
