"""Isolated A/B of the update-MLP implementations on the real chip.

Times just the MLP chain (the 1.82 ms/step roofline item) at bench
shape: rows=102400, B=8, F=16, hid=256, gated. Compares:
  * blockdiag — the expanded 8x-redundant lane GEMMs (current default)
  * pallas    — ops/pallas/mlp_kernel.mlp_fused

Usage: python scripts/mlp_kernel_ab.py [--reps 30] [--tile 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--rows", type=int, default=102400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sph_nca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.cell_step import _blockdiag_mlp_weights
    from sph_nca_tpu.ops.pallas.mlp_kernel import mlp_fused

    cfg = SPHNCAConfig()
    params = init_params(jax.random.key(0), cfg)
    b, f, c = 8, cfg.channels, cfg.channels
    rows = args.rows
    ydt = jnp.bfloat16
    rng = np.random.default_rng(0)
    SB2 = jnp.asarray(rng.uniform(0, 1, (rows, b * f)), ydt)
    ga2 = jnp.asarray(rng.normal(0, 0.3, (rows, 2 * b * f)), ydt)
    scale = jnp.float32(1.0)

    # --- blockdiag chain (as in _update_core) ---
    w1x, b1x, w2x, b2x = _blockdiag_mlp_weights(params, b, f, c, "gated", ydt)
    w1a = w1x[0]
    w1g = w1x[1:].reshape(2 * b * f, w1x.shape[-1])

    @jax.jit
    def run_blockdiag(S, G):
        hmid = jnp.maximum(
            jnp.matmul(S, w1a) + jnp.matmul(G, w1g) + b1x, 0.0
        )
        return jnp.matmul(hmid, w2x).astype(jnp.float32) + b2x

    # --- pallas chain ---
    w1 = params.w1.astype(ydt)
    w1k = jnp.concatenate([w1[:f], scale * w1[f:]], axis=0)
    b1 = params.b1.astype(jnp.float32)[None]
    w2 = params.w2.astype(ydt)
    b2 = params.b2.astype(jnp.float32)[None]

    @jax.jit
    def run_pallas(S, G):
        g, d, m = mlp_fused(S, G, w1k, b1, w2, b2, b, f, args.tile)
        return jnp.concatenate([g, d, m], axis=-1)

    def bench(fn, name):
        out = fn(SB2, ga2)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(SB2, ga2)
        np.asarray(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name}: {dt * 1e3:.3f} ms")
        return out, dt

    o1, t1 = bench(run_blockdiag, "blockdiag")
    o2, t2 = bench(run_pallas, f"pallas(tile={args.tile})")
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"max abs diff: {err:.2e}   speedup: {t1 / t2:.2f}x")


if __name__ == "__main__":
    sys.exit(main())
