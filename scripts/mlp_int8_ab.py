"""Isolated A/B: int8 update-MLP vs the bf16 blockdiag default.

The last untried lever on the MLP wall (VERDICT r4 weak #3): TPU v5e's
MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394.7 vs 197 TOPS),
so IF XLA lowers int8 dots to the MXU and the per-step activation
quantization (states change every step; weights are loop-invariant)
doesn't eat the win, the 58%-of-device-time MLP chain could shrink.

Measures, at bench shape (rows=102400, B=8 lanes, hid=256, gated):
  * bf16      — the current default chain (two layer-1 dots + layer-2)
  * int8_w    — weights pre-quantized (free: loop-invariant), dynamic
                per-tensor activation quantization each call, int32
                accumulate, dequant + bias in f32
  * int8_raw  — pure int8 dots with quantization OUTSIDE the timed fn
                (upper bound: what the MXU alone would give)

Numerics note printed alongside: max |bf16 - int8_w| over the output,
as the fidelity gate (the NCA rollout is a recurrent system; drift
compounds over 128+ steps).

Usage: python scripts/mlp_int8_ab.py [--reps 30] [--rows 102400]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=30):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--rows", type=int, default=102400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sph_nca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.cell_step import _blockdiag_mlp_weights

    cfg = SPHNCAConfig()
    params = init_params(jax.random.key(0), cfg)
    b, f, c = 8, cfg.channels, cfg.channels
    rows = args.rows
    rng = np.random.default_rng(0)
    SB2 = jnp.asarray(rng.uniform(0, 1, (rows, b * f)), jnp.bfloat16)
    ga2 = jnp.asarray(rng.normal(0, 0.3, (rows, 2 * b * f)), jnp.bfloat16)

    w1x, b1x, w2x, b2x = _blockdiag_mlp_weights(
        params, b, f, c, "gated", jnp.bfloat16
    )
    w1a = w1x[0]
    w1g = w1x[1:].reshape(2 * b * f, w1x.shape[-1])

    @jax.jit
    def run_bf16(S, G):
        hmid = jnp.maximum(
            jnp.matmul(S, w1a) + jnp.matmul(G, w1g) + b1x, 0.0
        )
        return (jnp.matmul(hmid, w2x) + b2x).astype(jnp.bfloat16)

    # --- int8 weight quantization (per-output-column symmetric) ---
    def quant_w(w):
        w32 = np.asarray(w, np.float32)
        s = np.abs(w32).max(axis=0, keepdims=True) / 127.0
        s = np.where(s == 0, 1.0, s)
        q = np.clip(np.rint(w32 / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s, jnp.float32)

    qw1a, sw1a = quant_w(w1a)
    qw1g, sw1g = quant_w(w1g)
    qw2x, sw2x = quant_w(w2x)

    def quant_a(x):
        # per-tensor symmetric dynamic quantization (one pass + cast)
        s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
        q = jnp.clip(jnp.rint(x.astype(jnp.float32) / s), -127, 127).astype(
            jnp.int8
        )
        return q, s

    def idot(qa, qb, sa, sb):
        acc = jax.lax.dot_general(
            qa, qb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sa * sb)

    @jax.jit
    def run_int8_w(S, G):
        qS, sS = quant_a(S)
        qG, sG = quant_a(G)
        hmid = jnp.maximum(
            idot(qS, qw1a, sS, sw1a) + idot(qG, qw1g, sG, sw1g) + b1x, 0.0
        )
        qh, sh = quant_a(hmid)
        return (idot(qh, qw2x, sh, sw2x) + b2x).astype(jnp.bfloat16)

    qS0, sS0 = quant_a(SB2)
    qG0, sG0 = quant_a(ga2)
    qH0, _ = quant_a(jnp.maximum(jnp.matmul(SB2, w1a), 0.0))

    @jax.jit
    def run_int8_raw(qS, qG, qh):
        h = jax.lax.dot_general(
            qS, qw1a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + jax.lax.dot_general(
            qG, qw1g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o = jax.lax.dot_general(
            qh, qw2x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return h, o

    print("compiling + timing bf16 ...", flush=True)
    t_bf16 = bench(run_bf16, SB2, ga2, reps=args.reps)
    print(f"bf16 {t_bf16:.3f} ms; compiling + timing int8_w ...", flush=True)
    t_int8w = bench(run_int8_w, SB2, ga2, reps=args.reps)
    print(f"int8_w {t_int8w:.3f} ms; compiling + timing int8_raw ...",
          flush=True)
    t_raw = bench(run_int8_raw, qS0, qG0, qH0, reps=args.reps)

    ref = np.asarray(run_bf16(SB2, ga2), np.float32)
    got = np.asarray(run_int8_w(SB2, ga2), np.float32)
    err = np.abs(ref - got)
    rel = err.max() / (np.abs(ref).max() + 1e-8)

    print(f"rows={rows} reps={args.reps} device={jax.devices()[0]}")
    print(f"bf16 blockdiag chain : {t_bf16:8.3f} ms")
    print(f"int8 dynamic-quant   : {t_int8w:8.3f} ms   ({t_bf16 / t_int8w:.2f}x)")
    print(f"int8 raw dots only   : {t_raw:8.3f} ms   ({t_bf16 / t_raw:.2f}x)")
    print(f"numerics: max|d|={err.max():.4g} rel={rel:.4g} mean|d|={err.mean():.4g}")


if __name__ == "__main__":
    main()
