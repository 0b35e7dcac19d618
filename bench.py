"""Headline benchmark: aggregate particle-steps/sec on 100k-particle 3D
surface NCA rollouts.

Mirrors BASELINE.json's metric ("particle-steps/sec on 100k-particle bunny
rollout"): a 102,400-point procedurally-generated closed surface (Fibonacci
sphere — same scale/structure class as the reference's FPS-sampled bunny,
test.py:36 default 25,600 points x4) rolled out with the flagship 16-channel
gated SPHNCA. The timed unit is the full NCA step (2 life-mask blurs +
gradient perception + 48->256->33 MLP + gated update, nca.py:87-117) inside
one jitted lax.scan.

The measured configuration is the batched-lane BAND engine (ops/bands.py):
8 independent rollouts of the same geometry packed into the TPU lane
dimension — the reference's own training batch size (train-example.sh:11)
— with bf16 true-pair tables and a bf16 update MLP. This is the framework's
aggregate-throughput path (training and fleet inference); the
single-rollout latency path (Pallas recompute kernels) is reported in
RESULTS.md.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
reported against the stated north-star target of 1e9 particle-steps/sec.

Tunnel robustness: the TPU here is reached through the axon relay, which
can be down for hours (jax.devices() then hangs indefinitely at backend
init). The benchmark probes the backend in a bounded subprocess with
retries across a configurable window; on persistent outage it emits a
structured outage record carrying the last driver-relevant measurement
instead of dying with a raw traceback.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
{"error", "value_is_last_good", ...} fields when the TPU was unreachable.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


N_POINTS = 102_400
BATCH = 8
# 128 = the reference test CLI's own rollout default (test.py:38
# --steps 128). Rounds 1-5a used 64, which under-amortized the axon
# tunnel's ~30-40 ms fixed per-call dispatch cost by ~0.4 ms/step
# (measured: 64/128/256 steps = 122.7/131.1/136.2M pps, same compiled
# step) — 128 matches the reference workload and reports the
# sustained-rollout rate.
STEPS = 128
NORTH_STAR = 1e9  # particle-steps/sec (BASELINE.json)

METRIC = (
    "particle-steps/sec, 100k-point 3D surface NCA rollouts "
    "(tangent perception + diffusion), batch 8 aggregate"
)
UNIT = "particle-steps/sec"

# Best verified driver-contract bench.py measurement (round 5,
# 2026-08-19, runs/bench_r5_128step.json: 131.6M on the real chip —
# split_d + bf16 pre-activations, 128-step rollouts). Reported —
# clearly flagged — only when the TPU is unreachable for the whole
# probe window.
LAST_GOOD = 131.6e6
LAST_GOOD_ROUND = 5

# Probe budget: attempts x (probe timeout + sleep). Overridable so a
# human can shorten it interactively.
PROBE_ATTEMPTS = int(os.environ.get("SPH_NCA_BENCH_PROBE_ATTEMPTS", "3"))
PROBE_TIMEOUT_S = float(os.environ.get("SPH_NCA_BENCH_PROBE_TIMEOUT", "60"))
PROBE_SLEEP_S = float(os.environ.get("SPH_NCA_BENCH_PROBE_SLEEP", "20"))


def fibonacci_sphere(n: int, radius: float = 0.8) -> np.ndarray:
    """Quasi-uniform points on a sphere surface, [n, 3] in [-1, 1]^3."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))  # golden angle
    y = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    pts = np.stack([r * np.cos(theta), y, r * np.sin(theta)], axis=-1)
    return (radius * pts).astype(np.float32)


def probe_tpu() -> bool:
    """True iff a fresh process can initialize the JAX backend and see a
    device within PROBE_TIMEOUT_S. Runs in a subprocess because a hung
    backend init cannot be cancelled in-process."""
    code = (
        "import jax; ds = jax.devices(); "
        "print('DEVICES', len(ds), ds[0].platform)"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=PROBE_TIMEOUT_S,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "DEVICES" in proc.stdout


def emit(payload: dict) -> None:
    print(json.dumps(payload))


def outage_record(detail: str) -> dict:
    return {
        "metric": METRIC,
        "value": LAST_GOOD,
        "unit": UNIT,
        "vs_baseline": LAST_GOOD / NORTH_STAR,
        "baseline_note": (
            "reference publishes no throughput numbers (BASELINE.md); "
            "denominator is the aspirational 1e9 pps north star for an "
            "8-chip v5p pod slice — this measurement is ONE v5e chip"
        ),
        "error": "tpu_unavailable",
        "value_is_last_good": True,
        "last_good": LAST_GOOD,
        "last_good_round": LAST_GOOD_ROUND,
        "detail": detail,
    }


def run_bench() -> float:
    import jax
    import jax.numpy as jnp

    from sph_nca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # CPU-keyed: no cross-host AOT reuse (SIGILL risk)

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.surface import (
        normalize,
        orthogonalize,
        rollout_mesh_batched,
    )
    from sph_nca_tpu.ops.bands import build_band_engine

    x_np = fibonacci_sphere(N_POINTS)
    # Support radius sized for ~30 neighbors on the surface disc
    # (demo shows 20-40 neighbors at its defaults, SURVEY.md §7).
    area_per_point = 4.0 * np.pi * 0.8**2 / N_POINTS
    h = float(np.sqrt(30.0 * area_per_point / np.pi))

    # Band engine (ops/bands.py): curve-ordered pair tables sized by
    # TRUE neighbor pairs, not 3^D cell windows — the round-3 compaction
    # of the candidate-pair waste (VERDICT r2 item 1).
    eng = build_band_engine(x_np, h, table_dtype="bfloat16")

    cfg = SPHNCAConfig(normalize_perception=1.0 / h)
    params = init_params(jax.random.key(0), cfg)
    # the TRUE surface step (reference sample_mesh, nca.py:338-381):
    # tangent-projected perception + per-step tangent diffusion —
    # not the cheaper plain-plane step
    nrm = jnp.asarray(x_np / np.linalg.norm(x_np, axis=-1, keepdims=True))

    # ONE jitted setup program for all input generations: under the
    # axon tunnel each eager op (uniform/normal/orthogonalize) pays its
    # own remote compile (measured 15-60 s apiece, 2026-08-19), eating
    # the watchdog's 900 s budget before warmup even starts.
    @jax.jit
    def fresh_inputs(seed):
        A = jax.random.uniform(
            jax.random.key(seed), (BATCH, N_POINTS, cfg.channels)
        )
        t0r_ = jax.random.normal(
            jax.random.key(seed + 100), (BATCH, N_POINTS, 3)
        )
        tan = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r_)
        return A, tan

    A0, tan0 = fresh_inputs(1)

    # unroll=4 + donated state/tangent carries: swept on the real chip
    # (runs/tpu_extra_0819.jsonl, re-swept post-split_d in
    # runs/tpu_extra_r5.jsonl: unroll 2/4/6/8 = 121.2/121.9/122.2/
    # 115.6M at 64 steps — 4 and 6 within noise, 8 regresses).
    roll = jax.jit(
        lambda e, A, t, key: rollout_mesh_batched(
            params, cfg, e, A, nrm, t, key, STEPS, h,
            mlp_dtype="bfloat16", unroll=4,
        )[0],
        donate_argnums=(1, 2),
    )

    # warmup/compile; force full completion with a host readback
    # (block_until_ready alone does not block under the axon tunnel)
    np.asarray(roll(eng, A0, tan0, jax.random.key(2)).ravel()[:1])
    print("BENCH_PROGRESS warmup_done", flush=True)

    # Emit the running-best after EVERY completed rep so a tunnel stall
    # mid-run loses only the remaining reps, not the whole measurement
    # (VERDICT r4 item 1a: round-4's driver bench stalled after warmup
    # and reported nothing).
    best = float("inf")
    for rep in range(3):
        A_in, t_in = fresh_inputs(3 + rep)  # donated buffers: one use each
        jax.block_until_ready((A_in, t_in))
        t0 = time.perf_counter()
        np.asarray(
            roll(eng, A_in, t_in, jax.random.key(3 + rep)).ravel()[:1]
        )
        best = min(best, time.perf_counter() - t0)
        print(f"BENCH_VALUE {BATCH * N_POINTS * STEPS / best}", flush=True)

    return BATCH * N_POINTS * STEPS / best


def run_bench_train() -> dict:
    """Training-step (BPTT) throughput at bench scale: the reference's
    hot loop is training (train.py:295-318), so parity claims need a
    measured TRAIN pps, not only forward rollouts (VERDICT r4 item 3).

    Measures one full optimizer iteration — batch-8, 100k-point,
    64-step band-engine rollout (training rollouts are 32-96 steps in
    the reference, train.py; 64 also bounds the remat carries to ~5 GB
    HBM), MSE-on-RGBA loss, BPTT (per-step remat) + Adam update — and
    the matching forward-only rollout for the fwd:bwd ratio. Run via
    `python bench.py --train` (auxiliary mode; the driver contract is
    the argless forward bench)."""
    TRAIN_STEPS = 64
    # scan-unroll A/B knob (forward bench gained ~2% at unroll=4; with
    # remat=True each unrolled step is still individually checkpointed,
    # so memory is unchanged). Swept on-chip 2026-08-19: see RESULTS.md.
    UNROLL = int(os.environ.get("SPH_NCA_TRAIN_UNROLL", "1"))
    import jax
    import jax.numpy as jnp
    import optax

    from sph_nca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.models.nca import to_rgba
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

    # one jitted setup program (see run_bench: eager setup ops each pay
    # a remote compile through the axon tunnel)
    @jax.jit
    def make_inputs(seed):
        t0r = jax.random.normal(
            jax.random.key(seed + 4), (BATCH, N_POINTS, 3)
        )
        tan = jax.vmap(lambda t: orthogonalize(nrm, normalize(t)))(t0r)
        A = jax.random.uniform(
            jax.random.key(seed), (BATCH, N_POINTS, cfg.channels)
        )
        tgt = jax.random.uniform(jax.random.key(seed + 6), (N_POINTS, 4))
        return A, tan, tgt

    A0, tan0, target = make_inputs(1)

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    # eng rides as a pytree ARGUMENT (like run_bench): closing over it
    # would embed the GB-scale tables as HLO constants, which the axon
    # remote-compile endpoint rejects (HTTP 413).
    def loss_fn(p, e, A, t, key):
        fA, _ = rollout_mesh_batched(
            p, cfg, e, A, nrm, t, key, TRAIN_STEPS, h,
            mlp_dtype="bfloat16", unroll=UNROLL, remat=True,
        )
        return jnp.mean((to_rgba(fA) - target[None]) ** 2)

    @jax.jit
    def train_step(p, s, e, A, t, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, e, A, t, key)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    fwd = jax.jit(
        lambda p, e, A, t, key: rollout_mesh_batched(
            p, cfg, e, A, nrm, t, key, TRAIN_STEPS, h,
            mlp_dtype="bfloat16", unroll=UNROLL, remat=True,
        )[0]
    )

    def bench_calls(fn, n_reps=3):
        best = float("inf")
        for rep in range(n_reps):
            t0 = time.perf_counter()
            out = fn(jax.random.key(30 + rep))
            # host readback forces completion under the axon tunnel
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
            print(f"BENCH_TRAIN_REP {rep} {time.perf_counter() - t0:.3f}s",
                  flush=True)
        return best

    # warmup/compile both programs
    p2, s2, loss0 = train_step(
        params, opt_state, eng, A0, tan0, jax.random.key(2)
    )
    np.asarray(loss0)
    np.asarray(fwd(params, eng, A0, tan0, jax.random.key(2)).ravel()[:1])

    t_train = bench_calls(
        lambda k: train_step(params, opt_state, eng, A0, tan0, k)[2]
    )
    t_fwd = bench_calls(lambda k: fwd(params, eng, A0, tan0, k))

    pps = BATCH * N_POINTS * TRAIN_STEPS / t_train
    return {
        "metric": (
            "train particle-steps/sec, 100k-point surface, batch 8, "
            "64-step BPTT (per-step remat) + Adam"
        ),
        "value": pps,
        "unit": "particle-steps/sec",
        "train_step_s": t_train,
        "fwd_rollout_s": t_fwd,
        "fwd_bwd_ratio": t_train / t_fwd,
        "loss0": float(loss0),
    }


def run_bench_watchdogged() -> tuple:
    """run_bench in a subprocess with a wall-clock budget — an axon
    tunnel that dies MID-benchmark stalls the rollout without raising,
    which an in-process try/except cannot catch.

    Streams the child's stdout and keeps the latest BENCH_VALUE line, so
    a stall after rep k still yields the best-of-k measurement (flagged
    partial) instead of losing the run. Returns (value, n_values, note).
    """
    import selectors
    import signal

    budget = float(os.environ.get("SPH_NCA_BENCH_BUDGET", "900"))
    proc = subprocess.Popen(
        [sys.executable, __file__],
        env={**os.environ, "SPH_NCA_BENCH_INNER": "1"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    deadline = time.monotonic() + budget
    latest, n_values = None, 0
    stalled = False
    buf = ""
    try:
        while True:
            remain = deadline - time.monotonic()
            if remain <= 0:
                stalled = True
                break
            if not sel.select(timeout=min(remain, 5.0)):
                if proc.poll() is not None:
                    break
                continue
            chunk = proc.stdout.read(4096)
            if not chunk:  # EOF: child exited (or closed stdout)
                break
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                if line.startswith("BENCH_VALUE "):
                    latest = float(line.split()[1])
                    n_values += 1
    finally:
        sel.close()
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
        try:
            _, err = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            err = ""

    if latest is not None:
        note = ""
        if stalled or n_values < 3:
            note = (
                f"partial: {n_values}/3 reps completed before "
                f"{'wall budget' if stalled else 'child exit'}"
            )
        return latest, n_values, note
    if stalled:
        raise subprocess.TimeoutExpired(cmd="bench inner", timeout=budget)
    raise RuntimeError(
        f"inner bench rc={proc.returncode}: {(err or '')[-400:]}"
    )


def main():
    if "--train" in sys.argv:
        emit(run_bench_train())
        return 0
    if os.environ.get("SPH_NCA_BENCH_INNER"):
        print(f"BENCH_VALUE {run_bench()}")
        return 0

    up = False
    for attempt in range(PROBE_ATTEMPTS):
        if probe_tpu():
            up = True
            break
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_SLEEP_S)
    if not up:
        emit(
            outage_record(
                f"backend init failed/hung in {PROBE_ATTEMPTS} probe "
                f"attempts of {PROBE_TIMEOUT_S:.0f}s each"
            )
        )
        return 0

    try:
        value, n_values, note = run_bench_watchdogged()
    except subprocess.TimeoutExpired:
        emit(outage_record("bench hung after probe OK (tunnel stalled "
                           "mid-run, no completed rep); budget exhausted"))
        return 0
    except Exception as e:  # tunnel died mid-run, OOM, etc.
        emit(outage_record(f"bench failed after probe OK: {e!r}"[:500]))
        return 0

    record = {
        "metric": METRIC,
        "value": value,
        "unit": UNIT,
        "vs_baseline": value / NORTH_STAR,
        "baseline_note": (
            "reference publishes no throughput numbers (BASELINE.md); "
            "denominator is the aspirational 1e9 pps north star for an "
            "8-chip v5p pod slice — this measurement is ONE v5e chip"
        ),
    }
    if note:
        record["detail"] = note
    emit(record)
    return 0


if __name__ == "__main__":
    sys.exit(main())
