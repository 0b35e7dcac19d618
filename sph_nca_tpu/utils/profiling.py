"""Profiling and metrics — first-class observability (SURVEY.md §5).

The reference has a profiling decorator with zero call sites
(sphops/utils/__init__.py:24-29) and a tqdm loss bar; here:

  * `trace(logdir)`        — context manager around jax.profiler traces
                             (view in TensorBoard / xprof)
  * `StepTimer`            — wall-clock step timing with warmup skipping;
                             reports particle-steps/sec, the framework's
                             north-star metric
  * `MetricsLogger`        — append-only JSONL metrics (loss, lr, it/s),
                             the structured replacement for the
                             reference's tqdm bar (train.py:295,308)
  * `device_sync`          — force completion under PJRT tunnels where
                             block_until_ready is unreliable
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def select_platform(platform: str = "auto") -> None:
    """Pin the JAX platform BEFORE the first computation.

    ``auto`` leaves JAX's default resolution alone. Anything else (e.g.
    ``cpu``) is applied via ``jax.config.update("jax_platforms", ...)``
    — the JAX_PLATFORMS *env var* is ignored once a PJRT plugin (axon)
    is registered, and a downed tunnel makes backend init hang
    indefinitely, so the CLIs expose this as ``--platform cpu``."""
    p = platform or "auto"
    if p == "auto":
        p = os.environ.get("SPH_NCA_PLATFORM", "auto")
    if p != "auto":
        import jax

        jax.config.update("jax_platforms", p)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Point JAX at a persistent on-disk compilation cache so repeated
    CLI invocations (checkpoint-restart loops, eval sweeps) skip the
    20-60s remote compiles of tunneled PJRT backends."""
    import jax

    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/sph_nca_tpu/jax_cache"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlibs without the persistent cache: run uncached


def device_sync(x) -> None:
    """Force completion of a device computation.

    Under tunneled PJRT backends (axon) block_until_ready can return
    before execution finishes; a tiny host readback is authoritative.
    """
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sph_nca_trace"):
    """jax.profiler trace context: `with trace(dir): run_steps()`."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip.

    timer = StepTimer(num_particles=n, warmup=2)
    for ...: with timer: run_one_step()
    timer.summary() -> {steps, mean_ms, particle_steps_per_sec}
    """

    def __init__(self, num_particles: int = 0, warmup: int = 2):
        self.num_particles = num_particles
        self.warmup = warmup
        self.times: list = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        ts = self.times[self.warmup :] or self.times
        mean = float(np.mean(ts)) if ts else float("nan")
        out = {"steps": len(self.times), "mean_ms": mean * 1e3}
        if self.num_particles and mean > 0:
            out["particle_steps_per_sec"] = self.num_particles / mean
        return out


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        if self._fh is None:
            return
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)  # handles python/numpy/jax scalars
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
