"""Profiling, metrics, batching utilities."""

import json

import numpy as np
import jax.numpy as jnp

from sph_nca_tpu.utils.batching import pack, pad_ragged, unpack
from sph_nca_tpu.utils.profiling import MetricsLogger, StepTimer


def test_pack_unpack_roundtrip(rng):
    xs = [jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
          for n in (5, 8, 3)]
    packed, sections = pack(*xs)
    assert packed.shape == (16, 3)
    assert sections == [5, 8, 3]
    back = unpack(packed, sections)
    for a, b in zip(back, xs):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_pad_ragged(rng):
    xs = [rng.normal(size=(n, 2)).astype(np.float32) for n in (4, 7)]
    dense, mask = pad_ragged(xs)
    assert dense.shape == (2, 7, 2)
    assert mask.sum() == 11
    assert np.allclose(dense[0, :4], xs[0])
    assert np.all(dense[0, 4:] == 0)


def test_step_timer():
    t = StepTimer(num_particles=100, warmup=1)
    import time

    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    # lower bound only: sleep guarantees >= 10ms, but a loaded shared CPU
    # can stretch wall time arbitrarily
    assert s["mean_ms"] > 5
    assert s["particle_steps_per_sec"] > 0


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(0, loss=1.5, lr=3e-3)
    log.log(1, loss=jnp.float32(1.2))
    log.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["loss"] == 1.5
    assert recs[1]["step"] == 1
    assert abs(recs[1]["loss"] - 1.2) < 1e-6
    # no-op logger
    MetricsLogger(None).log(0, loss=1.0)
