"""IO tests: weights JSON interchange + checkpoint round-trips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_nca_tpu.io import (
    load_checkpoint,
    load_weights_json,
    save_checkpoint,
    save_weights_json,
)
from sph_nca_tpu.models import SPHNCAConfig, init_params

REF_WEIGHTS = "/root/reference/docs/weights"


def test_weights_json_roundtrip(tmp_path):
    cfg = SPHNCAConfig(channels=8, hidden=16)
    p = init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "w.json")
    save_weights_json(path, p, cfg, h=0.1, mode="image")
    m = load_weights_json(path)
    assert m.cfg.channels == 8
    assert m.cfg.hidden == 16
    assert m.h == 0.1
    assert m.mode == "image"
    for a, b in zip(m.params, p):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # reference JSONs carry no smoothing key -> default
    assert m.cfg.smoothing == "poly6"


def test_weights_json_roundtrips_smoothing(tmp_path):
    """Wendland-trained checkpoints must render with their own kernel
    in the demos (the JSON is the demo interchange)."""
    cfg = SPHNCAConfig(channels=8, hidden=16, smoothing="wendlandC2")
    p = init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "w.json")
    save_weights_json(path, p, cfg, h=0.1, mode="texture")
    m = load_weights_json(path)
    assert m.cfg.smoothing == "wendlandC2"


@pytest.mark.skipif(
    not os.path.exists(f"{REF_WEIGHTS}/gecko.json"),
    reason="reference weights not available",
)
def test_load_reference_shipped_weights():
    """All shipped pretrained models must import cleanly."""
    import glob

    for path in glob.glob(f"{REF_WEIGHTS}/*.json"):
        m = load_weights_json(path)
        assert m.params.w1.shape == (m.cfg.in_features, m.cfg.hidden)
        assert m.params.w2.shape == (m.cfg.hidden, m.cfg.out_features)
        assert m.cfg.channels == 16


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    import optax

    from sph_nca_tpu.training import TrainConfig, make_optimizer

    cfg = SPHNCAConfig(channels=4, hidden=8)
    p = init_params(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3)
    st = opt.init(p)
    # take one update so opt state is non-trivial
    g = jax.tree.map(jnp.ones_like, p)
    up, st = opt.update(g, st, p)
    p2 = optax.apply_updates(p, up)

    path = str(tmp_path / "ck")
    save_checkpoint(
        path, params=p2, model_cfg=cfg, h=0.08, step=7, loss=1.5,
        opt_state=st, train_cfg=TrainConfig(),
        seed_x=np.zeros((3, 2), np.float32), seed_A=np.ones((3, 4), np.float32),
    )
    ck = load_checkpoint(path)
    assert ck["step"] == 7
    assert ck["h"] == 0.08
    assert ck["model_cfg"] == cfg
    for a, b in zip(ck["params"], p2):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert ck["seed_A"].shape == (3, 4)
    # opt state restores onto a fresh template
    from sph_nca_tpu.io import restore_opt_state

    st2 = restore_opt_state(opt.init(ck["params"]), ck["opt_state"])
    leaves1 = jax.tree.leaves(st)
    leaves2 = jax.tree.leaves(st2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        assert np.allclose(np.asarray(a), np.asarray(b))
