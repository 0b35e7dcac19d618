"""Demo server HTTP-level test (threaded server, real requests)."""

import json
import struct
import threading
import urllib.request

import numpy as np
import jax
import pytest

from sph_nca_tpu.demo.server import DemoState, make_handler
from sph_nca_tpu.io import save_weights_json
from sph_nca_tpu.models import SPHNCAConfig, init_params


@pytest.fixture
def server(tmp_path):
    from http.server import ThreadingHTTPServer

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=4.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.25, mode="image")

    class Args:
        weights_json = wpath
        size = 12
        jitter = 0.0

    state = DemoState(Args())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_frame_endpoint_steps_and_returns_pixels(server):
    base, state = server
    body = _get(base + "/frame")
    mlen = struct.unpack("<I", body[:4])[0]
    meta = json.loads(body[4 : 4 + mlen])
    assert meta["size"] == 12
    assert meta["step"] == 1
    px = np.frombuffer(body[4 + mlen :], np.uint8)
    assert px.shape == (12 * 12 * 4,)
    # second frame advances
    body = _get(base + "/frame")
    meta2 = json.loads(body[4 : 4 + struct.unpack("<I", body[:4])[0]])
    assert meta2["step"] == 2


def test_index_served(server):
    base, _ = server
    html = _get(base + "/").decode()
    assert "<canvas" in html


def test_brush_and_reset(server):
    base, state = server
    _get(base + "/frame")
    req = urllib.request.Request(
        base + "/brush",
        data=json.dumps({"x": 0.0, "y": 0.0, "kind": "damage",
                         "radius": 5.0}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10):
        pass
    assert np.allclose(state.A, 0.0)  # radius 5 wipes the whole domain
    _get(base + "/reset")
    assert state.step_count == 0
    assert not np.allclose(state.A, 0.0)


def test_hex_pattern_and_spatial_jitter(tmp_path):
    """Reference point-pattern parity: hexagonal lattice + spatially
    varying jitter (inference-worker.js:76, utils.js addSpatialNoise)."""
    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=4.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.25, mode="image")

    class Args:
        weights_json = wpath
        size = 12
        jitter = 0.3
        pattern = "hex"
        spatial_jitter = True

    state = DemoState(Args())
    x = state.x
    assert np.all(np.isfinite(x)) and x.shape[1] == 2
    # hex rows: two distinct row populations (offset rows one point short)
    ys = np.unique(np.round(x[:, 1], 3))
    assert len(ys) > 10
    # spatial jitter: displacement grows along the +x+y diagonal — ensured
    # statistically by the construction; just check bounds stay sane
    assert x.min() > -1.5 and x.max() < 1.5
    state.step()
    assert np.isfinite(state.A).all()
    assert len(state.frame()) == 12 * 12 * 4


def test_info_and_config_endpoints(server):
    """/info reports the current configuration; /config rebuilds the
    engine live (reference UI's weights/resolution/pattern selectors)."""
    url, state = server
    info = json.loads(urllib.request.urlopen(url + "/info").read())
    assert info["current"]["size"] == 12
    assert info["current"]["weights"] in info["weights"]
    n0 = info["n_particles"]

    req = urllib.request.Request(
        url + "/config",
        data=json.dumps({"size": 16, "pattern": "hex",
                         "jitter": 0.3}).encode(),
        method="POST",
    )
    urllib.request.urlopen(req)
    info2 = json.loads(urllib.request.urlopen(url + "/info").read())
    assert info2["current"]["size"] == 16
    assert info2["current"]["pattern"] == "hex"
    assert info2["n_particles"] != n0
    # frames still stream after reconfigure
    body = urllib.request.urlopen(url + "/frame").read()
    mlen = struct.unpack("<I", body[:4])[0]
    meta = json.loads(body[4 : 4 + mlen])
    assert meta["size"] == 16

    # unknown weights -> 400, state unchanged
    bad = urllib.request.Request(
        url + "/config", data=json.dumps({"weights": "nope"}).encode(),
        method="POST",
    )
    try:
        urllib.request.urlopen(bad)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_record_mode_and_color_mode(tmp_path):
    """Headless --record writes a PNG strip; color_mode=activity renders
    the activity channel as grayscale (reference main.js colorMode)."""
    from sph_nca_tpu.demo.server import record

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=4.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.25, mode="image")

    class Args:
        weights_json = wpath
        size = 12
        jitter = 0.0
        color_mode = "rgba"

    state = DemoState(Args())
    out = str(tmp_path / "strip.png")
    record(state, out, steps=4, frames=3)
    from PIL import Image

    img = Image.open(out)
    assert img.size == (3 * 12, 12)  # 3 frames side by side

    # color_mode is a render-only setting: no engine rebuild
    eng_before = state.engine
    state.reconfigure(color_mode="activity")
    assert state.engine is eng_before
    raw = np.frombuffer(state.frame(), np.uint8).reshape(12, 12, 4)
    assert np.all(raw[..., 0] == raw[..., 1])  # grayscale
    assert np.all(raw[..., 3] == 255)
    with pytest.raises(ValueError):
        state.reconfigure(color_mode="nope")
