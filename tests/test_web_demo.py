"""Standalone web demo (demo/web/) — algorithm + asset integrity tests.

No JS runtime exists in this image (no node/bun/quickjs), so the
browser build cannot be executed here. These tests instead validate:

  1. asset integrity — the manifest resolves, shipped weights parse in
     the interchange schema, the module graph references real files;
  2. the ALGORITHM of sphnca.js via a line-faithful Python
     transliteration (xorshift32 RNG, counting-sort CSR build,
     fire-mask-first MLP skip, [in][out] weight transposition), checked
     against demo/engine.py's NumpyEngine — the same cross-check role
     the numpy engine plays for the JAX engines.

The transliteration mirrors the JS loop-for-loop; if the JS and the
test drift apart, update both.
"""

import json
import os
import re

import numpy as np
import pytest

WEB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sph_nca_tpu", "demo", "web",
)


# ---------------------------------------------------------------------
# 1. asset integrity


def test_manifest_resolves():
    with open(os.path.join(WEB, "weights", "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest, "manifest must list at least one model"
    for name, rel in manifest.items():
        path = os.path.join(WEB, rel)
        assert os.path.exists(path), f"{name}: missing {rel}"
        with open(path) as f:
            w = json.load(f)
        assert "layers" in w and "config" in w
        layers = sorted(w["layers"], key=lambda l: l["index"])
        cfg = w["config"]
        nin, nh = cfg["input_features"], cfg["hidden_features"]
        nout = cfg["output_features"]
        assert np.asarray(layers[0]["weight"]).shape == (nh, nin)
        assert np.asarray(layers[1]["weight"]).shape == (nout, nh)
        assert cfg["mode"] in ("image", "texture")


def test_module_graph():
    with open(os.path.join(WEB, "index.html")) as f:
        html = f.read()
    assert 'new Worker("worker.js", { type: "module" })' in html
    assert "weights/manifest.json" in html
    with open(os.path.join(WEB, "worker.js")) as f:
        worker = f.read()
    assert re.search(r'import\s*{[^}]*Engine[^}]*}\s*from\s*"\./sphnca\.js"',
                     worker)
    with open(os.path.join(WEB, "sphnca.js")) as f:
        js = f.read()
    for export in ("export class Engine", "export function makePoints",
                   "export function makeRng"):
        assert export in js, f"missing {export}"
    # the demo is dependency-free: no CDN scripts, no tf.js
    assert "cdn" not in html.lower() and "tf.min.js" not in html
    # braces balance (cheap syntax smoke in lieu of a JS parser)
    for name, src in (("sphnca.js", js), ("worker.js", worker)):
        assert src.count("{") == src.count("}"), name
        assert src.count("(") == src.count(")"), name


# ---------------------------------------------------------------------
# 2. algorithm mirror (transliteration of sphnca.js)


def xorshift32(seed):
    s = (seed & 0xFFFFFFFF) or 0x9E3779B9

    def rng():
        nonlocal s
        s ^= (s << 13) & 0xFFFFFFFF
        s ^= s >> 17
        s ^= (s << 5) & 0xFFFFFFFF
        return s / 4294967296.0

    return rng


def make_points(size, pattern, jitter, spatial, rng):
    spacing = 2.0 / size
    pts = []
    if pattern == "hex":
        vs = spacing * np.sqrt(3.0) / 2.0
        ny = int(np.ceil(2.0 / vs))
        for j in range(ny):
            off = spacing / 2.0 if j % 2 else 0.0
            nx = size - 1 if j % 2 else size
            y = -1.0 + (j + 0.5) * vs
            if y < -1.0 or y > 1.0:
                continue
            for i in range(nx):
                pts += [-1.0 + off + (i + 0.5) * spacing, y]
    else:
        for i in range(size):
            for j in range(size):
                pts += [(i + 0.5) / size * 2.0 - 1.0,
                        (j + 0.5) / size * 2.0 - 1.0]
    x = np.asarray(pts, np.float32)
    if jitter > 0:
        for i in range(0, len(x), 2):
            amp = jitter
            if spatial:
                amp *= 0.5 * ((x[i] + 1.0) / 2.0 + (x[i + 1] + 1.0) / 2.0)
            x[i] += (rng() * 2 - 1) * amp * spacing
            x[i + 1] += (rng() * 2 - 1) * amp * spacing
    return x


def build_csr(x, h, periodic):
    """Counting-sort CSR build, mirroring sphnca.js buildCSR."""
    n = len(x) // 2
    dims = int(np.ceil(2.0 / h))
    nc = dims * dims
    h2 = h * h
    cell_of = np.zeros(n, np.int64)
    count = np.zeros(nc + 1, np.int64)
    for i in range(n):
        cx = int(np.floor(x[2 * i] / h)) % dims
        cy = int(np.floor(x[2 * i + 1] / h)) % dims
        c = cx * dims + cy
        cell_of[i] = c
        count[c + 1] += 1
    count = np.cumsum(count)
    bucket = np.zeros(n, np.int64)
    cursor = count[:nc].copy()
    for i in range(n):
        bucket[cursor[cell_of[i]]] = i
        cursor[cell_of[i]] += 1
    per = 2.0 if periodic else 0.0

    def visit(i):
        xi, yi = x[2 * i], x[2 * i + 1]
        cx, cy = int(np.floor(xi / h)), int(np.floor(yi / h))
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                gx = (cx + ox) % dims
                gy = (cy + oy) % dims
                c = gx * dims + gy
                for k in range(count[c], count[c + 1]):
                    j = int(bucket[k])
                    dx = x[2 * j] - xi
                    dy = x[2 * j + 1] - yi
                    if per:
                        dx -= np.round(dx / per) * per
                        dy -= np.round(dy / per) * per
                    d2 = dx * dx + dy * dy
                    if d2 < h2:
                        yield j, dx, dy, d2

    ptr = [0]
    idx, rx, ry, d2s = [], [], [], []
    for i in range(n):
        for j, dx, dy, d2 in visit(i):
            idx.append(j)
            rx.append(dx)
            ry.append(dy)
            d2s.append(d2)
        ptr.append(len(idx))
    return (np.asarray(ptr), np.asarray(idx), np.asarray(rx),
            np.asarray(ry), np.asarray(d2s))


class MirrorEngine:
    """Transliteration of sphnca.js Engine (fire-first variant)."""

    def __init__(self, x, wjson, seed=1):
        cfg = wjson["config"]
        layers = sorted(wjson["layers"], key=lambda l: l["index"])
        self.h = cfg.get("h", 0.08)
        self.mode = cfg.get("mode", "image")
        self.use_alpha = self.mode == "image"
        self.fire_rate = cfg.get("fire_rate", 0.5)
        self.update_rule = cfg.get("update_rule", "gated")
        self.C = cfg.get("input_features", 48) // 3
        self.x = x
        self.n = len(x) // 2
        self.rng = xorshift32(seed)
        # transpose [out][in] -> [in][out]
        self.w1 = np.asarray(layers[0]["weight"], np.float32).T
        self.b1 = np.asarray(layers[0]["bias"], np.float32)
        self.w2 = np.asarray(layers[1]["weight"], np.float32).T
        self.b2 = np.asarray(layers[1]["bias"], np.float32)

        ptr, idx, rx, ry, d2 = build_csr(x, self.h, not self.use_alpha)
        self.ptr, self.idx = ptr, idx
        sw = 4.0 / (np.pi * self.h**8)
        sg = 10.0 / (np.pi * self.h**5)
        ne = len(idx)
        self.wv = np.zeros(ne, np.float32)
        self.gvx = np.zeros(ne, np.float32)
        self.gvy = np.zeros(ne, np.float32)
        v = np.zeros(self.n, np.float32)
        for i in range(self.n):
            s = 0.0
            for e in range(ptr[i], ptr[i + 1]):
                q = self.h * self.h - d2[e]
                s += q * q * q
            v[i] = 1.0 / (sw * s)
        for i in range(self.n):
            for e in range(ptr[i], ptr[i + 1]):
                j = idx[e]
                q = self.h * self.h - d2[e]
                self.wv[e] = sw * q**3 * v[j]
                d = np.sqrt(d2[e])
                if 0 < d < self.h:
                    mag = 3.0 * (self.h - d) ** 2 / d
                    self.gvx[e] = sg * mag * rx[e] * v[j]
                    self.gvy[e] = sg * mag * ry[e] * v[j]
        self.A = np.zeros((self.n, self.C), np.float32)

    def life_mask(self, A):
        if not self.use_alpha:
            return np.ones(self.n, bool)
        al = (A[:, 3] > 0.1).astype(np.float32)
        out = np.zeros(self.n, bool)
        for i in range(self.n):
            s = 0.0
            for e in range(self.ptr[i], self.ptr[i + 1]):
                s += self.wv[e] * al[self.idx[e]]
            out[i] = s > 0.1
        return out

    def step(self, fire=None):
        C = self.C
        A = self.A
        pre = self.life_mask(A)
        nA = np.zeros_like(A)
        for i in range(self.n):
            fired = (self.rng() <= self.fire_rate if fire is None
                     else bool(fire[i]))
            if not fired:
                nA[i] = A[i]
                continue
            y = np.zeros(3 * C, np.float32)
            y[:C] = A[i]
            for e in range(self.ptr[i], self.ptr[i + 1]):
                j = self.idx[e]
                if self.gvx[e] == 0 and self.gvy[e] == 0:
                    continue
                dA = A[j] - A[i]
                y[C:2 * C] += dA * self.gvx[e]
                y[2 * C:] += dA * self.gvy[e]
            hid = np.maximum(y @ self.w1 + self.b1, 0.0)
            out = hid @ self.w2 + self.b2
            if self.update_rule == "gated":
                gate = 1.0 / (1.0 + np.exp(-out[:C]))
                mult = 1.0 / (1.0 + np.exp(-out[-1]))
                nA[i] = A[i] * gate + np.tanh(out[C:2 * C]) * mult
            else:
                nA[i] = A[i] + out[:C]
        if self.use_alpha:
            post = self.life_mask(nA)
            keep = pre & post
            self.A = nA * keep[:, None].astype(np.float32)
        else:
            self.A = nA
        return self.A


def _small_weights(C=16, hidden=32, rule="gated", mode="texture", h=0.25,
                   seed=3):
    rng = np.random.default_rng(seed)
    nin, nout = 3 * C, (2 * C + 1 if rule == "gated" else C)
    return {
        "layers": [
            {"index": 0,
             "weight": (rng.normal(0, 0.2, (hidden, nin))).tolist(),
             "bias": (rng.normal(0, 0.05, hidden)).tolist()},
            {"index": 2,
             "weight": (rng.normal(0, 0.2, (nout, hidden))).tolist(),
             "bias": (rng.normal(0, 0.05, nout)).tolist()},
        ],
        "config": {"input_features": nin, "hidden_features": hidden,
                   "output_features": nout, "fire_rate": 1.0,
                   "update_rule": rule, "h": h, "mode": mode},
    }


@pytest.mark.parametrize("mode,rule", [
    ("texture", "gated"), ("image", "gated"), ("texture", "orig"),
])
def test_js_mirror_matches_numpy_engine(mode, rule):
    """The JS algorithm (mirrored) == demo/engine.py on one step with
    fire_rate=1 (deterministic), both patterns of edge weights."""
    from sph_nca_tpu.demo.engine import NumpyEngine

    wjson = _small_weights(mode=mode, rule=rule)
    size = 12
    x = make_points(size, "square", 0.0, False, xorshift32(1))
    m = MirrorEngine(x, wjson)

    x2 = x.reshape(-1, 2)
    layers = sorted(wjson["layers"], key=lambda l: l["index"])
    weights = {
        "w1": np.asarray(layers[0]["weight"], np.float32).T,
        "b1": np.asarray(layers[0]["bias"], np.float32),
        "w2": np.asarray(layers[1]["weight"], np.float32).T,
        "b2": np.asarray(layers[1]["bias"], np.float32),
    }
    use_alpha = mode == "image"
    ref = NumpyEngine(
        x2, weights, h=wjson["config"]["h"], fire_rate=1.0,
        update_rule=rule, channels=16, use_alpha=use_alpha,
        normalize_perception=1.0 / wjson["config"]["h"],
        period=None if use_alpha else np.asarray([2.0, 2.0], np.float32),
    )

    # identical random initial state (+ alpha above the life threshold
    # for image mode so something survives)
    rng = np.random.default_rng(11)
    A0 = rng.random((m.n, 16)).astype(np.float32)
    m.A = A0.copy()
    out_mirror = m.step(fire=np.ones(m.n, bool))
    out_ref = ref.step(A0.copy())
    np.testing.assert_allclose(out_mirror, out_ref, rtol=2e-4, atol=2e-5)


def test_mirror_volume_matches_engine():
    """CSR pair weights (counting-sort build) == NumpyEngine's
    per-particle neighbor weights."""
    from sph_nca_tpu.demo.engine import NumpyEngine

    wjson = _small_weights(mode="texture")
    x = make_points(10, "hex", 0.0, False, xorshift32(1))
    m = MirrorEngine(x, wjson)
    ref = NumpyEngine(
        x.reshape(-1, 2),
        {"w1": np.zeros((48, 32), np.float32),
         "b1": np.zeros(32, np.float32),
         "w2": np.zeros((32, 33), np.float32),
         "b2": np.zeros(33, np.float32)},
        h=wjson["config"]["h"], channels=16, use_alpha=False,
        period=np.asarray([2.0, 2.0], np.float32),
    )
    for i in range(m.n):
        e0, e1 = m.ptr[i], m.ptr[i + 1]
        order = np.argsort(m.idx[e0:e1])
        ref_order = np.argsort(ref.nbrs[i])
        assert np.array_equal(m.idx[e0:e1][order], ref.nbrs[i][ref_order])
        np.testing.assert_allclose(
            m.wv[e0:e1][order], ref.wv[i][ref_order], rtol=1e-5)
        gv = np.stack([m.gvx[e0:e1], m.gvy[e0:e1]], -1)
        np.testing.assert_allclose(
            gv[order], ref.gv[i][ref_order], rtol=1e-4, atol=1e-6)


def test_fire_first_skip_is_exact():
    """Non-fired rows keep state exactly (the JS fire-first design)."""
    wjson = _small_weights(mode="texture")
    x = make_points(8, "square", 0.0, False, xorshift32(1))
    m = MirrorEngine(x, wjson)
    rng = np.random.default_rng(5)
    A0 = rng.random((m.n, 16)).astype(np.float32)
    m.A = A0.copy()
    fire = rng.random(m.n) < 0.5
    out = m.step(fire=fire)
    np.testing.assert_array_equal(out[~fire], A0[~fire])
    assert not np.allclose(out[fire], A0[fire])


def test_jittered_points_stay_bounded():
    rng = xorshift32(9)
    x = make_points(16, "square", 1.0, True, rng)
    spacing = 2.0 / 16
    assert np.all(np.abs(x) <= 1.0 + spacing)
    x0 = make_points(16, "square", 0.0, False, rng)
    assert np.max(np.abs(x.reshape(-1, 2) - x0.reshape(-1, 2))) > 0
