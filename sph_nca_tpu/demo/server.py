"""Interactive SPH-NCA demo server (stdlib-only).

Role mirror of the reference's browser demo driver/UI
(docs/inference-worker.js + main.js): loads a weights JSON, steps the
numpy engine (or the JAX engine when available), streams RGBA frames to a
canvas page, and supports click-to-damage / click-to-seed brushes.

Run:
    python -m sph_nca_tpu.demo.server --weights_json gecko.json --size 64
then open http://localhost:8000/.
"""

from __future__ import annotations

import argparse
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .engine import NumpyEngine

STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")


class DemoState:
    """The simulation loop state shared with the HTTP handlers."""

    def __init__(self, args):
        self.lock = threading.Lock()
        # available weight files: the given file, or every *.json next
        # to it (reference UI's weights selector, main.js)
        wpath = args.weights_json
        wdir = os.path.dirname(os.path.abspath(wpath))
        self.weights_files = {
            os.path.splitext(f)[0]: os.path.join(wdir, f)
            for f in sorted(os.listdir(wdir))
            if f.endswith(".json")
        }
        self.current = dict(
            weights=os.path.splitext(os.path.basename(wpath))[0],
            size=args.size,
            pattern=getattr(args, "pattern", "square"),
            jitter=args.jitter,
            spatial_jitter=bool(getattr(args, "spatial_jitter", False)),
            color_mode=getattr(args, "color_mode", "rgba"),
        )
        self._build()

    def reconfigure(self, **kw):
        """Rebuild the engine with changed settings (reference UI's
        weights/resolution/pattern/noise selectors)."""
        allowed = {"weights", "size", "pattern", "jitter",
                   "spatial_jitter", "color_mode"}
        with self.lock:
            for k, v in kw.items():
                if k in allowed and v is not None:
                    if k == "size":
                        v = max(16, min(256, int(v)))
                    if k == "jitter":
                        v = max(0.0, min(1.0, float(v)))
                    if k == "color_mode" and v not in ("rgba", "activity"):
                        raise ValueError(f"unknown color_mode {v!r}")
                    self.current[k] = v
        if set(kw) == {"color_mode"}:
            return  # render-only setting: no engine rebuild
        self._build()

    def _build(self):
        wname = self.current["weights"]
        path = self.weights_files.get(wname)
        if path is None:
            raise ValueError(f"unknown weights {wname!r}")
        with open(path) as f:
            data = json.load(f)
        cfgj = data["config"]
        layers = sorted(data["layers"], key=lambda l: l["index"])
        weights = {
            "w1": np.asarray(layers[0]["weight"], np.float32).T,
            "b1": np.asarray(layers[0]["bias"], np.float32),
            "w2": np.asarray(layers[1]["weight"], np.float32).T,
            "b2": np.asarray(layers[1]["bias"], np.float32),
        }
        h = float(cfgj.get("h", 0.08))
        self.mode = cfgj.get("mode", "image")
        self.size = int(self.current["size"])
        self.channels = int(cfgj.get("input_features", 48)) // 3

        # particle point patterns (reference inference-worker.js:60-110 +
        # utils.js pointUtils): square or hexagonal lattice, with uniform
        # or spatially-varying jitter
        spacing = 2.0 / self.size
        if self.current["pattern"] == "hex":
            # rows at spacing*sqrt(3)/2, odd rows offset half a spacing
            # (utils.js createHexagonalGrid)
            vs = spacing * np.sqrt(3.0) / 2.0
            ny = int(np.ceil(2.0 / vs))
            pts = []
            for j in range(ny):
                row_off = spacing / 2.0 if j % 2 else 0.0
                nx = self.size - 1 if j % 2 else self.size
                xs = -1.0 + row_off + (np.arange(nx) + 0.5) * spacing
                ys = np.full(nx, -1.0 + (j + 0.5) * vs)
                pts.append(np.stack([xs, ys], -1))
            x = np.concatenate(pts).astype(np.float32)
            x = x[(x[:, 1] >= -1.0) & (x[:, 1] <= 1.0)]
        else:
            lin = (np.arange(self.size) + 0.5) / self.size * 2.0 - 1.0
            gx, gy = np.meshgrid(lin, lin, indexing="ij")
            x = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
        jit = float(self.current["jitter"])
        if jit > 0:
            rng = np.random.default_rng(0)
            noise = rng.uniform(-jit, jit, x.shape)
            if self.current["spatial_jitter"]:
                # noise grows across the domain (utils.js addSpatialNoise)
                fac = 0.5 * ((x[:, 0] + 1.0) / 2.0 + (x[:, 1] + 1.0) / 2.0)
                noise = noise * fac[:, None]
            x = x + noise.astype(np.float32) * spacing

        use_alpha = self.mode == "image"
        period = np.asarray([2.0, 2.0], np.float32) if not use_alpha else None
        self.engine = NumpyEngine(
            x,
            weights,
            h=h,
            fire_rate=float(cfgj.get("fire_rate", 0.5)),
            update_rule=cfgj.get("update_rule", "gated"),
            channels=self.channels,
            use_alpha=use_alpha,
            normalize_perception=1.0 / h,
            period=period,
            smoothing=cfgj.get("smoothing", "poly6"),
        )
        self.x = x
        self.reset()

    def reset(self):
        n = self.x.shape[0]
        if self.mode == "image":
            A = np.zeros((n, self.channels), np.float32)
            d2 = np.sum(self.x**2, -1)
            w = np.clip(1.0 - d2 / self.engine.h**2, 0, 1) ** 3
            A += w[:, None]
        else:
            A = np.random.default_rng(0).random(
                (n, self.channels), dtype=np.float32
            )
        with getattr(self, "lock", threading.Lock()):
            self.A = A
            self.step_count = 0

    def step(self):
        with self.lock:
            self.A = self.engine.step(self.A)
            self.step_count += 1

    def frame(self) -> bytes:
        with self.lock:
            rgba = self.engine.rgba(self.A)
        rgba = np.clip(rgba, 0.0, 1.0)
        if self.current.get("color_mode") == "activity":
            # grayscale of the activity channel (reference main.js:593)
            act = rgba[:, 3:4] if self.mode == "image" else \
                np.ones_like(rgba[:, :1])
            rgba = np.concatenate(
                [act, act, act, np.ones_like(act)], axis=-1
            )
        if rgba.shape[0] == self.size * self.size:
            img = rgba.reshape(self.size, self.size, 4)
        else:
            # non-square lattices (hex): splat points onto the canvas
            # (the reference renders a point scatter, main.js canvas)
            ij = np.clip(
                ((self.x + 1.0) / 2.0 * self.size).astype(np.int64),
                0, self.size - 1,
            )
            img = np.zeros((self.size, self.size, 4), np.float32)
            img[ij[:, 0], ij[:, 1]] = rgba
        if self.mode != "image":
            img[..., 3] = 1.0
        return (img * 255).astype(np.uint8).tobytes()

    def brush(self, cx: float, cy: float, radius: float, kind: str):
        """Click interaction (reference inference-worker.js:318-336)."""
        d2 = np.sum((self.x - np.asarray([cx, cy], np.float32)) ** 2, -1)
        mask = d2 < radius * radius
        with self.lock:
            if kind == "damage":
                self.A[mask] = 0.0
            else:  # seed
                w = np.clip(1.0 - d2[mask] / radius**2, 0, 1) ** 3
                self.A[mask] += w[:, None]


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                with open(os.path.join(STATIC_DIR, "index.html"), "rb") as f:
                    self._send(200, f.read(), "text/html")
            elif self.path.startswith("/frame"):
                state.step()
                meta = json.dumps(
                    {"size": state.size, "step": state.step_count}
                ).encode()
                body = (
                    len(meta).to_bytes(4, "little") + meta + state.frame()
                )
                self._send(200, body, "application/octet-stream")
            elif self.path.startswith("/reset"):
                state.reset()
                self._send(200, b"{}")
            elif self.path.startswith("/info"):
                self._send(200, json.dumps({
                    "current": state.current,
                    "mode": state.mode,
                    "n_particles": int(state.x.shape[0]),
                    "weights": sorted(state.weights_files),
                }).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n)) if n else {}
            if self.path.startswith("/brush"):
                state.brush(
                    float(req["x"]), float(req["y"]),
                    float(req.get("radius", 0.15)),
                    req.get("kind", "damage"),
                )
                self._send(200, b"{}")
            elif self.path.startswith("/config"):
                try:
                    state.reconfigure(**req)
                    self._send(200, b"{}")
                except (ValueError, KeyError) as e:
                    self._send(400, json.dumps(
                        {"error": str(e)}).encode())
            else:
                self._send(404, b"{}")

    return Handler


def record(state: DemoState, path: str, steps: int, frames: int) -> None:
    """Headless recording: step the engine and write a horizontal PNG
    strip of evenly-spaced frames (the demo's auditable-without-a-
    browser mode; the frames pass through the same frame() renderer the
    canvas UI streams)."""
    from ..utils.image import save_frame_png

    at = set(
        int(round(i * steps / max(1, frames - 1)))
        for i in range(frames)
    )
    panels = []

    def grab():
        raw = np.frombuffer(state.frame(), np.uint8)
        panels.append(
            raw.reshape(state.size, state.size, 4).astype(np.float32)
            / 255.0
        )

    if 0 in at:
        grab()
    for t in range(1, steps + 1):
        state.step()
        if t in at:
            grab()
    strip = np.concatenate(panels, axis=1)
    save_frame_png(path, strip)
    print(f"recorded {len(panels)} frames x {steps} steps -> {path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights_json", required=True)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--jitter", type=float, default=0.0)
    p.add_argument(
        "--pattern", choices=["square", "hex"], default="square",
        help="point lattice (reference pointPattern square/hexagonal)",
    )
    p.add_argument(
        "--spatial_jitter", action="store_true",
        help="jitter amplitude grows across the domain "
             "(reference spatiallyVaryingNoise)",
    )
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--color_mode", choices=["rgba", "activity"], default="rgba",
        help="render mode (reference main.js colorMode)",
    )
    p.add_argument(
        "--record", type=str, default="",
        help="headless mode: run --record_steps steps and write a PNG "
             "strip of --record_frames evenly-spaced frames to this "
             "path, then exit (no browser needed — auditable demo)",
    )
    p.add_argument("--record_steps", type=int, default=96)
    p.add_argument("--record_frames", type=int, default=6)
    args = p.parse_args(argv)

    state = DemoState(args)
    if args.record:
        record(state, args.record, args.record_steps, args.record_frames)
        return
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(state))
    print(f"demo at http://127.0.0.1:{args.port}/ "
          f"({state.mode} mode, {state.size}x{state.size})")
    server.serve_forever()


if __name__ == "__main__":
    main()
