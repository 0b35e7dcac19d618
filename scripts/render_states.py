"""Render a surface rollout's states.npz (cli/test.py --surface output)
to a PNG strip — orthographic point splat, z-sorted, RGBA from the
model's readout (reference to_rgba, nca.py:81-85). PIL only.

Usage: python scripts/render_states.py output/run/states.npz out.png \
           [--frames 0,32,64,96,128] [--size 420]
"""

import argparse
import sys

import numpy as np
from PIL import Image


def render_frame(x, A, size, elev_deg=20.0, azim_deg=30.0, splat=2):
    """x [N, 3], A [N, C] -> [size, size, 3] uint8 (white bg)."""
    rgb = np.clip(A[:, :3], 0.0, 1.0)
    alpha = np.clip(A[:, 3], 0.0, 1.0)
    # orthographic view: rotate, project to xy, sort back-to-front
    az, el = np.radians(azim_deg), np.radians(elev_deg)
    Rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(el), -np.sin(el)],
                   [0, np.sin(el), np.cos(el)]])
    p = x @ Rz.T @ Rx.T
    lo, hi = p[:, :2].min(0), p[:, :2].max(0)
    scale = (size - 8) / max(hi - lo)
    uv = ((p[:, :2] - lo) * scale + 4).astype(np.int32)
    order = np.argsort(p[:, 2])  # painter's: far first
    img = np.full((size, size, 3), 255, np.uint8)
    # simple lambertian-ish shade from depth for unpainted cells
    col = (rgb * alpha[:, None] + (1 - alpha[:, None]) * 0.92) * 255
    col = col.astype(np.uint8)
    for i in order:
        u, v = uv[i]
        img[max(0, v - splat) : v + splat + 1,
            max(0, u - splat) : u + splat + 1] = col[i]
    return img[::-1]  # y up


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("out")
    ap.add_argument("--frames", default="0,32,64,96,128")
    ap.add_argument("--size", type=int, default=420)
    args = ap.parse_args()

    d = np.load(args.npz)
    x, states = d["x"], d["states"]
    frames = [min(int(f), len(states) - 1)
              for f in args.frames.split(",")]
    tiles = [render_frame(x, states[f], args.size) for f in frames]
    strip = np.concatenate(tiles, axis=1)
    Image.fromarray(strip).save(args.out)
    print(f"wrote {args.out}: frames {frames}, {strip.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
