"""Generate the golden numeric-parity fixture.

Runs the literal reference-math transcription (reference_forward.py) with
the reference's SHIPPED gecko weights (/root/reference/docs/weights/
gecko.json — trained by the reference authors, not by this repo) on a
small 2D particle grid, in float64, and records every intermediate.

Run from the repo root:  python tests/golden/make_fixture.py
Output: tests/golden/gecko_step_fixture.npz (committed).
"""

import json
import os

import numpy as np

from reference_forward import cell_activity, forward, volume

GECKO = "/root/reference/docs/weights/gecko.json"
OUT = os.path.join(os.path.dirname(__file__), "gecko_step_fixture.npz")


def main():
    w = json.load(open(GECKO))
    assert w["config"]["update_rule"] == "gated"
    h = float(w["config"]["h"])  # 0.1
    layers = w["layers"]
    w0 = np.asarray(layers[0]["weight"], np.float64)  # [256, 48]
    b0 = np.asarray(layers[0]["bias"], np.float64)
    w1 = np.asarray(layers[1]["weight"], np.float64)  # [33, 48]
    b1 = np.asarray(layers[1]["bias"], np.float64)
    c = 16

    # 24x24 grid over [-1, 1]^2 (web-demo layout, docs/main.js:264-270)
    n_side = 24
    lin = -1.0 + 2.0 * (np.arange(n_side) + 0.5) / n_side
    gx, gy = np.meshgrid(lin, lin, indexing="ij")
    x = np.stack([gx.ravel(), gy.ravel()], axis=-1)

    # deterministic mixed state: a seeded disk of structured values so the
    # alive mask has an interior, a boundary, and dead cells
    rng = np.random.default_rng(1234)
    A = rng.uniform(-0.5, 1.0, size=(x.shape[0], c))
    r2 = np.sum(x * x, axis=-1)
    A[r2 > 0.45**2] = 0.0
    A[:, 3] = np.where(r2 <= 0.45**2, 0.3 + 0.7 * rng.random(x.shape[0]), 0.0)

    v = volume(x, h)

    out1 = forward(x, v, A, h, (w0, b0, w1, b1), fire_rate=1.0)
    out2 = forward(x, v, out1["nA"], h, (w0, b0, w1, b1), fire_rate=1.0)

    np.savez_compressed(
        OUT,
        x=x,
        h=h,
        A0=A,
        v=v,
        prev_mask=out1["prev_mask"],
        gA=out1["gA"],
        y=out1["y"],
        dA=out1["dA"],
        new_mask=out1["new_mask"],
        nA1=out1["nA"],
        nA2=out2["nA"],
    )
    alive = (cell_activity(out1["nA"]) > 0.1).mean()
    print(
        f"fixture: n={x.shape[0]} alive_frac={alive:.3f} "
        f"|gA|max={np.abs(out1['gA']).max():.3f} -> {OUT}"
    )


def main_zebra():
    """Second fixture: the reference's shipped ZEBRA weights — a
    texture-mode model (use_alpha=False) on a WRAPPED periodic plane.
    Pins the minimum-image pair semantics (the reference's periodic
    hash grid + sample_plane wrap) and the no-alpha life-mask path,
    which the gecko fixture cannot exercise."""
    zebra = "/root/reference/docs/weights/zebra.json"
    out_path = os.path.join(
        os.path.dirname(__file__), "zebra_wrapped_fixture.npz"
    )
    w = json.load(open(zebra))
    assert w["config"]["mode"] == "texture"
    h = float(w["config"]["h"])  # 0.1
    layers = w["layers"]
    weights = (
        np.asarray(layers[0]["weight"], np.float64),
        np.asarray(layers[0]["bias"], np.float64),
        np.asarray(layers[1]["weight"], np.float64),
        np.asarray(layers[1]["bias"], np.float64),
    )
    c = 16

    # 20x20 jittered grid over the wrapped [-1, 1]^2 plane — jitter makes
    # pairs straddle the seam asymmetrically, so any wrap bug shows
    rng = np.random.default_rng(77)
    n_side = 20
    lin = -1.0 + 2.0 * (np.arange(n_side) + 0.5) / n_side
    gx, gy = np.meshgrid(lin, lin, indexing="ij")
    x = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    x = x + rng.uniform(-0.4, 0.4, x.shape) * (2.0 / n_side)
    # wrap positions into [-1, 1) like sample_plane's modulo
    period = np.array([2.0, 2.0])
    x = (x + 1.0) % 2.0 - 1.0

    A = rng.uniform(0.0, 1.0, size=(x.shape[0], c))

    v = volume(x, h, period)
    # texture demo contract: normalize_perception = 1/h
    kw = dict(use_alpha=False, normalize_perception=1.0 / h, period=period)
    out1 = forward(x, v, A, h, weights, **kw)
    out2 = forward(x, v, out1["nA"], h, weights, **kw)

    np.savez_compressed(
        out_path,
        x=x, h=h, A0=A, v=v,
        gA=out1["gA"], y=out1["y"], dA=out1["dA"],
        nA1=out1["nA"], nA2=out2["nA"],
    )
    print(
        f"zebra fixture: n={x.shape[0]} |gA|max="
        f"{np.abs(out1['gA']).max():.3f} -> {out_path}"
    )


if __name__ == "__main__":
    main()
    main_zebra()
