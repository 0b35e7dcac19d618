"""Mesh loading, surface sampling, farthest-point sampling, PLY export.

Replaces the reference's external mesh deps (trimesh for OBJ/PLY,
fpsample for bucket-FPS — test.py:149-171) with self-contained
implementations, and the `commons/sampling.py` UniformSurfaceSampler with a
vectorized numpy version:

  * `load_obj`            — minimal OBJ parser (v / f, polygons triangulated)
  * `normalize_mesh`      — the reference's axis-swap/center/scale
                            (test.py:157-160)
  * `vertex_normals`      — area-weighted vertex normals (trimesh-equivalent
                            of mesh.vertex_normals after fix_normals)
  * `sample_surface`      — area-CDF + uniform barycentric sampling
                            (commons/sampling.py:1-53)
  * `farthest_point_sampling` — O(M*N) FPS as a jitted lax.fori_loop
                            (replaces fpsample.bucket_fps_kdline_sampling);
                            exact greedy FPS, trivially fast on TPU
  * `save_ply`            — binary PLY point-cloud export with per-point
                            RGBA (replaces trimesh.PointCloud.export,
                            test.py:248-263)
  * `fibonacci_sphere`, `torus_points` — procedural surfaces for tests and
                            benchmarks
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# OBJ loading + normalization
# ---------------------------------------------------------------------------


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (vertices [V, 3] f32, faces [F, 3] i32).

    Handles 'v' and 'f' records; f entries may be v, v/vt, v/vt/vn, v//vn;
    polygons are fan-triangulated; negative indices are supported.
    """
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(p) for p in parts[1:4]])
            elif parts[0] == "f":
                idx = []
                for p in parts[1:]:
                    vi = int(p.split("/")[0])
                    idx.append(vi - 1 if vi > 0 else len(verts) + vi)
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
    )


def normalize_mesh(
    v: np.ndarray, scale: float = 1.0, axis_swap: bool = True
) -> np.ndarray:
    """The reference's mesh normalization (test.py:157-160):
    axes [z, x, y], centered, max-|coord| scaled to ``scale``."""
    v = v[..., [2, 0, 1]] if axis_swap else v
    v = v - v.mean(axis=-2)
    v = v / np.abs(v).max()
    return (v * scale).astype(np.float32)


def face_normals_areas(
    v: np.ndarray, f: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face unit normals [F, 3] and areas [F]."""
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    cr = np.cross(e1, e2)
    nrm = np.linalg.norm(cr, axis=-1)
    area = 0.5 * nrm
    n = cr / np.maximum(nrm, 1e-20)[:, None]
    return n.astype(np.float32), area.astype(np.float32)


def vertex_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals [V, 3] (trimesh-equivalent)."""
    fn, area = face_normals_areas(v, f)
    vn = np.zeros_like(v)
    w = fn * area[:, None]
    for c in range(3):
        np.add.at(vn, f[:, c], w)
    nrm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(nrm, 1e-20)).astype(np.float32)


# ---------------------------------------------------------------------------
# Surface sampling (reference commons/sampling.py UniformSurfaceSampler)
# ---------------------------------------------------------------------------


def sample_surface(
    v: np.ndarray,
    f: np.ndarray,
    n: int,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Uniform area-weighted surface samples.

    Returns (points [n, 3], face_idx [n], barycentric [n, 3]) — the same
    triple as the reference sampler (commons/sampling.py:34-53: area CDF +
    searchsorted + uniform barycentric via sqrt trick).
    """
    rng = rng if rng is not None else np.random.default_rng(0)
    _, area = face_normals_areas(v, f)
    cdf = np.cumsum(area)
    cdf = cdf / cdf[-1]
    fi = np.searchsorted(cdf, rng.random(n))
    # uniform barycentric: u = 1-sqrt(r1), w2 = r2*sqrt(r1)
    r1 = np.sqrt(rng.random(n)).astype(np.float32)
    r2 = rng.random(n).astype(np.float32)
    w = np.stack([1.0 - r1, r1 * (1.0 - r2), r1 * r2], axis=-1)
    tri = v[f[fi]]  # [n, 3, 3]
    pts = np.einsum("nc,ncd->nd", w, tri).astype(np.float32)
    return pts, fi.astype(np.int64), w


# ---------------------------------------------------------------------------
# Farthest-point sampling (replaces fpsample, test.py:171)
# ---------------------------------------------------------------------------


def farthest_point_sampling(
    x: Array, m: int, start: int = 0
) -> Array:
    """Greedy FPS: select m indices from x [N, D] maximizing coverage.

    Exact O(m*N) greedy algorithm as a jitted fori_loop — each iteration is
    one [N, D] distance update + argmax, which the TPU VPU does in
    microseconds (the reference needs a specialized KD-bucket library on
    CPU for the same job).
    """
    x = jnp.asarray(x)
    n = x.shape[0]

    def body(i, state):
        sel, mind = state
        last = x[sel[i - 1]]
        d2 = jnp.sum((x - last) ** 2, axis=-1)
        mind = jnp.minimum(mind, d2)
        nxt = jnp.argmax(mind)
        sel = sel.at[i].set(nxt)
        return sel, mind

    sel0 = jnp.zeros((m,), jnp.int32).at[0].set(start)
    mind0 = jnp.full((n,), jnp.inf, x.dtype)
    sel, _ = jax.lax.fori_loop(1, m, body, (sel0, mind0))
    return sel


# ---------------------------------------------------------------------------
# PLY export (replaces trimesh.PointCloud.export, test.py:248-263)
# ---------------------------------------------------------------------------


def save_ply(path: str, points: np.ndarray, rgba: np.ndarray) -> None:
    """Binary-little-endian PLY with x/y/z float + rgba uchar."""
    points = np.asarray(points, np.float32)
    rgba = np.asarray(rgba)
    if rgba.dtype != np.uint8:
        rgba = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
    if rgba.shape[-1] == 3:
        rgba = np.concatenate(
            [rgba, np.full_like(rgba[:, :1], 255)], axis=-1
        )
    n = points.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\nend_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[
            ("xyz", np.float32, 3),
            ("rgba", np.uint8, 4),
        ],
    )
    rec["xyz"] = points
    rec["rgba"] = rgba
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        fh.write(rec.tobytes())


def load_ply_points(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read back a PLY written by save_ply -> (points, rgba)."""
    with open(path, "rb") as fh:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += fh.readline()
        n = int(
            [l for l in header.decode().splitlines() if l.startswith("element")][
                0
            ].split()[-1]
        )
        rec = np.frombuffer(
            fh.read(),
            dtype=[("xyz", np.float32, 3), ("rgba", np.uint8, 4)],
            count=n,
        )
    return rec["xyz"].copy(), rec["rgba"].copy()


# ---------------------------------------------------------------------------
# Procedural surfaces (tests / benchmarks)
# ---------------------------------------------------------------------------


def fibonacci_sphere(n: int, radius: float = 0.8) -> np.ndarray:
    """Quasi-uniform points on a sphere surface, [n, 3]."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    pts = np.stack([r * np.cos(theta), y, r * np.sin(theta)], axis=-1)
    return (radius * pts).astype(np.float32)


def sphere_normals(x: np.ndarray) -> np.ndarray:
    n = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return n.astype(np.float32)


def torus_points(
    n: int, R: float = 0.6, r: float = 0.25, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Quasi-uniform torus samples -> (points [n, 3], normals [n, 3])."""
    rng = np.random.default_rng(seed)
    pts, nrm = [], []
    while sum(len(p) for p in pts) < n:
        m = 2 * n
        u = rng.random(m) * 2 * np.pi
        v = rng.random(m) * 2 * np.pi
        # rejection-sample for uniform area: accept with p ~ R + r cos v
        acc = rng.random(m) < (R + r * np.cos(v)) / (R + r)
        u, v = u[acc], v[acc]
        cx = (R + r * np.cos(v)) * np.cos(u)
        cy = (R + r * np.cos(v)) * np.sin(u)
        cz = r * np.sin(v)
        pts.append(np.stack([cx, cy, cz], -1))
        nrm.append(
            np.stack(
                [np.cos(v) * np.cos(u), np.cos(v) * np.sin(u), np.sin(v)], -1
            )
        )
    p = np.concatenate(pts)[:n].astype(np.float32)
    nn = np.concatenate(nrm)[:n].astype(np.float32)
    return p, nn
