"""Mesh utilities: OBJ parsing, surface sampling, FPS, PLY round-trip."""

import os

import numpy as np
import jax.numpy as jnp

from sph_nca_tpu.utils.meshes import (
    face_normals_areas,
    farthest_point_sampling,
    fibonacci_sphere,
    load_obj,
    load_ply_points,
    normalize_mesh,
    sample_surface,
    save_ply,
    sphere_normals,
    torus_points,
    vertex_normals,
)


CUBE_OBJ = """\
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 4 8 5 1
"""


def test_load_obj_triangulates(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    v, f = load_obj(str(p))
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)  # 6 quads -> 12 triangles
    _, areas = face_normals_areas(v, f)
    assert np.isclose(areas.sum(), 6 * 4.0)  # cube side 2 -> total area 24


def test_load_obj_slash_formats(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1 2/2/2 3//3\n")
    v, f = load_obj(str(p))
    assert f.tolist() == [[0, 1, 2]]


def test_normalize_mesh():
    v = np.asarray([[0, 0, 0], [4, 0, 0]], np.float32)
    out = normalize_mesh(v, scale=1.0)
    assert np.abs(out).max() <= 1.0 + 1e-6
    assert np.allclose(out.mean(0), 0.0, atol=1e-6)


def test_vertex_normals_sphereish():
    x = fibonacci_sphere(500, 1.0)
    # build a crude triangulation via convex hull? Not needed: test normals
    # on a regular tetrahedron instead.
    v = np.asarray(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], np.float32
    )
    f = np.asarray([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
    vn = vertex_normals(v, f)
    # vertex normals of a regular tet point outward along the vertex dir
    for i in range(4):
        d = v[i] / np.linalg.norm(v[i])
        assert np.dot(vn[i], d) > 0.9


def test_sample_surface_uniform():
    v = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 0, 1], [11, 0, 1], [10, 1, 1]],
        np.float32,
    )
    # two identical-size triangles -> ~equal sample counts
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    pts, fi, w = sample_surface(v, f, 4000)
    frac = (fi == 0).mean()
    assert 0.45 < frac < 0.55
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    # samples lie in the triangle planes
    assert np.all(pts[fi == 0][:, 2] == 0)


def test_fps_spreads_points():
    x = fibonacci_sphere(2000, 1.0)
    sel = np.asarray(farthest_point_sampling(jnp.asarray(x), 100))
    assert len(set(sel.tolist())) == 100
    sub = x[sel]
    # min pairwise distance of FPS set should far exceed that of the first
    # 100 points (which cluster at the pole)
    def min_pd(a):
        d = np.linalg.norm(a[None] - a[:, None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pd(sub) > 3 * min_pd(x[:100])


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    rgba = np.random.default_rng(1).random((50, 4)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    save_ply(p, pts, rgba)
    pts2, rgba2 = load_ply_points(p)
    assert np.allclose(pts, pts2)
    assert np.abs(rgba2 / 255.0 - rgba).max() < 1 / 254


def test_torus_points_on_surface():
    p, n = torus_points(1000)
    R, r = 0.6, 0.25
    ring = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
    d = np.sqrt((ring - R) ** 2 + p[:, 2] ** 2)
    assert np.allclose(d, r, atol=1e-5)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_sphere_normals():
    x = fibonacci_sphere(100, 0.8)
    n = sphere_normals(x)
    assert np.allclose(n, x / 0.8, atol=1e-5)
