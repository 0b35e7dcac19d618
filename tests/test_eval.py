"""Evaluation metrics + discretization sweep machinery."""

import numpy as np
import jax.numpy as jnp

from sph_nca_tpu.eval import psnr, render_points, ssim


def test_psnr():
    a = np.zeros((16, 16))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert np.isclose(psnr(a, b), 20.0, atol=1e-6)  # 10 log10(1/0.01)


def test_ssim_identity_and_noise(rng):
    a = rng.random((32, 32, 3))
    assert ssim(a, a) > 0.999
    b = rng.random((32, 32, 3))
    assert ssim(a, b) < 0.5
    # smooth degradation ranks correctly
    c = a + rng.normal(0, 0.05, a.shape)
    assert ssim(a, b) < ssim(a, c) < 1.0


def test_render_points_grid_exact(rng):
    """Rendering a matching-resolution regular grid reproduces the values."""
    from sph_nca_tpu.utils.geometry import grange

    m = 16
    x = np.asarray(
        grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    ).reshape(-1, 2)
    vals = rng.random((m * m, 4)).astype(np.float32)
    img = render_points(x, vals, m)
    assert np.allclose(img.reshape(-1, 4), vals, atol=1e-6)


def test_render_points_averages_in_bins():
    x = np.asarray([[-0.99, -0.99], [-0.98, -0.98]])  # same bin at 4x4
    vals = np.asarray([[0.0], [1.0]], np.float32)
    img = render_points(x, vals, 4)
    assert np.isclose(img[0, 0, 0], 0.5)


def test_density_sweep_runs_small():
    """End-to-end sweep with a tiny random model (sanity: shapes/finite)."""
    import jax

    from sph_nca_tpu.eval import density_sweep
    from sph_nca_tpu.models import SPHNCAConfig, init_params

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=1.0 / 0.25)
    params = init_params(jax.random.key(0), cfg)
    tgt = np.zeros((16, 16, 4), np.float32)
    tgt[4:12, 4:12] = 0.8
    res = density_sweep(
        params, cfg, 0.25, tgt,
        base_size=12, densities=(1.0, 2.0), steps=4,
    )
    assert len(res) == 2
    assert res[1]["n_particles"] > res[0]["n_particles"]
    for r in res:
        assert np.isfinite(r["psnr"]) and -1 <= r["ssim"] <= 1


def test_texture_stats_distance():
    from sph_nca_tpu.eval import texture_stats_distance

    rng = np.random.default_rng(0)
    # horizontal stripes vs itself (shifted) vs isotropic noise
    yy = np.linspace(0, 12 * np.pi, 64)[:, None]
    stripes = np.repeat((0.5 + 0.5 * np.sin(yy)) * np.ones((64, 64))[..., None], 3, -1)
    shifted = np.roll(stripes, 7, axis=0)
    noise = rng.random((64, 64, 3))

    same = texture_stats_distance(stripes, shifted)
    diff = texture_stats_distance(stripes, noise)
    assert same["spectrum_l1"] < 0.02
    assert diff["spectrum_l1"] > 5 * same["spectrum_l1"]
    assert diff["color_l1"] > same["color_l1"]


def test_texture_eval_smoke():
    """texture_eval runs end-to-end on a tiny model and emits calibrated
    baselines (self floor ~0, gray ceiling ~1 on spectrum)."""
    import jax

    from sph_nca_tpu.eval import texture_eval
    from sph_nca_tpu.models import SPHNCAConfig, init_params

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=5.0)
    params = init_params(jax.random.key(0), cfg)
    ex = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(
        np.float32
    )
    res = texture_eval(
        params, cfg, 0.2, ex, base_size=12, steps=2, densities=(1.0,),
        jitters=(0.0,), use_3d=False,
    )
    assert res["baseline_self"]["spectrum_l1"] < 1e-6
    assert res["baseline_gray"]["spectrum_l1"] > 0.5
    assert len(res["sweep"]) == 1
    for k in ("spectrum_l1", "color_l1"):
        assert np.isfinite(res["sweep"][0][k])
