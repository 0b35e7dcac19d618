"""Evaluation: PSNR/SSIM + the discretization-generalization study.

The reference's only published quantitative results are PSNR/SSIM of
rollouts across resampled particle densities (abstract.pdf p.2 Fig.3,
BASELINE.md): a model trained once on a regular grid is rolled out on
0.5x..4x-density resamplings and the rendered output is compared to the
target. This module reproduces that study natively:

  * psnr / ssim           — standard image metrics (SSIM per Wang et al.,
                            gaussian-windowed, as in the original study)
  * render_points         — splat a particle rollout to an image for
                            comparison (nearest-grid binning average)
  * density_sweep         — train-once/generate-anywhere: rollout one
                            model over resampled grids and jittered point
                            sets at several densities, report PSNR/SSIM
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _gaussian_kernel1d(sigma: float = 1.5, radius: int = 5) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filter over the first two axes."""
    from numpy.lib.stride_tricks import sliding_window_view

    r = len(k1d)
    win = sliding_window_view(img, r, axis=0)
    img = np.tensordot(win, k1d, axes=([-1], [0]))
    win = sliding_window_view(img, r, axis=1)
    return np.tensordot(win, k1d, axes=([-1], [0]))


def ssim(
    a: np.ndarray,
    b: np.ndarray,
    peak: float = 1.0,
    sigma: float = 1.5,
) -> float:
    """Structural similarity (mean over channels/windows), Wang et al. 2004."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    k = _gaussian_kernel1d(sigma)
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = _filter2d(x, k)
        mu_y = _filter2d(y, k)
        xx = _filter2d(x * x, k) - mu_x**2
        yy = _filter2d(y * y, k) - mu_y**2
        xy = _filter2d(x * y, k) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def render_points(
    x: np.ndarray,
    rgba: np.ndarray,
    out_size: int,
    gmin=(-1.0, -1.0),
    gsize=(2.0, 2.0),
) -> np.ndarray:
    """Average-splat particles to an [out_size, out_size, C] image.

    The evaluation renderer for irregular point sets (regular grids at
    matching resolution reduce to an exact reshape).
    """
    x = np.asarray(x)
    rgba = np.asarray(rgba)
    gmin = np.asarray(gmin, np.float64)
    gsize = np.asarray(gsize, np.float64)
    ij = np.floor((x - gmin) / gsize * out_size).astype(np.int64)
    ij = np.clip(ij, 0, out_size - 1)
    flat = ij[:, 0] * out_size + ij[:, 1]
    acc = np.zeros((out_size * out_size, rgba.shape[-1]), np.float64)
    cnt = np.zeros(out_size * out_size, np.float64)
    np.add.at(acc, flat, rgba)
    np.add.at(cnt, flat, 1.0)
    cnt = np.maximum(cnt, 1.0)
    return (acc / cnt[:, None]).reshape(out_size, out_size, -1).astype(
        np.float32
    )


def rollout_on_points(
    params,
    cfg,
    x2: Array,
    h: float,
    steps: int,
    key,
    *,
    use_3d: bool = True,
    seed_radius: Optional[float] = None,
    period=None,
    randomized: bool = False,
) -> np.ndarray:
    """Build the engine for an arbitrary 2D point set and roll out.

    Returns final rgba [N, 4]. This is the 'generate anywhere' entry:
    any discretization, same trained weights.
    """
    from .models import to_rgba
    from .models.cell_step import rollout_cells_batched
    from .ops.bands import build_band_engine
    from .ops.batched import batched_gather_back, batched_scatter
    from .utils.seeds import plane_seed

    x = jnp.pad(x2, ((0, 0), (0, 1))) if use_3d else x2
    # the flagship band engine (f32 tables: evaluation numerics)
    eng = build_band_engine(
        np.asarray(x), h, period=period, table_dtype="float32",
        smoothing=getattr(cfg, "smoothing", "poly6"),
    )
    key, ks = jax.random.split(key)
    A0 = plane_seed(
        x2, cfg.channels, gmin=(-1, -1), gsize=(2, 2),
        radius=seed_radius if seed_radius else h,
        randomized=randomized, key=ks,
    )
    out = rollout_cells_batched(
        params, cfg, eng, batched_scatter(eng, A0[None]), 1, key, steps, h
    )
    final = batched_gather_back(eng, out.final, 1)[0]
    return np.asarray(to_rgba(final, cfg.use_alpha))


def density_sweep(
    params,
    cfg,
    h: float,
    target_img: np.ndarray,  # [S, S, 4]
    *,
    base_size: int = 64,
    densities: Sequence[float] = (0.5, 1.0, 2.0, 4.0),
    steps: int = 96,
    jitter: float = 0.0,
    seed: int = 0,
    eval_size: Optional[int] = None,
    image_scale: float = 1.0,
    seed_radius: Optional[float] = None,
) -> List[Dict[str, float]]:
    """Train-once/generate-anywhere: PSNR/SSIM vs particle density.

    Density d resamples the plane at (base_size * sqrt(d))^2 particles
    (regular grid, optionally jittered). The comparison must reproduce
    the TRAINING geometry (reference train.py:82, losses.py:23-41): the
    target occupies only the central ``image_scale`` fraction of the
    [-1,1]^2 domain, so the render/compare window is that subregion, not
    the whole plane. ``base_size`` is the training image_size (1x density
    == the trained particle spacing) and ``seed_radius`` the training
    seed radius — using different values measures a different protocol
    and badly understates PSNR (see RESULTS.md round-2 note).
    """
    from .utils.geometry import grange

    eval_size = eval_size or int(target_img.shape[0])
    tgt = np.asarray(
        jax.image.resize(
            jnp.asarray(target_img), (eval_size, eval_size, 4), "bilinear"
        )
    )
    s = float(image_scale)
    rng = np.random.default_rng(seed)
    results = []
    for d in densities:
        m = max(8, int(round(base_size * np.sqrt(d))))
        x2 = grange(
            (m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])
        ).reshape(-1, 2)
        if jitter > 0:
            x2 = x2 + jnp.asarray(
                rng.uniform(-jitter, jitter, x2.shape).astype(np.float32)
            ) * (2.0 / m)
        rgba = rollout_on_points(
            params, cfg, x2, h, steps, jax.random.key(seed),
            seed_radius=seed_radius,
        )
        # Compare over the image subregion [-s, s]^2 only. Render at a
        # resolution the particle density can fill (no empty bins), then
        # resize to the target resolution.
        xn = np.asarray(x2)
        inside = np.all(np.abs(xn) <= s + 1e-6, axis=1)
        r = min(eval_size, max(8, int(np.floor(m * s))))
        img = render_points(
            xn[inside], np.clip(rgba[inside], 0, 1), r,
            gmin=(-s, -s), gsize=(2 * s, 2 * s),
        )
        if r != eval_size:
            img = np.asarray(
                jax.image.resize(
                    jnp.asarray(img), (eval_size, eval_size, img.shape[-1]),
                    "bilinear",
                )
            )
        results.append(
            {
                "density": float(d),
                "n_particles": int(m * m),
                "psnr": psnr(img, tgt),
                "ssim": ssim(img, tgt),
            }
        )
    return results


# ---------------------------------------------------------------------------
# Texture statistics (quantifying exemplar-synthesis quality when no
# pixel-aligned ground truth exists — OT/style mode produces a NEW texture
# sample, so PSNR is meaningless; these are the standard stationary-texture
# comparisons)
# ---------------------------------------------------------------------------


def radial_power_spectrum(img: np.ndarray, nbins: int = 24) -> np.ndarray:
    """Orientation-averaged log power spectrum of a [H, W, C] image in
    nbins radial frequency bins (L1-normalized)."""
    g = np.mean(np.asarray(img, np.float64), axis=-1)
    g = g - g.mean()
    p = np.abs(np.fft.fftshift(np.fft.fft2(g))) ** 2
    h, w = p.shape
    yy, xx = np.mgrid[:h, :w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    rmax = r.max() + 1e-9
    bins = np.minimum((r / rmax * nbins).astype(int), nbins - 1)
    spec = np.bincount(bins.ravel(), weights=p.ravel(), minlength=nbins)
    cnt = np.bincount(bins.ravel(), minlength=nbins)
    spec = np.log1p(spec / np.maximum(cnt, 1))
    return spec / (np.sum(spec) + 1e-12)


def color_histogram(img: np.ndarray, nbins: int = 16) -> np.ndarray:
    """Per-channel histogram of a [H, W, C] image in [0, 1], concatenated
    and L1-normalized."""
    img = np.clip(np.asarray(img, np.float64), 0.0, 1.0)
    hs = [
        np.histogram(img[..., c].ravel(), bins=nbins, range=(0, 1))[0]
        for c in range(img.shape[-1])
    ]
    h = np.concatenate(hs).astype(np.float64)
    return h / (h.sum() + 1e-12)


def texture_stats_distance(a: np.ndarray, b: np.ndarray) -> dict:
    """Distance between two textures' stationary statistics.

    Returns {'spectrum_l1', 'color_l1'} — L1 distances between radial
    power spectra and color histograms (0 = identical statistics; ~0.1+
    = visibly different texture families). Used to quantify how close a
    synthesized exemplar texture is to its target without pixel
    alignment (RESULTS.md random-filter-OT study).
    """
    return {
        "spectrum_l1": float(
            np.abs(radial_power_spectrum(a) - radial_power_spectrum(b)).sum()
        ),
        "color_l1": float(
            np.abs(color_histogram(a) - color_histogram(b)).sum()
        ),
    }


def texture_eval(
    params,
    cfg,
    h: float,
    exemplar: np.ndarray,  # [H, W, 3] float in [0, 1]
    *,
    base_size: int = 100,
    steps: int = 96,
    densities=(1.0, 2.0),
    jitters=(0.0, 0.5),
    seed: int = 0,
    use_3d: bool = True,
) -> dict:
    """Quantify exemplar-texture quality without pixel alignment
    (VERDICT r2 item 6): roll the trained model out from RANDOM states
    under periodic boundaries at several densities/jitters, render, and
    score stationary-statistics distances against the exemplar
    (radial power spectrum + color histogram, texture_stats_distance).

    Baselines calibrate the scale: 'self' = exemplar vs a circular
    shift of itself (the floor — identical statistics), 'gray' =
    exemplar vs a flat gray image (a different-family ceiling).
    """
    from .utils.geometry import grange

    ex = np.asarray(exemplar, np.float32)[..., :3]
    out_size = min(ex.shape[0], ex.shape[1])

    blur = np.asarray(
        jax.image.resize(
            jax.image.resize(
                jnp.asarray(ex),
                (ex.shape[0] // 4, ex.shape[1] // 4, 3), "linear",
            ),
            ex.shape, "linear",
        )
    )
    noise = np.random.default_rng(1).uniform(size=ex.shape).astype(
        np.float32
    )
    results = {
        # shift: exact floor (periodic stats are shift-invariant — 0)
        "baseline_self": texture_stats_distance(
            ex, np.roll(ex, (ex.shape[0] // 3, ex.shape[1] // 3), (0, 1))
        ),
        # same family, high frequencies destroyed: a mid-scale anchor
        "baseline_blur4x": texture_stats_distance(ex, blur),
        # different families: ceilings
        "baseline_gray": texture_stats_distance(ex, np.full_like(ex, 0.5)),
        "baseline_noise": texture_stats_distance(ex, noise),
        "sweep": [],
    }
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    for dens in densities:
        side = int(round(base_size * float(dens) ** 0.5))
        x2 = np.asarray(
            grange((side, side), jnp.asarray([-1.0, -1.0]),
                   jnp.asarray([2.0, 2.0])).reshape(-1, 2)
        )
        for jit in jitters:
            xj = x2
            if jit > 0:
                spacing = 2.0 / side
                xj = x2 + rng.uniform(
                    -jit * spacing / 2, jit * spacing / 2, x2.shape
                ).astype(np.float32)
            key, kr = jax.random.split(key)
            # period matches the wrapped-training geometry (cli/train.py:
            # z wraps at 2.0 too when the plane is 3D-embedded)
            period = (2.0, 2.0, 2.0) if use_3d else (2.0, 2.0)
            rgba = rollout_on_points(
                params, cfg, jnp.asarray(xj, jnp.float32), h, steps, kr,
                use_3d=use_3d, period=period, randomized=True,
            )
            img = render_points(
                np.mod(xj + 1.0, 2.0) - 1.0, np.clip(rgba[:, :3], 0, 1),
                out_size,
            )
            entry = {"density": float(dens), "jitter": float(jit)}
            entry.update(texture_stats_distance(img, ex))
            results["sweep"].append(entry)
    return results
