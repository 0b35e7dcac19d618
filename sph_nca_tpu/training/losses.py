"""Training losses: MSE (image), OT/style (exemplar), CLIP (text).

Re-designs of the reference loss factories (code/losses.py:17-102) and the
loss machinery in code/nca.py:468-715, as pure jit-able functions.

Shapes: single-sample losses take x [N, D], A [N, C]; batched ranking (for
the pool's replace-worst, nca.py:436-443) vmaps the same function.

Loss totals follow the reference exactly:
  mse:  mse(rgba, img(x)) + w_overflow * sum(max(|A|-1, 0))    (losses.py:23-41)
  ot:   w_style * OT(vgg(rgb), vgg(target)) + w_color * l1(rgb, target)
        + w_overflow * overflow                                 (losses.py:53-69)
  clip: w_clip * mean_scales(spherical_dist) + w_overflow * overflow'
        (overflow' uses |A-0.5|-0.5, losses.py:92)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.nca import to_rgba
from ..utils.geometry import bilinear_sample

Array = jnp.ndarray


def overflow_penalty(A: Array) -> Array:
    """sum(max(|A| - 1, 0)) over all channels (reference losses.py:31)."""
    return jnp.sum(jnp.clip(jnp.abs(A) - 1.0, 0.0, None))


def clip_overflow_penalty(A: Array) -> Array:
    """sum(max(|A - 0.5| - 0.5, 0)) — the CLIP-mode variant (losses.py:92)."""
    return jnp.sum(jnp.clip(jnp.abs(A - 0.5) - 0.5, 0.0, None))


def rgba_with_margin(A: Array, use_alpha: bool, margin: Optional[float]) -> Array:
    """to_rgba with straight-through clamp (reference nca.py:462-466):
    forward clamps to [-margin, 1+margin], backward is identity."""
    rgba = to_rgba(A, use_alpha)
    if margin is None:
        return rgba
    clamped = jnp.clip(rgba, 0.0 - margin, 1.0 + margin)
    return rgba + jax.lax.stop_gradient(clamped - rgba)


class MSELossConfig(NamedTuple):
    """Image-mode loss config (reference losses.py:17-22)."""

    gmin: tuple  # domain min, e.g. (-1, -1)
    gsize: tuple  # domain size, e.g. (2, 2)
    image_scale: float  # TARGET_SIZE / IMAGE_SIZE (train.py:82)
    overflow_weight: float = 0.05
    use_alpha: bool = True


def mse_loss(
    x: Array, A: Array, img: Array, cfg: MSELossConfig
) -> Array:
    """MSE against the target image bilinearly sampled at particle positions.

    Reference losses.py:23-41: the image spans [gmin*s, gmin*s + gsize*s]
    (s = image_scale), so with s < 1 the target occupies the domain center
    and positions outside sample clamped (transparent) edge pixels.
    """
    img_gmin = jnp.asarray(cfg.gmin, jnp.float32) * cfg.image_scale
    img_gsize = jnp.asarray(cfg.gsize, jnp.float32) * cfg.image_scale
    img_x = bilinear_sample(x, img, img_gmin, img_gsize)  # [N, 4]
    rgba = rgba_with_margin(A, cfg.use_alpha, margin=None)
    loss = jnp.mean((rgba - img_x) ** 2)
    if cfg.overflow_weight > 0:
        loss = loss + cfg.overflow_weight * overflow_penalty(A)
    return loss


# ---------------------------------------------------------------------------
# Optimal-transport style loss (reference nca.py:629-715 OptimalTransportLoss)
# ---------------------------------------------------------------------------

OT_MAX_SAMPLES = 1024  # reference nca.py:633


def pairwise_cos_distance(x: Array, y: Array) -> Array:
    """1 - cos similarity between feature sets x [n, c], y [m, c] -> [n, m].

    Reference nca.py:639-652.
    """
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)  # [n, 1]
    yn = jnp.linalg.norm(y, axis=-1, keepdims=True)  # [m, 1]
    dot = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return 1.0 - dot / (xn * yn.T + 1e-10)


def relaxed_emd(x: Array, y: Array) -> Array:
    """Relaxed earth-mover's distance (reference nca.py:654-668):
    max(mean_n min_m d, mean_m min_n d)."""
    pd = pairwise_cos_distance(x, y)
    m1 = jnp.mean(jnp.min(pd, axis=0))
    m2 = jnp.mean(jnp.min(pd, axis=1))
    return jnp.maximum(m1, m2)


def moment_loss(x: Array, y: Array) -> Array:
    """First+second moment matching (reference nca.py:670-689)."""
    mu_x = jnp.mean(x, axis=0, keepdims=True)
    mu_y = jnp.mean(y, axis=0, keepdims=True)
    mu_diff = jnp.mean(jnp.abs(mu_x - mu_y))
    xc = x - mu_x
    yc = y - mu_y
    prec = jax.lax.Precision.HIGHEST
    x_cov = jnp.matmul(xc.T, xc, precision=prec) / (x.shape[0] - 1)
    y_cov = jnp.matmul(yc.T, yc, precision=prec) / (y.shape[0] - 1)
    cov_diff = jnp.mean(jnp.abs(x_cov - y_cov))
    return mu_diff + cov_diff


def ot_feature_loss(
    feats_x: Sequence[Array],
    feats_y: Sequence[Array],
    key: Array,
    *,
    max_samples: int = OT_MAX_SAMPLES,
) -> Array:
    """OT style score over per-layer feature sets.

    feats_x/feats_y: lists of [n_i, c_i] (flattened spatial x channel)
    feature sets from matching extractor layers. Random subsampling to
    ``max_samples`` rows mirrors nca.py:702-711; the mean over layers
    mirrors eval_style_loss(layer_mean=True) (nca.py:618-627).
    """
    total = 0.0
    for li, (fx, fy) in enumerate(zip(feats_x, feats_y)):
        kx, ky = jax.random.split(jax.random.fold_in(key, li))
        n = min(fx.shape[0], fy.shape[0], max_samples)
        ix = jax.random.permutation(kx, fx.shape[0])[:n]
        iy = jax.random.permutation(ky, fy.shape[0])[:n]
        sx, sy = fx[ix], fy[iy]
        total = total + relaxed_emd(sx, sy) + moment_loss(sx, sy)
    return total / len(feats_x)


class OTLossConfig(NamedTuple):
    """Exemplar-mode loss config (reference losses.py:44-49)."""

    image_size: int  # particles per image side (BNC2BCHW reshape)
    style_weight: float = 1.0
    color_weight: float = 0.05
    overflow_weight: float = 0.05
    use_alpha: bool = True


def particles_to_image(A: Array, image_size: int) -> Array:
    """[H*W, F] grid-ordered particles -> [H, W, F] image.

    The reference's BNC2BCHW (nca.py:555-561) assumes grid-ordered
    particles; with grange's ij-indexing the flat order is row-major.
    """
    return A.reshape(image_size, image_size, A.shape[-1])


def ot_loss(
    x: Array,
    A: Array,
    target_feats: Sequence[Array],
    target_rgb: Array,
    feature_fn: Callable[[Array], Sequence[Array]],
    key: Array,
    cfg: OTLossConfig,
) -> Array:
    """Full exemplar loss (reference losses.py:53-69).

    ``feature_fn`` maps an image [H, W, 3] to a list of [n_i, c_i] feature
    sets (see training/features.py); ``target_feats`` are the precomputed
    features of the style exemplar; ``target_rgb`` is [H, W, 3].
    """
    rgba = rgba_with_margin(A, cfg.use_alpha, margin=None)
    rgb = particles_to_image(rgba[..., :3], cfg.image_size)
    feats = feature_fn(rgb)
    style = ot_feature_loss(feats, target_feats, key)
    color = jnp.mean(jnp.abs(rgb - target_rgb))
    loss = cfg.style_weight * style + cfg.color_weight * color
    if cfg.overflow_weight > 0:
        loss = loss + cfg.overflow_weight * overflow_penalty(A)
    return loss


# ---------------------------------------------------------------------------
# CLIP loss (reference nca.py:470-508, losses.py:72-102)
# ---------------------------------------------------------------------------


def spherical_distance(image_features: Array, text_features: Array) -> Array:
    """2 * arcsin(|u - v| / 2)^2, mean over batch (reference nca.py:506)."""
    d = jnp.linalg.norm(image_features - text_features, axis=-1)
    return jnp.mean(2.0 * jnp.arcsin(d / 2.0) ** 2)


class CLIPLossConfig(NamedTuple):
    """Text-mode loss config (reference losses.py:72-82)."""

    image_size: int
    scales: tuple = (1.0,)
    clip_weight: float = 1.0
    overflow_weight: float = 0.05
    use_alpha: bool = True


def clip_loss(
    x: Array,
    A: Array,
    text_features: Array,
    encode_image: Callable[[Array], Array],
    key: Array,
    cfg: CLIPLossConfig,
) -> Array:
    """Multi-scale CLIP guidance loss (reference losses.py:84-101).

    ``encode_image`` maps [H, W, 3] -> normalized embedding [E] (the model
    is expected to resize to its input resolution internally; see
    training/features.py for the scale pyramid helper).
    ``text_features``: precomputed normalized text embedding [E].
    """
    rgba = rgba_with_margin(A, cfg.use_alpha, margin=0.0)
    rgb = particles_to_image(rgba[..., :3], cfg.image_size)

    from .features import scale_pyramid  # local import to avoid cycle

    views = scale_pyramid(rgb, cfg.scales, key)
    dists = [
        spherical_distance(encode_image(vw)[None], text_features[None])
        for vw in views
    ]
    loss = cfg.clip_weight * (sum(dists) / len(dists))
    if cfg.overflow_weight > 0:
        loss = loss + cfg.overflow_weight * clip_overflow_penalty(A)
    return loss


def gram_matrix(feats: Array) -> Array:
    """Gram matrix of a feature set [n, c] -> [c, c] / (c * n).

    Reference nca.py:531-542 (normalization by b*c*d with b=1).
    """
    n, c = feats.shape
    g = jnp.matmul(
        feats.T, feats, precision=jax.lax.Precision.HIGHEST
    )
    return g / (c * n)


def gram_style_loss(
    feats_x: Sequence[Array], feats_y: Sequence[Array]
) -> Array:
    """Classic Gatys-style Gram-matrix loss, summed over layers.

    The reference's plain StyleLoss module (nca.py:544-552) — the
    alternative ``loss_module`` to OptimalTransportLoss in get_style_loss.
    """
    total = 0.0
    for fx, fy in zip(feats_x, feats_y):
        total = total + jnp.mean((gram_matrix(fx) - gram_matrix(fy)) ** 2)
    return total
