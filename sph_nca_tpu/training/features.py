"""Pretrained feature extractors for the style / CLIP losses, in JAX.

The reference uses torchvision VGG19 (nca.py:563-616) and OpenCLIP ViT-B-32
(nca.py:470-508). This module re-implements the *forward graphs* natively in
JAX and loads pretrained weights from local files:

  * `load_vgg19_features(path)` — path to an .npz with arrays
    ``conv{i}_w`` [kh, kw, cin, cout] and ``conv{i}_b`` [cout] for the first
    5 convs (the only layers the style loss uses: 'conv_1'..'conv_5' =
    conv1_1, conv1_2, conv2_1, conv2_2, conv3_1 — nca.py:563,599-603).
    `convert_torchvision_vgg19` produces this file from a torchvision
    checkpoint when one is available.

  * with no weights available (this build environment has no model zoo
    access), `random_vgg19_features(seed)` gives a fixed-seed random-filter
    pyramid — the OT machinery is exercised end-to-end and tests stay
    hermetic; swap in real weights for paper-grade texture quality.

Feature sets are returned as lists of [n_i, c_i] ready for
`losses.ot_feature_loss`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# ImageNet normalization (reference nca.py:515-516).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Channel widths of VGG19 convs 1..5 (conv1_1..conv3_1) and whether a
# 2x2 max-pool precedes the conv (after conv_2 and conv_4).
_VGG_CHANNELS = (64, 64, 128, 128, 256)
_VGG_POOL_BEFORE = (False, False, True, False, True)


@dataclasses.dataclass
class VGGFeatures:
    """First-5-conv VGG19 feature extractor (style layers only)."""

    weights: List[Array]  # [kh, kw, cin, cout]
    biases: List[Array]

    def __call__(self, img: Array) -> List[Array]:
        """img [H, W, 3] in [0, 1] -> list of 5 feature sets [(h*w), c].

        Style features are the conv outputs *pre*-ReLU, matching the
        reference's layer taps (nca.py:577-603: StyleLoss modules are
        inserted directly after each conv)."""
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        z = ((img - mean) / std)[None]  # [1, H, W, 3]
        feats = []
        for w, b, pool in zip(self.weights, self.biases, _VGG_POOL_BEFORE):
            if pool:
                z = jax.lax.reduce_window(
                    z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )
            z = jax.lax.conv_general_dilated(
                z, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ) + b
            feats.append(z[0].reshape(-1, z.shape[-1]))
            z = jnp.maximum(z, 0.0)  # ReLU feeds the next conv
        return feats


def load_vgg19_features(path: str) -> VGGFeatures:
    """Load the 5-conv extractor from an .npz (see module docstring)."""
    data = np.load(path)
    ws, bs = [], []
    for i in range(1, 6):
        w = jnp.asarray(data[f"conv{i}_w"], jnp.float32)
        b = jnp.asarray(data[f"conv{i}_b"], jnp.float32)
        if w.shape[-1] != _VGG_CHANNELS[i - 1]:
            raise ValueError(
                f"conv{i} has {w.shape[-1]} filters, expected "
                f"{_VGG_CHANNELS[i - 1]}"
            )
        ws.append(w)
        bs.append(b)
    return VGGFeatures(ws, bs)


def convert_torchvision_vgg19(state_dict, out_path: str) -> None:
    """Convert a torchvision VGG19 ``features`` state_dict to our .npz.

    torchvision stores conv weights as [cout, cin, kh, kw] under keys
    ``features.{0,2,5,7,10}.weight`` — transpose to HWIO.
    """
    idxs = (0, 2, 5, 7, 10)
    arrays = {}
    for i, li in enumerate(idxs, start=1):
        w = np.asarray(state_dict[f"features.{li}.weight"])
        b = np.asarray(state_dict[f"features.{li}.bias"])
        arrays[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        arrays[f"conv{i}_b"] = b
    np.savez(out_path, **arrays)


def random_vgg19_features(seed: int = 0) -> VGGFeatures:
    """VGG19-shaped extractor with fixed-seed He-normal random filters.

    Random conv features are a known-serviceable stand-in for texture
    statistics when pretrained weights are unavailable; results differ from
    the reference's VGG19 run but the full OT pipeline is exercised.
    """
    key = jax.random.key(seed)
    ws, bs = [], []
    cin = 3
    for i, cout in enumerate(_VGG_CHANNELS):
        key, k = jax.random.split(key)
        scale = np.sqrt(2.0 / (3 * 3 * cin))
        ws.append(jax.random.normal(k, (3, 3, cin, cout)) * scale)
        bs.append(jnp.zeros((cout,)))
        cin = cout
    return VGGFeatures(ws, bs)


def get_vgg_features(weights_path: str | None = None,
                     seed: int = 0) -> VGGFeatures:
    """Load pretrained VGG19 style layers if a weights file is given/found,
    else fall back to the fixed-seed random extractor."""
    if weights_path:
        return load_vgg19_features(weights_path)
    return random_vgg19_features(seed)


# ---------------------------------------------------------------------------
# Pretrained-free texture features: fixed multi-scale oriented Gabor bank
# + Portilla-Simoncelli-style cross-scale magnitude statistics
# ---------------------------------------------------------------------------
#
# This environment has no model-zoo egress, so the reference's pretrained
# VGG19 style layers (nca.py:563-616) cannot be loaded. Random conv
# filters exercise the OT machinery but lose high-frequency structure
# (round-3 eval: spectrum L1 only reached the blurred-exemplar anchor).
# A *designed* filter bank needs no training: quadrature-pair Gabor
# filters at O orientations over an S-level image pyramid give
# orientation- and scale-selective energy measurements, and products of
# coarse-scale magnitude with fine-scale magnitude (the cross-scale
# correlations of Portilla & Simoncelli, IJCV 2000) capture the phase
# alignment that distinguishes edges/lines from noise with matching
# spectra. The OT loss (relaxed EMD + first/second moments,
# losses.ot_feature_loss) then matches the joint distribution of these
# per-pixel feature vectors per scale — moment matching over this set
# subsumes the classic PS statistic families (oriented energy means,
# orientation co-occurrence, cross-scale correlation, color moments).


def _gabor_bank_np(
    ksize: int, wavelength: float, n_orient: int
) -> tuple:
    """Quadrature Gabor filter bank, numpy [K, K, 1, O] (even, odd).

    Even (cosine) filters are mean-subtracted (DC-free) and every filter
    is L2-normalized so response magnitudes are comparable across
    orientations.
    """
    r = ksize // 2
    y, x = np.mgrid[-r : r + 1, -r : r + 1].astype(np.float64)
    sigma = 0.56 * wavelength  # ~1 octave bandwidth
    env = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    evens, odds = [], []
    for i in range(n_orient):
        th = np.pi * i / n_orient
        u = x * np.cos(th) + y * np.sin(th)
        carrier = 2.0 * np.pi * u / wavelength
        e = env * np.cos(carrier)
        o = env * np.sin(carrier)
        e -= e.mean()
        e /= np.sqrt((e * e).sum())
        o /= np.sqrt((o * o).sum())
        evens.append(e)
        odds.append(o)
    ev = np.stack(evens, axis=-1)[:, :, None, :]  # [K, K, 1, O]
    od = np.stack(odds, axis=-1)[:, :, None, :]
    return ev.astype(np.float32), od.astype(np.float32)


def _avg_pool2(z: Array) -> Array:
    """2x2 average pool, NHWC."""
    return jax.lax.reduce_window(
        z, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def _conv_same(z: Array, w: Array) -> Array:
    return jax.lax.conv_general_dilated(
        z, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


@dataclasses.dataclass
class GaborTextureFeatures:
    """Fixed (training-free) texture feature extractor.

    Per pyramid scale s (2x downsampled each level), the per-pixel
    feature vector concatenates:
      * rgb_s [3] — low-passed color (color moments per scale),
      * even/odd Gabor responses [2*O] — signed oriented structure,
      * magnitude sqrt(e^2 + o^2) [O] — phase-invariant oriented energy,
      * cross-scale magnitude product mag_s * up(mag_{s+1}) [O] — the
        PS cross-scale correlation carrier (zeros at the coarsest scale
        so the channel count is static).

    Returns one [h_s*w_s, 3+4*O] feature set per scale — same interface
    as VGGFeatures, drops into losses.ot_feature_loss unchanged.
    """

    even: Array  # [K, K, 1, O]
    odd: Array  # [K, K, 1, O]
    n_scales: int = 3

    def __call__(self, img: Array) -> List[Array]:
        o = self.even.shape[-1]
        lum = img @ jnp.asarray([0.299, 0.587, 0.114])  # [H, W]
        z = lum[None, ..., None]  # [1, H, W, 1]
        rgb = img[None]  # [1, H, W, 3]
        mags, per_scale = [], []
        for s in range(self.n_scales):
            e = _conv_same(z, self.even)[0]  # [h, w, O]
            od = _conv_same(z, self.odd)[0]
            mag = jnp.sqrt(e * e + od * od + 1e-12)
            mags.append(mag)
            per_scale.append((rgb[0], e, od, mag))
            if s + 1 < self.n_scales:
                z = _avg_pool2(z)
                rgb = _avg_pool2(rgb)
        feats = []
        for s, (rgb_s, e, od, mag) in enumerate(per_scale):
            if s + 1 < self.n_scales:
                up = jax.image.resize(
                    mags[s + 1], mag.shape, "bilinear"
                )
                cross = mag * up
            else:
                cross = jnp.zeros_like(mag)
            f = jnp.concatenate([rgb_s, e, od, mag, cross], axis=-1)
            feats.append(f.reshape(-1, f.shape[-1]))
        return feats


def gabor_texture_features(
    n_orient: int = 6,
    n_scales: int = 3,
    ksize: int = 9,
    wavelength: float = 4.0,
) -> GaborTextureFeatures:
    """Build the default fixed Gabor texture extractor (see
    GaborTextureFeatures). Deterministic — no weights, no RNG."""
    ev, od = _gabor_bank_np(ksize, wavelength, n_orient)
    return GaborTextureFeatures(
        even=jnp.asarray(ev), odd=jnp.asarray(od), n_scales=n_scales
    )


def get_texture_features(
    kind: str = "gabor",
    weights_path: str | None = None,
    seed: int = 0,
):
    """Texture feature extractor registry for the OT loss.

    kind: 'gabor' (fixed filter bank, the pretrained-free default),
    'vgg' (requires ``weights_path``), 'vgg_random' (fixed-seed random
    filters — round-3 behavior, kept for comparability)."""
    if kind == "gabor":
        return gabor_texture_features()
    if kind == "vgg":
        if not weights_path:
            raise ValueError("kind='vgg' requires weights_path")
        return load_vgg19_features(weights_path)
    if kind == "vgg_random":
        return random_vgg19_features(seed)
    raise ValueError(f"unknown texture feature kind {kind!r}")


# ---------------------------------------------------------------------------
# CLIP multi-scale view pyramid (reference losses.py:81-82, 97)
# ---------------------------------------------------------------------------


def _resize(img: Array, size: int) -> Array:
    return jax.image.resize(img, (size, size, img.shape[-1]), "bilinear")


def _random_crop(img: Array, size: int, key: Array) -> Array:
    h, w = img.shape[0], img.shape[1]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - size + 1)
    x0 = jax.random.randint(kx, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (y0, x0, 0), (size, size, img.shape[-1]))


def scale_pyramid(img: Array, scales: Sequence[float], key: Array) -> List[Array]:
    """One view per scale s: resize to H/s when s > 1, random-crop to H*s
    when s <= 1 (reference losses.py:82)."""
    h = img.shape[0]
    views = []
    for i, s in enumerate(scales):
        if s > 1.0:
            views.append(_resize(img, int(h / s)))
        elif s == 1.0:
            views.append(img)
        else:
            views.append(_random_crop(img, int(h * s), jax.random.fold_in(key, i)))
    return views
