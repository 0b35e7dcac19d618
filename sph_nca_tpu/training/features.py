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
