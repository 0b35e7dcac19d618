"""Target-image acquisition and frame export.

Reference: train.py:193-234 (emoji download / file load / flat color with
alpha premultiply) and test.py:233-247 (per-step PNG export).

This environment has no network egress, so the emoji path resolves through
a local cache directory instead of the Noto GitHub URL; everything else is
feature-equivalent.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

NOTO_CACHE = os.environ.get("SPH_NCA_EMOJI_CACHE", "data/emoji")


def load_image(
    path: str, max_size: int = 64, alpha_premultiply: bool = True
) -> np.ndarray:
    """Load + thumbnail + premultiply (reference train.py:193-209).

    Returns [H, W, 4] float32 in [0, 1]; RGB-only inputs get alpha = 1.
    """
    from PIL import Image

    img = Image.open(path)
    if img.mode == "L":
        img = img.convert("RGB")
    img.thumbnail((max_size, max_size), Image.LANCZOS)
    arr = np.float32(img) / 255.0
    if arr.shape[-1] == 4:
        if alpha_premultiply:
            arr[..., :3] *= arr[..., 3:]
    elif arr.shape[-1] == 3:
        arr = np.pad(
            arr, [(0, 0)] * (arr.ndim - 1) + [(0, 1)], constant_values=1.0
        )
    return arr


def load_emoji(
    emoji: str, max_size: int = 64, alpha_premultiply: bool = True
) -> np.ndarray:
    """Resolve an emoji target through the local Noto PNG cache.

    The reference downloads emoji_u{code}.png from googlefonts/noto-emoji
    (train.py:211-216); offline, we look it up under $SPH_NCA_EMOJI_CACHE.
    """
    code = "_".join(f"{ord(c):04x}" for c in emoji)
    path = os.path.join(NOTO_CACHE, f"emoji_u{code}.png")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"emoji PNG not cached at {path}; this environment has no "
            "network egress — place Noto PNGs under the cache dir or use "
            "--img <file>"
        )
    return load_image(path, max_size, alpha_premultiply)


def flat_color_target(
    size: int, rgb=(1.0, 0.5, 0.0)
) -> np.ndarray:
    """The reference's no-target fallback (train.py:229-233) + alpha=1."""
    img = np.zeros((size, size, 4), np.float32)
    img[..., 0], img[..., 1], img[..., 2] = rgb
    img[..., 3] = 1.0
    return img


def save_frame_png(
    path: str, rgba: np.ndarray, side: Optional[int] = None
) -> None:
    """Save one rollout state as a PNG (reference test.py:233-247).

    rgba: [N, 4] or [N, 3] grid-ordered particles, or an [H, W, C] image.
    """
    from PIL import Image

    arr = np.asarray(rgba)
    if arr.ndim == 2:
        if side is None:
            side = int(round(np.sqrt(arr.shape[0])))
        arr = arr.reshape(side, side, arr.shape[-1])
    arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
