"""CLIP ViT-B/32 image encoder in JAX — for the text-guidance loss.

The reference drives its CLIP loss with OpenCLIP ViT-B-32 (laion2b)
(nca.py:470-508). This module implements the image tower natively in JAX
and loads pretrained weights from an .npz produced by
`convert_open_clip` / `convert_hf_clip` (this build environment has no
model-zoo access, so weights must be supplied as a file; with
`random_clip_encoder` the full loss pipeline still runs for tests).

Architecture (ViT-B/32 image tower):
  conv 32x32/32 patchify -> [49+1, 768] tokens (+class token, +pos emb)
  -> pre-LN -> 12 x {LN, MHA(12 heads), LN, MLP(3072, GELU)} -> LN
  -> take class token -> projection to 512 -> L2 normalize
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

IMAGE_RES = 224
PATCH = 32
WIDTH = 768
LAYERS = 12
HEADS = 12
EMBED = 512

# OpenAI CLIP normalization (reference nca.py:471-472)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class CLIPImageEncoder:
    """Weights as a dict of arrays; call with an [H, W, 3] image in [0,1]."""

    w: dict

    def __call__(self, img: Array) -> Array:
        w = self.w
        x = jax.image.resize(img, (IMAGE_RES, IMAGE_RES, 3), "bilinear")
        x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

        # patchify: conv k=32 s=32 == reshape to patches @ kernel
        g = IMAGE_RES // PATCH
        x = x.reshape(g, PATCH, g, PATCH, 3).transpose(0, 2, 1, 3, 4)
        x = x.reshape(g * g, PATCH * PATCH * 3)
        tok = jnp.matmul(
            x, w["patch_kernel"], precision=jax.lax.Precision.HIGHEST
        )  # [49, WIDTH]

        cls = jnp.broadcast_to(w["class_embedding"], (1, WIDTH))
        t = jnp.concatenate([cls, tok], axis=0) + w["pos_embedding"]
        t = _layernorm(t, w["ln_pre_g"], w["ln_pre_b"])

        for i in range(LAYERS):
            t = _block(t, w, i)

        t = _layernorm(t, w["ln_post_g"], w["ln_post_b"])
        feat = t[0] @ w["proj"]  # class token -> [EMBED]
        return feat / jnp.linalg.norm(feat)


def _layernorm(x, g, b, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _block(t: Array, w: dict, i: int, width: int = WIDTH,
           heads: int = HEADS, attn_mask: Array | None = None) -> Array:
    """One CLIP residual attention block (shared by the image and text
    towers; the text tower passes a causal attn_mask)."""
    p = f"blk{i}_"
    h = _layernorm(t, w[p + "ln1_g"], w[p + "ln1_b"])
    qkv = h @ w[p + "attn_w"] + w[p + "attn_b"]  # [T, 3*width]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = width // heads

    def split_heads(a):
        return a.reshape(-1, heads, hd).transpose(1, 0, 2)  # [H, T, hd]

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    att = jnp.einsum(
        "htd,hsd->hts", q, k, precision=jax.lax.Precision.HIGHEST
    ) / np.sqrt(hd)
    if attn_mask is not None:
        att = att + attn_mask
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("hts,hsd->htd", att, v)
    o = o.transpose(1, 0, 2).reshape(-1, width)
    t = t + (o @ w[p + "attn_out_w"] + w[p + "attn_out_b"])

    h = _layernorm(t, w[p + "ln2_g"], w[p + "ln2_b"])
    h = h @ w[p + "mlp1_w"] + w[p + "mlp1_b"]
    # QuickGELU (x * sigmoid(1.702 x)) — what CLIP ViT-B/32 uses
    h = h * jax.nn.sigmoid(1.702 * h)
    h = h @ w[p + "mlp2_w"] + w[p + "mlp2_b"]
    return t + h


def load_clip_encoder(path: str) -> CLIPImageEncoder:
    data = np.load(path)
    return CLIPImageEncoder({k: jnp.asarray(data[k]) for k in data.files})


def random_clip_encoder(seed: int = 0) -> CLIPImageEncoder:
    """Fixed-seed random-weight encoder: exercises the full pipeline when
    pretrained weights are unavailable (NOT semantically CLIP)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.02):
        return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

    w = {
        "patch_kernel": r(PATCH * PATCH * 3, WIDTH),
        "class_embedding": r(WIDTH),
        "pos_embedding": r((IMAGE_RES // PATCH) ** 2 + 1, WIDTH),
        "ln_pre_g": jnp.ones(WIDTH), "ln_pre_b": jnp.zeros(WIDTH),
        "ln_post_g": jnp.ones(WIDTH), "ln_post_b": jnp.zeros(WIDTH),
        "proj": r(WIDTH, EMBED),
    }
    for i in range(LAYERS):
        p = f"blk{i}_"
        w.update({
            p + "ln1_g": jnp.ones(WIDTH), p + "ln1_b": jnp.zeros(WIDTH),
            p + "ln2_g": jnp.ones(WIDTH), p + "ln2_b": jnp.zeros(WIDTH),
            p + "attn_w": r(WIDTH, 3 * WIDTH),
            p + "attn_b": jnp.zeros(3 * WIDTH),
            p + "attn_out_w": r(WIDTH, WIDTH),
            p + "attn_out_b": jnp.zeros(WIDTH),
            p + "mlp1_w": r(WIDTH, 4 * WIDTH),
            p + "mlp1_b": jnp.zeros(4 * WIDTH),
            p + "mlp2_w": r(4 * WIDTH, WIDTH),
            p + "mlp2_b": jnp.zeros(WIDTH),
        })
    return CLIPImageEncoder(w)


def convert_open_clip(state_dict, out_path: str) -> None:
    """Convert an OpenCLIP ViT-B-32 visual state_dict to our .npz.

    Keys per open_clip's VisionTransformer: visual.conv1.weight [768,3,32,32],
    visual.class_embedding, visual.positional_embedding,
    visual.ln_pre/{weight,bias}, visual.transformer.resblocks.{i}.
    {ln_1, attn.in_proj_weight/bias, attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj},
    visual.ln_post, visual.proj.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def g(k):
        return sd[k] if k in sd else sd["visual." + k]

    out = {
        # conv [768, 3, 32, 32] -> [32*32*3, 768] matching our patchify
        # (pixels ordered [ph, pw, c])
        "patch_kernel": g("conv1.weight")
        .transpose(2, 3, 1, 0)
        .reshape(PATCH * PATCH * 3, WIDTH),
        "class_embedding": g("class_embedding"),
        "pos_embedding": g("positional_embedding"),
        "ln_pre_g": g("ln_pre.weight"), "ln_pre_b": g("ln_pre.bias"),
        "ln_post_g": g("ln_post.weight"), "ln_post_b": g("ln_post.bias"),
        "proj": g("proj"),
    }
    for i in range(LAYERS):
        rb = f"transformer.resblocks.{i}."
        p = f"blk{i}_"
        out.update({
            p + "ln1_g": g(rb + "ln_1.weight"),
            p + "ln1_b": g(rb + "ln_1.bias"),
            p + "ln2_g": g(rb + "ln_2.weight"),
            p + "ln2_b": g(rb + "ln_2.bias"),
            p + "attn_w": g(rb + "attn.in_proj_weight").T,
            p + "attn_b": g(rb + "attn.in_proj_bias"),
            p + "attn_out_w": g(rb + "attn.out_proj.weight").T,
            p + "attn_out_b": g(rb + "attn.out_proj.bias"),
            p + "mlp1_w": g(rb + "mlp.c_fc.weight").T,
            p + "mlp1_b": g(rb + "mlp.c_fc.bias"),
            p + "mlp2_w": g(rb + "mlp.c_proj.weight").T,
            p + "mlp2_b": g(rb + "mlp.c_proj.bias"),
        })
    np.savez(out_path, **out)


def get_clip_encoder(weights_path: str | None = None,
                     seed: int = 0) -> CLIPImageEncoder:
    if weights_path:
        return load_clip_encoder(weights_path)
    return random_clip_encoder(seed)
