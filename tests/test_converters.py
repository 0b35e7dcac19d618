"""Pretrained-weight converter parity vs a live torch oracle.

This environment has no model-zoo egress, so the VGG19/OpenCLIP
converters (training/features.convert_torchvision_vgg19,
training/clip_encoder.convert_open_clip, clip_text.convert_open_clip_text)
have never run against real checkpoints. These tests pin their LAYOUT
logic — every transpose and key mapping — against torch itself
(cpu torch is available offline): synthetic state dicts in the exact
torchvision/open_clip layouts, a torch re-implementation of the
reference forward (nca.py:563-616 VGG taps, :470-508 CLIP towers), and
elementwise comparison. A transpose or key bug that would break real
weights fails here today (VERDICT r4 item 4).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from sph_nca_tpu.training import clip_encoder as ce
from sph_nca_tpu.training import clip_text as ct
from sph_nca_tpu.training.features import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _VGG_CHANNELS,
    convert_torchvision_vgg19,
    load_vgg19_features,
)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# VGG19 (style layers conv1_1..conv3_1, pre-ReLU taps)
# ---------------------------------------------------------------------------


def _synthetic_vgg19_state_dict():
    """torchvision layout: features.{0,2,5,7,10}.weight [cout, cin, 3, 3]."""
    idxs = (0, 2, 5, 7, 10)
    sd = {}
    cin = 3
    g = torch.Generator().manual_seed(7)
    for li, cout in zip(idxs, _VGG_CHANNELS):
        sd[f"features.{li}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g
        ) * (2.0 / (3 * 3 * cin)) ** 0.5
        sd[f"features.{li}.bias"] = torch.randn((cout,), generator=g) * 0.1
        cin = cout
    return sd


def _torch_vgg_taps(sd, img_hw3: np.ndarray):
    """Reference forward: ImageNet-normalize, convs with SAME padding,
    2x2 max-pool before conv3/conv5, tap each conv output PRE-ReLU
    (nca.py:563,577-603)."""
    z = torch.from_numpy(img_hw3).float()
    mean = torch.tensor(IMAGENET_MEAN)
    std = torch.tensor(IMAGENET_STD)
    z = ((z - mean) / std).permute(2, 0, 1)[None]  # NCHW
    taps = []
    pool_before = (False, False, True, False, True)
    for li, pool in zip((0, 2, 5, 7, 10), pool_before):
        if pool:
            z = tF.max_pool2d(z, 2, 2)
        z = tF.conv2d(z, sd[f"features.{li}.weight"],
                      sd[f"features.{li}.bias"], padding=1)
        taps.append(z[0].permute(1, 2, 0).reshape(-1, z.shape[1]).numpy())
        z = tF.relu(z)
    return taps


def test_vgg19_converter_matches_torch(tmp_path):
    sd = _synthetic_vgg19_state_dict()
    path = str(tmp_path / "vgg19.npz")
    convert_torchvision_vgg19(
        {k: v.numpy() for k, v in sd.items()}, path
    )
    feats = load_vgg19_features(path)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    ours = feats(jnp.asarray(img))
    theirs = _torch_vgg_taps(sd, img)
    assert len(ours) == len(theirs) == 5
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == b.shape, f"conv{i+1}: {a.shape} vs {b.shape}"
        err = float(np.max(np.abs(np.asarray(a, np.float32) - b)))
        scale = float(np.max(np.abs(b))) + 1e-6
        assert err / scale < 2e-5, f"conv{i+1} rel err {err/scale:.2e}"


def test_vgg19_converter_rejects_wrong_widths(tmp_path):
    sd = _synthetic_vgg19_state_dict()
    # swap conv1 (64) for a 32-filter layer: loader must refuse
    sd["features.0.weight"] = torch.randn((32, 3, 3, 3))
    sd["features.0.bias"] = torch.randn((32,))
    path = str(tmp_path / "bad.npz")
    convert_torchvision_vgg19({k: v.numpy() for k, v in sd.items()}, path)
    with pytest.raises(ValueError, match="filters"):
        load_vgg19_features(path)


# ---------------------------------------------------------------------------
# OpenCLIP ViT-B/32 towers (1 transformer block via monkeypatch — the 12
# blocks are layout-identical; full-size blocks would need ~340 MB of
# synthetic weights on this 1-vCPU host)
# ---------------------------------------------------------------------------


def _resblock_sd(prefix, width, g):
    def r(*shape, s=0.02):
        return torch.randn(shape, generator=g) * s

    return {
        f"{prefix}ln_1.weight": 1 + 0.1 * r(width),
        f"{prefix}ln_1.bias": 0.1 * r(width),
        f"{prefix}ln_2.weight": 1 + 0.1 * r(width),
        f"{prefix}ln_2.bias": 0.1 * r(width),
        f"{prefix}attn.in_proj_weight": r(3 * width, width),
        f"{prefix}attn.in_proj_bias": 0.1 * r(3 * width),
        f"{prefix}attn.out_proj.weight": r(width, width),
        f"{prefix}attn.out_proj.bias": 0.1 * r(width),
        f"{prefix}mlp.c_fc.weight": r(4 * width, width),
        f"{prefix}mlp.c_fc.bias": 0.1 * r(4 * width),
        f"{prefix}mlp.c_proj.weight": r(width, 4 * width),
        f"{prefix}mlp.c_proj.bias": 0.1 * r(width),
    }


def _torch_resblock(sd, prefix, x, heads, attn_mask=None):
    """open_clip ResidualAttentionBlock forward in torch (QuickGELU)."""
    ln1 = tF.layer_norm(
        x, x.shape[-1:], sd[f"{prefix}ln_1.weight"],
        sd[f"{prefix}ln_1.bias"]
    )
    attn, _ = tF.multi_head_attention_forward(
        ln1.transpose(0, 1), ln1.transpose(0, 1), ln1.transpose(0, 1),
        x.shape[-1], heads,
        sd[f"{prefix}attn.in_proj_weight"],
        sd[f"{prefix}attn.in_proj_bias"],
        None, None, False, 0.0,
        sd[f"{prefix}attn.out_proj.weight"],
        sd[f"{prefix}attn.out_proj.bias"],
        need_weights=False, attn_mask=attn_mask,
    )
    x = x + attn.transpose(0, 1)
    ln2 = tF.layer_norm(
        x, x.shape[-1:], sd[f"{prefix}ln_2.weight"],
        sd[f"{prefix}ln_2.bias"]
    )
    h = ln2 @ sd[f"{prefix}mlp.c_fc.weight"].T + sd[f"{prefix}mlp.c_fc.bias"]
    h = h * torch.sigmoid(1.702 * h)  # QuickGELU
    h = h @ sd[f"{prefix}mlp.c_proj.weight"].T + sd[f"{prefix}mlp.c_proj.bias"]
    return x + h


def test_clip_image_converter_matches_torch(tmp_path, monkeypatch):
    monkeypatch.setattr(ce, "LAYERS", 1)
    W = ce.WIDTH
    g = torch.Generator().manual_seed(3)

    def r(*shape, s=0.02):
        return torch.randn(shape, generator=g) * s

    sd = {
        "visual.conv1.weight": r(W, 3, ce.PATCH, ce.PATCH),
        "visual.class_embedding": r(W),
        "visual.positional_embedding": r(
            (ce.IMAGE_RES // ce.PATCH) ** 2 + 1, W
        ),
        "visual.ln_pre.weight": 1 + 0.1 * r(W),
        "visual.ln_pre.bias": 0.1 * r(W),
        "visual.ln_post.weight": 1 + 0.1 * r(W),
        "visual.ln_post.bias": 0.1 * r(W),
        "visual.proj": r(W, ce.EMBED),
    }
    sd.update({
        "visual." + k: v
        for k, v in _resblock_sd("transformer.resblocks.0.", W, g).items()
    })

    path = str(tmp_path / "clip.npz")
    ce.convert_open_clip({k: v.numpy() for k, v in sd.items()}, path)
    enc = ce.load_clip_encoder(path)

    rng = np.random.default_rng(1)
    # 224x224 input: our forward's resize is then the identity, so the
    # comparison isolates the tower (resize kernels differ across libs)
    img = rng.uniform(0, 1, (ce.IMAGE_RES, ce.IMAGE_RES, 3)).astype(
        np.float32
    )
    ours = np.asarray(enc(jnp.asarray(img)), np.float32)

    # torch oracle (open_clip VisionTransformer.forward)
    z = torch.from_numpy(img)
    mean = torch.tensor(ce.CLIP_MEAN)
    std = torch.tensor(ce.CLIP_STD)
    z = ((z - mean) / std).permute(2, 0, 1)[None]
    tok = tF.conv2d(z, sd["visual.conv1.weight"], stride=ce.PATCH)
    tok = tok.reshape(1, W, -1).permute(0, 2, 1)[0]  # [49, W]
    x = torch.cat([sd["visual.class_embedding"][None], tok], dim=0)
    x = x + sd["visual.positional_embedding"]
    x = tF.layer_norm(x, (W,), sd["visual.ln_pre.weight"],
                      sd["visual.ln_pre.bias"])
    x = _torch_resblock(
        {k.replace("visual.transformer.resblocks.0.", ""): v
         for k, v in sd.items()
         if k.startswith("visual.transformer.resblocks.0.")},
        "", x[None], ce.HEADS,
    )[0]
    x = tF.layer_norm(x, (W,), sd["visual.ln_post.weight"],
                      sd["visual.ln_post.bias"])
    feat = x[0] @ sd["visual.proj"]
    feat = (feat / feat.norm()).numpy()

    err = float(np.max(np.abs(ours - feat)))
    assert err < 1e-4, f"CLIP image tower mismatch: {err:.2e}"


def test_clip_text_converter_matches_torch(tmp_path, monkeypatch):
    monkeypatch.setattr(ct, "T_LAYERS", 1)
    W = ct.T_WIDTH
    vocab = 128  # synthetic: shapes flow from the dict, not the constant
    g = torch.Generator().manual_seed(5)

    def r(*shape, s=0.02):
        return torch.randn(shape, generator=g) * s

    sd = {
        "token_embedding.weight": r(vocab, W),
        "positional_embedding": r(ct.CONTEXT, W),
        "ln_final.weight": 1 + 0.1 * r(W),
        "ln_final.bias": 0.1 * r(W),
        "text_projection": r(W, ct.EMBED),
    }
    sd.update(_resblock_sd("transformer.resblocks.0.", W, g))

    path = str(tmp_path / "clip_text.npz")
    ct.convert_open_clip_text({k: v.numpy() for k, v in sd.items()}, path)
    enc = ct.load_text_encoder(path)

    rng = np.random.default_rng(2)
    tokens = np.zeros((ct.CONTEXT,), np.int32)
    n = 11
    tokens[:n] = rng.integers(1, vocab - 1, n)
    tokens[n - 1] = vocab - 1  # EOT = highest id (argmax pooling)
    ours = np.asarray(enc(jnp.asarray(tokens)), np.float32)

    x = sd["token_embedding.weight"][torch.from_numpy(tokens).long()]
    x = x + sd["positional_embedding"]
    mask = torch.full((ct.CONTEXT, ct.CONTEXT), float("-inf"))
    mask.triu_(1)
    x = _torch_resblock(sd, "transformer.resblocks.0.", x[None],
                        ct.T_HEADS, attn_mask=mask)[0]
    x = tF.layer_norm(x, (W,), sd["ln_final.weight"], sd["ln_final.bias"])
    feat = x[int(np.argmax(tokens))] @ sd["text_projection"]
    feat = (feat / feat.norm()).numpy()

    err = float(np.max(np.abs(ours - feat)))
    assert err < 1e-4, f"CLIP text tower mismatch: {err:.2e}"
