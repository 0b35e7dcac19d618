"""Feature extractors (VGG19-in-JAX, CLIP ViT-B/32-in-JAX) + loss plumbing."""

import numpy as np
import jax
import jax.numpy as jnp

from sph_nca_tpu.training.clip_encoder import (
    CLIPImageEncoder,
    get_clip_encoder,
    random_clip_encoder,
)
from sph_nca_tpu.training.features import (
    VGGFeatures,
    get_vgg_features,
    random_vgg19_features,
    scale_pyramid,
)
from sph_nca_tpu.training.losses import (
    CLIPLossConfig,
    OTLossConfig,
    clip_loss,
    ot_loss,
    spherical_distance,
)


def test_vgg_feature_shapes():
    vgg = random_vgg19_features()
    img = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)), jnp.float32)
    feats = vgg(img)
    assert len(feats) == 5
    # conv_1/2 at 64x64, conv_3/4 at 32x32, conv_5 at 16x16
    assert feats[0].shape == (64 * 64, 64)
    assert feats[1].shape == (64 * 64, 64)
    assert feats[2].shape == (32 * 32, 128)
    assert feats[3].shape == (32 * 32, 128)
    assert feats[4].shape == (16 * 16, 256)


def test_vgg_weight_roundtrip(tmp_path):
    import numpy as np

    from sph_nca_tpu.training.features import load_vgg19_features

    vgg = random_vgg19_features(3)
    np.savez(
        tmp_path / "vgg.npz",
        **{
            f"conv{i+1}_w": np.asarray(w)
            for i, w in enumerate(vgg.weights)
        },
        **{
            f"conv{i+1}_b": np.asarray(b)
            for i, b in enumerate(vgg.biases)
        },
    )
    vgg2 = load_vgg19_features(str(tmp_path / "vgg.npz"))
    img = jnp.ones((32, 32, 3)) * 0.5
    f1 = vgg(img)
    f2 = vgg2(img)
    for a, b in zip(f1, f2):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_ot_loss_prefers_matching_texture():
    """OT loss of an image against itself < against a different image."""
    rng = np.random.default_rng(0)
    vgg = random_vgg19_features()
    tgt = jnp.asarray(rng.random((32, 32, 4)), jnp.float32)
    cfg = OTLossConfig(image_size=32, overflow_weight=0.0)
    target_rgb = tgt[..., :3]
    target_feats = vgg(target_rgb)

    x = jnp.zeros((32 * 32, 2))
    A_match = jnp.concatenate(
        [tgt.reshape(-1, 4), jnp.zeros((32 * 32, 12))], -1
    )
    A_other = jnp.asarray(rng.random((32 * 32, 16)), jnp.float32)
    key = jax.random.key(0)
    l_match = float(ot_loss(x, A_match, target_feats, target_rgb, vgg, key, cfg))
    l_other = float(ot_loss(x, A_other, target_feats, target_rgb, vgg, key, cfg))
    assert l_match < l_other


def test_clip_encoder_shapes_and_norm():
    enc = random_clip_encoder()
    img = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)), jnp.float32)
    e = enc(img)
    assert e.shape == (512,)
    assert np.isclose(float(jnp.linalg.norm(e)), 1.0, atol=1e-5)


def test_spherical_distance():
    u = jnp.asarray([[1.0, 0.0]])
    assert float(spherical_distance(u, u)) < 1e-10
    v = jnp.asarray([[0.0, 1.0]])
    # |u-v| = sqrt(2) -> 2*arcsin(sqrt(2)/2)^2 = 2*(pi/4)^2
    assert np.isclose(
        float(spherical_distance(u, v)), 2 * (np.pi / 4) ** 2, atol=1e-6
    )


def test_clip_loss_runs_end_to_end():
    enc = random_clip_encoder()
    rng = np.random.default_rng(0)
    text_feat = jnp.asarray(rng.normal(size=512), jnp.float32)
    text_feat = text_feat / jnp.linalg.norm(text_feat)
    cfg = CLIPLossConfig(image_size=16, scales=(1.0, 0.5), overflow_weight=0.05)
    x = jnp.zeros((256, 2))
    A = jnp.asarray(rng.random((256, 16)), jnp.float32)
    l = clip_loss(x, A, text_feat, enc, jax.random.key(0), cfg)
    assert np.isfinite(float(l))
    # differentiable
    g = jax.grad(lambda A: clip_loss(x, A, text_feat, enc, jax.random.key(0), cfg))(A)
    assert np.all(np.isfinite(np.asarray(g)))


def test_scale_pyramid():
    img = jnp.ones((32, 32, 3))
    views = scale_pyramid(img, (1.0, 2.0, 0.5), jax.random.key(0))
    assert views[0].shape == (32, 32, 3)
    assert views[1].shape == (16, 16, 3)
    assert views[2].shape == (16, 16, 3)


def test_gram_style_loss():
    from sph_nca_tpu.training.losses import gram_matrix, gram_style_loss

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    g = np.asarray(gram_matrix(f))
    want = (np.asarray(f).T @ np.asarray(f)) / (16 * 64)
    assert np.allclose(g, want, atol=1e-5)
    assert float(gram_style_loss([f], [f])) < 1e-10
    f2 = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32) * 2)
    assert float(gram_style_loss([f], [f2])) > 1e-4


def test_convert_torchvision_vgg19_recorded_schema(tmp_path):
    """Converter validated against torchvision's RECORDED vgg19 layout.

    This environment has no model zoo (no torchvision, no egress), so
    real weights cannot be loaded; instead this pins the exact schema a
    real `vgg19().features.state_dict()` has — key names `features.{0,2,
    5,7,10}.{weight,bias}` and OIHW shapes ([64,3,3,3], [64,64,3,3],
    [128,64,3,3], [128,128,3,3], [256,128,3,3]; torchvision.models.vgg
    cfg 'E') — and checks the OIHW->HWIO transpose numerically with a
    delta-filter probe, so a converted real checkpoint is correct by
    construction.
    """
    import jax.numpy as jnp

    from sph_nca_tpu.training.features import (
        convert_torchvision_vgg19,
        load_vgg19_features,
    )

    recorded = {  # (key index, OIHW shape) as in torchvision vgg19
        0: (64, 3, 3, 3),
        2: (64, 64, 3, 3),
        5: (128, 64, 3, 3),
        7: (128, 128, 3, 3),
        10: (256, 128, 3, 3),
    }
    rng = np.random.default_rng(0)
    sd = {}
    for li, shape in recorded.items():
        sd[f"features.{li}.weight"] = rng.normal(size=shape).astype(np.float32)
        sd[f"features.{li}.bias"] = rng.normal(size=shape[0]).astype(np.float32)
    # orientation probe: conv1 filter 7 responds only to input channel 2
    # at kernel tap (kh=0, kw=2)
    w0 = np.zeros((64, 3, 3, 3), np.float32)
    w0[7, 2, 0, 2] = 1.0
    sd["features.0.weight"] = w0
    sd["features.0.bias"] = np.zeros(64, np.float32)

    out = str(tmp_path / "vgg.npz")
    convert_torchvision_vgg19(sd, out)
    vgg = load_vgg19_features(out)
    for i, (li, shape) in enumerate(recorded.items()):
        assert vgg.weights[i].shape == (shape[2], shape[3], shape[1], shape[0])

    # delta probe: output pixel (y, x) of filter 7 must equal the
    # normalized input channel 2 at (y-1, x+1) (SAME padding, tap (0,2))
    img = np.asarray(rng.random((8, 8, 3)), np.float32)
    feats = vgg(jnp.asarray(img))
    f7 = np.asarray(feats[0]).reshape(8, 8, 64)[..., 7]
    from sph_nca_tpu.training.features import IMAGENET_MEAN, IMAGENET_STD

    z2 = (img[..., 2] - IMAGENET_MEAN[2]) / IMAGENET_STD[2]
    np.testing.assert_allclose(f7[1:, :-1], z2[:-1, 1:], rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Gabor texture features (pretrained-free OT feature stack, round 4)
# ---------------------------------------------------------------------------


def test_gabor_feature_shapes_and_determinism():
    from sph_nca_tpu.training.features import (
        gabor_texture_features,
        get_texture_features,
    )

    fx = gabor_texture_features(n_orient=6, n_scales=3)
    img = jnp.asarray(
        np.random.default_rng(0).random((48, 48, 3)), jnp.float32
    )
    feats = fx(img)
    assert len(feats) == 3
    # c = 3 rgb + 6 even + 6 odd + 6 mag + 6 cross
    assert [tuple(f.shape) for f in feats] == [
        (48 * 48, 27), (24 * 24, 27), (12 * 12, 27)
    ]
    # deterministic (no weights, no RNG)
    fx2 = get_texture_features("gabor")
    feats2 = fx2(img)
    for a, b in zip(feats, feats2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gabor_orientation_selectivity():
    """Horizontal stripes excite the vertical-frequency Gabor channel
    (theta = 90 deg: u = y) far more than the orthogonal one."""
    from sph_nca_tpu.training.features import gabor_texture_features

    fx = gabor_texture_features(n_orient=6, n_scales=1)
    y = np.arange(64)[:, None]
    img = np.repeat(
        (0.5 + 0.5 * np.sin(2 * np.pi * y / 4.0))[..., None], 3, axis=-1
    ) * np.ones((64, 64, 3))
    feats = fx(jnp.asarray(img, jnp.float32))
    mag = np.asarray(feats[0])[:, 15:21].reshape(64, 64, 6)
    # orientation k has filter axis theta = pi*k/6; stripes vary along y
    # -> strongest response at theta = pi/2 (k = 3), weakest at k = 0
    energy = (mag**2).mean(axis=(0, 1))
    assert energy[3] > 10.0 * energy[0]


def test_gabor_ot_loss_discriminates():
    """OT loss over Gabor features: same-texture < different-texture."""
    from sph_nca_tpu.training.features import gabor_texture_features
    from sph_nca_tpu.training.losses import ot_feature_loss

    fx = gabor_texture_features(n_orient=6, n_scales=3)
    rng = np.random.default_rng(3)
    y = np.arange(48)[:, None] * np.ones((1, 48))
    stripes = np.repeat(
        (0.5 + 0.5 * np.sin(2 * np.pi * y / 6.0))[..., None], 3, -1
    )
    noise = rng.random((48, 48, 3))
    stripes2 = np.clip(
        stripes + 0.05 * rng.standard_normal(stripes.shape), 0, 1
    )
    f_a = fx(jnp.asarray(stripes, jnp.float32))
    f_a2 = fx(jnp.asarray(stripes2, jnp.float32))
    f_n = fx(jnp.asarray(noise, jnp.float32))
    key = jax.random.key(0)
    near = float(ot_feature_loss(f_a2, f_a, key))
    far = float(ot_feature_loss(f_n, f_a, key))
    assert near < 0.3 * far
