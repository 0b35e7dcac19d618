"""CLI end-to-end tests (tiny configs, CPU backend)."""

import json
import os
import sys

import numpy as np
import pytest

BUNNY = "/root/reference/code/data/bunny.obj"


def test_train_cli_end_to_end(tmp_path):
    """Tiny training run through the real CLI: checkpoints + metrics +
    weights JSON all written; resume from the checkpoint works."""
    from PIL import Image

    from sph_nca_tpu.cli.train import main

    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = [255, 128, 0, 255]
    img_path = str(tmp_path / "t.png")
    Image.fromarray(img).save(img_path)

    out = str(tmp_path / "ckpt")
    rc = main([
        "--img", img_path, "--image_size", "16", "--target_size", "16",
        "--h", "0.25", "--training_iter", "6", "--batch_size", "2",
        "--pool_size", "4", "--steps_range", "4,6", "--steps_increment", "2",
        "--channels", "8", "--hidden", "16", "--checkpoint_every", "6",
        "--output_dir", out, "--log_every", "5",
    ])
    assert rc == 0
    entries = os.listdir(out)
    ck = [e for e in entries if e.startswith("sphnca-") and not e.endswith(".json")]
    assert ck, entries
    assert any(e.endswith(".json") for e in entries)
    assert any(e.startswith("metrics-") for e in entries)

    # resume from the checkpoint
    rc = main([
        "--img", img_path, "--image_size", "16", "--target_size", "16",
        "--h", "0.25", "--training_iter", "2", "--batch_size", "2",
        "--pool_size", "4", "--steps_range", "4,6", "--channels", "8",
        "--hidden", "16", "--checkpoint_every", "100",
        "--pretrained_checkpoint", os.path.join(out, ck[0]),
        "--output_dir", str(tmp_path / "resume"), "--log_every", "5",
    ])
    assert rc == 0


def test_test_cli_image_mode(tmp_path):
    """Inference CLI over a checkpoint-free weights JSON round trip."""
    import jax

    from sph_nca_tpu.cli.test import main
    from sph_nca_tpu.io import save_weights_json
    from sph_nca_tpu.models import SPHNCAConfig, init_params

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=4.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.25, mode="image")

    out = str(tmp_path / "out")
    rc = main([
        "--weights_json", wpath, "--image_size", "16", "--steps", "3",
        "--export_every", "3", "--output_dir", out,
    ])
    assert rc == 0
    run_dir = os.path.join(out, os.listdir(out)[0])
    files = os.listdir(run_dir)
    assert "states.npz" in files
    assert any(f.endswith(".png") for f in files)


@pytest.mark.skipif(not os.path.exists(BUNNY), reason="bunny.obj unavailable")
def test_test_cli_surface_mode(tmp_path):
    """3D surface mode on the real bunny mesh (tiny point count)."""
    import jax

    from sph_nca_tpu.cli.test import main
    from sph_nca_tpu.io import save_weights_json
    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from sph_nca_tpu.utils.meshes import load_ply_points

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=10.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.1, mode="image")

    out = str(tmp_path / "out")
    rc = main([
        "--weights_json", wpath, "--surface", BUNNY,
        "--surface_numpoints", "600", "--surface_numseed", "3",
        "--steps", "3", "--export_every", "3", "--output_dir", out,
    ])
    assert rc == 0
    run_dir = os.path.join(out, os.listdir(out)[0])
    plys = [f for f in os.listdir(run_dir) if f.endswith(".ply")]
    assert plys
    pts, rgba = load_ply_points(os.path.join(run_dir, plys[0]))
    assert pts.shape == (600, 3)
    assert np.abs(pts).max() <= 1.0 + 1e-5  # normalized mesh


def test_eval_cli(tmp_path):
    import jax

    from sph_nca_tpu.cli.eval import main
    from sph_nca_tpu.io import save_weights_json
    from sph_nca_tpu.models import SPHNCAConfig, init_params
    from PIL import Image

    cfg = SPHNCAConfig(channels=8, hidden=16, normalize_perception=4.0)
    params = init_params(jax.random.key(0), cfg)
    wpath = str(tmp_path / "w.json")
    save_weights_json(wpath, params, cfg, h=0.25, mode="image")
    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = [0, 200, 0, 255]
    ipath = str(tmp_path / "t.png")
    Image.fromarray(img).save(ipath)

    out_json = str(tmp_path / "sweep.json")
    rc = main([
        "--weights_json", wpath, "--img", ipath, "--base_size", "12",
        "--densities", "1,2", "--steps", "3", "--out", out_json,
    ])
    assert rc == 0
    res = json.load(open(out_json))
    assert len(res) == 2 and "psnr" in res[0]


def test_train_cli_exact_resume(tmp_path):
    """A killed-and-resumed run reproduces an unbroken run's loss
    trajectory and final weights exactly (pool + RNG + optimizer state
    all round-trip through the resume sidecar)."""
    from PIL import Image

    from sph_nca_tpu.cli.train import main
    from sph_nca_tpu.io import load_checkpoint

    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = [255, 128, 0, 255]
    img_path = str(tmp_path / "t.png")
    Image.fromarray(img).save(img_path)

    base = [
        "--img", img_path, "--image_size", "16", "--target_size", "16",
        "--h", "0.25", "--batch_size", "2", "--pool_size", "4",
        "--steps_range", "4,6", "--steps_increment", "2",
        "--channels", "8", "--hidden", "16", "--checkpoint_every", "4",
        "--log_every", "1", "--seed", "3",
    ]

    def losses_of(out_dir):
        recs = []
        for name in sorted(os.listdir(out_dir)):
            if name.startswith("metrics-"):
                with open(os.path.join(out_dir, name)) as f:
                    recs += [json.loads(l) for l in f if l.strip()]
        return {r["step"]: r["loss"] for r in recs}

    # unbroken run: iterations 0..8
    full = str(tmp_path / "full")
    assert main(base + ["--training_iter", "8", "--output_dir", full]) == 0

    # broken run: stops after iteration 4 (checkpoint+sidecar at step 4)
    broken = str(tmp_path / "broken")
    assert main(base + ["--training_iter", "4", "--output_dir", broken]) == 0
    # resume it to 8
    assert main(
        base
        + ["--training_iter", "8", "--output_dir", broken, "--resume", "auto"]
    ) == 0

    lf, lb = losses_of(full), losses_of(broken)
    for step in range(4, 9):
        assert lb[step] == lf[step], (step, lb[step], lf[step])

    def final_params(out_dir):
        cks = [
            e for e in os.listdir(out_dir)
            if e.startswith("sphnca-") and e.endswith("-0008")
        ]
        assert cks, os.listdir(out_dir)
        return load_checkpoint(os.path.join(out_dir, cks[0]))["params"]

    pf, pb = final_params(full), final_params(broken)
    for a, b in zip(pf, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the superseded sidecar was pruned; only the latest keeps one
    sidecars = [
        d for d in os.listdir(broken)
        if os.path.isdir(os.path.join(broken, d))
        and os.path.exists(os.path.join(broken, d, "resume.npz"))
    ]
    assert sidecars == [s for s in sidecars if s.endswith("-0008")], sidecars


def test_train_cli_clip_text_embed(tmp_path):
    """Text-mode training through the --clip_text_embed path (a
    precomputed normalized text embedding steers the CLIP loss without
    the text tower — the reference's text mode with offline-computed
    embeddings). Loss must be finite and a checkpoint written."""
    from sph_nca_tpu.cli.train import main

    emb = np.random.default_rng(0).normal(size=512).astype(np.float32)
    emb /= np.linalg.norm(emb)
    emb_path = str(tmp_path / "text_embed.npy")
    np.save(emb_path, emb)

    out = str(tmp_path / "ckpt")
    rc = main([
        "--loss", "clip_multiscale", "--clip_text_embed", emb_path,
        "--wrap", "true", "--use_alpha", "false",
        "--initial_feature", "random",
        "--image_size", "16", "--target_size", "16",
        "--h", "0.25", "--training_iter", "3", "--batch_size", "2",
        "--pool_size", "4", "--steps_range", "3,4",
        "--channels", "8", "--hidden", "16", "--checkpoint_every", "3",
        "--output_dir", out, "--log_every", "2",
    ])
    assert rc == 0
    metrics = [e for e in os.listdir(out) if e.startswith("metrics-")]
    assert metrics
    lines = open(os.path.join(out, metrics[0])).read().strip().splitlines()
    losses = [json.loads(l)["loss"] for l in lines]
    assert all(np.isfinite(losses))


def test_train_cli_soft_resume_without_sidecar(tmp_path):
    """--resume on a checkpoint saved with --save_resume false restores
    params + optimizer and continues with a fresh pool (soft resume)
    instead of crashing on the missing sidecar."""
    from PIL import Image

    from sph_nca_tpu.cli.train import main

    img = np.zeros((16, 16, 4), np.uint8)
    img[4:12, 4:12] = [0, 128, 255, 255]
    img_path = str(tmp_path / "t.png")
    Image.fromarray(img).save(img_path)

    out = str(tmp_path / "ckpt")
    common = [
        "--img", img_path, "--image_size", "16", "--target_size", "16",
        "--h", "0.25", "--batch_size", "2", "--pool_size", "4",
        "--steps_range", "3,4", "--channels", "8", "--hidden", "16",
        "--output_dir", out, "--log_every", "2",
    ]
    rc = main(common + ["--training_iter", "3", "--checkpoint_every", "3",
                        "--save_resume", "false"])
    assert rc == 0
    ck = [e for e in os.listdir(out)
          if e.startswith("sphnca-") and not e.endswith(".json")][0]
    rc = main(common + ["--training_iter", "5", "--checkpoint_every", "99",
                        "--resume", os.path.join(out, ck)])
    assert rc == 0
