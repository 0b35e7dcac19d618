"""Evaluation CLI: PSNR/SSIM discretization-generalization study.

Reproduces the reference's published study (abstract.pdf p.2 Fig.3 /
BASELINE.md): one trained model, rollouts at 0.5x..4x resampled particle
densities (regular and jittered), PSNR/SSIM against the target image.

    python -m sph_nca_tpu.cli.eval --checkpoint ckpt --img target.png \
        --base_size 64 --densities 0.5,1,2,4
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def str2bool_eval(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "t", "yes", "y")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--weights_json", type=str, default="")
    p.add_argument(
        "--img", type=str, default="",
        help="target image; defaults to the one recorded in the checkpoint",
    )
    p.add_argument(
        "--base_size", type=int, default=0,
        help="particle grid side at 1x density; 0 = training image_size "
        "from the checkpoint (the protocol of the reference study)",
    )
    p.add_argument(
        "--target_size", type=int, default=0,
        help="target image resolution; 0 = training target_size",
    )
    p.add_argument(
        "--seed_radius", type=float, default=0.0,
        help="initial radial seed radius; 0 = training value",
    )
    p.add_argument("--densities", type=str, default="0.5,1,2,4")
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--jitter", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    p.add_argument(
        "--texture", type=str2bool_eval, default=False,
        help="texture mode: score stationary statistics "
        "(spectrum/color L1) of wrapped random-state rollouts against "
        "the exemplar image instead of PSNR/SSIM (OT/style-trained "
        "models have no pixel-aligned target)",
    )
    p.add_argument("--platform", type=str, default="auto",
                   help="JAX platform (auto/cpu/tpu); cpu rides out "
                        "TPU-tunnel outages")
    args = p.parse_args(argv)

    from ..utils.profiling import select_platform

    select_platform(args.platform)

    from ..eval import density_sweep, texture_eval
    from ..io import load_checkpoint, load_weights_json
    from ..utils.image import load_image

    train_args = {}
    if args.weights_json:
        m = load_weights_json(args.weights_json)
        params, cfg, h = m.params, m.cfg, m.h
    elif args.checkpoint:
        ck = load_checkpoint(args.checkpoint)
        params, cfg, h = ck["params"], ck["model_cfg"], ck["h"]
        train_args = (ck.get("meta") or {}).get("extra", {}).get("args", {})
    else:
        raise SystemExit("need --checkpoint or --weights_json")

    # Reproduce the TRAINING geometry by default (train.py:82's
    # image_scale): 1x density = the trained particle spacing, target in
    # the domain center, the trained seed radius. Evaluating any other
    # geometry measures a different protocol than the reference study.
    base_size = args.base_size or int(train_args.get("image_size", 64))
    target_size = args.target_size or int(train_args.get("target_size", 64))
    seed_radius = args.seed_radius or float(
        train_args.get("initial_feature_radius", 0.0)
    ) or None
    image_scale = target_size / base_size
    img_path = args.img or train_args.get("img", "")
    if not img_path:
        raise SystemExit("need --img (checkpoint records no target image)")
    premultiply = bool(train_args.get("alpha_premultiply", True))

    target = load_image(
        img_path, max_size=target_size, alpha_premultiply=premultiply
    )
    densities = tuple(float(s) for s in args.densities.split(","))

    if args.texture:
        res = texture_eval(
            params, cfg, h, np.asarray(target)[..., :3],
            base_size=base_size,
            steps=args.steps,
            densities=tuple(d for d in densities if d >= 1.0) or (1.0,),
            jitters=(0.0, args.jitter) if args.jitter else (0.0, 0.5),
            seed=args.seed,
            use_3d=bool(train_args.get("use_3d", True)),
        )
        print(
            f"baselines: self spectrum_l1="
            f"{res['baseline_self']['spectrum_l1']:.4f} color_l1="
            f"{res['baseline_self']['color_l1']:.4f} | gray spectrum_l1="
            f"{res['baseline_gray']['spectrum_l1']:.4f} color_l1="
            f"{res['baseline_gray']['color_l1']:.4f}"
        )
        print(f"{'density':>8} {'jitter':>7} {'spec_l1':>9} {'color_l1':>9}")
        for r in res["sweep"]:
            print(
                f"{r['density']:8.2f} {r['jitter']:7.2f} "
                f"{r['spectrum_l1']:9.4f} {r['color_l1']:9.4f}"
            )
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(res, f, indent=2)
            print(f"wrote {args.out}")
        return 0

    print(
        f"protocol: base_size={base_size} target_size={target_size} "
        f"image_scale={image_scale:.3f} seed_radius={seed_radius} "
        f"steps={args.steps} img={img_path}"
    )
    results = density_sweep(
        params, cfg, h, target,
        base_size=base_size, densities=densities,
        steps=args.steps, jitter=args.jitter, seed=args.seed,
        image_scale=image_scale, seed_radius=seed_radius,
    )

    print(f"{'density':>8} {'particles':>10} {'PSNR dB':>9} {'SSIM':>7}")
    for r in results:
        print(
            f"{r['density']:8.2f} {r['n_particles']:10d} "
            f"{r['psnr']:9.2f} {r['ssim']:7.3f}"
        )
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
