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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--weights_json", type=str, default="")
    p.add_argument("--img", type=str, required=True)
    p.add_argument("--base_size", type=int, default=64)
    p.add_argument("--densities", type=str, default="0.5,1,2,4")
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--jitter", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    import numpy as np

    from ..eval import density_sweep
    from ..io import load_checkpoint, load_weights_json
    from ..utils.image import load_image

    if args.weights_json:
        m = load_weights_json(args.weights_json)
        params, cfg, h = m.params, m.cfg, m.h
    elif args.checkpoint:
        ck = load_checkpoint(args.checkpoint)
        params, cfg, h = ck["params"], ck["model_cfg"], ck["h"]
    else:
        raise SystemExit("need --checkpoint or --weights_json")

    target = load_image(args.img, max_size=args.base_size)
    densities = tuple(float(s) for s in args.densities.split(","))

    results = density_sweep(
        params, cfg, h, target,
        base_size=args.base_size, densities=densities,
        steps=args.steps, jitter=args.jitter, seed=args.seed,
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
