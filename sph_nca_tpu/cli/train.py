"""Training CLI — flag-compatible re-design of the reference train.py.

Usage:
    python -m sph_nca_tpu.cli.train --img path/to/target.png --image_size 100 \
        --h 0.1 --training_iter 8000 --batch_size 8 --pool_size 1024

Differences from the reference (train.py):
  * --target <emoji> resolves through a local PNG cache (no network egress
    here) — see utils/image.load_emoji;
  * checkpoints carry optimizer state for exact resume (the reference
    restores weights only, train.py:266-269);
  * a weights JSON compatible with the reference web demo is exported next
    to every checkpoint;
  * --use_3d controls the reference's USE_3D z-padding (default on, as
    train.py:114 hard-codes).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    # Flags mirror the reference CLI (train.py:27-61).
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target", type=str, default="", help="emoji target")
    p.add_argument("--img", type=str, default="", help="image file target")
    p.add_argument(
        "--initial_feature", choices=["radial", "random"], default="radial"
    )
    p.add_argument("--initial_feature_radius", type=float, default=-1)
    p.add_argument(
        "--loss",
        choices=["mse_simple", "ot", "clip_multiscale"],
        default="mse_simple",
    )
    p.add_argument("--use_alpha", type=str2bool, default=True)
    p.add_argument("--wrap", type=str2bool, default=False)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--target_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--training_iter", type=int, default=8000)
    p.add_argument("--steps_range", type=str, default="32,48")
    p.add_argument("--steps_increment", type=int, default=5)
    p.add_argument("--loss_weight_color", type=float, default=0.05)
    p.add_argument("--loss_weight_clip", type=float, default=1)
    p.add_argument("--loss_weight_overflow", type=float, default=0.05)
    p.add_argument("--loss_weight_style", type=float, default=1)
    p.add_argument("--clip_guide", type=str, default="")
    p.add_argument("--clip_multiscale_scales", type=str, default="1")
    p.add_argument("--nca_update", choices=["orig", "gated"], default="gated")
    p.add_argument("--nca_normalize_grad", type=str2bool, default=True)
    p.add_argument("--nca_normalize_perception", type=float, default=-1)
    p.add_argument("--alpha_premultiply", type=str2bool, default=True)
    p.add_argument("--pretrained_checkpoint", type=str, default="")
    p.add_argument("--optimizer", type=str, default="Adam",
                   help="optax optimizer name (reference train.py:56; "
                        "unknown names fall back to Adam)")
    p.add_argument("--degrade_prob", type=float, default=0.0,
                   help="pool state degradation probability "
                        "(regeneration training, reference nca.py:445)")
    p.add_argument("--erase_radius", type=float, default=0.0,
                   help="radial damage radius on sampled pool states "
                        "(reference nca.py:448-454 erase_R)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--pool_size", type=int, default=1024)
    p.add_argument("--h", type=float, default=0.08)
    p.add_argument("--output_dir", type=str, default="./checkpoints/")
    # new flags
    p.add_argument("--use_3d", type=str2bool, default=True,
                   help="pad plane to 3D (reference USE_3D)")
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--vgg_weights", type=str, default="",
                   help="npz with VGG19 conv weights for the OT loss "
                        "(implies --texture_features vgg)")
    p.add_argument("--texture_features",
                   choices=["gabor", "vgg", "vgg_random"],
                   default="gabor",
                   help="OT-loss feature extractor: gabor (fixed "
                        "multi-scale oriented bank + cross-scale stats, "
                        "the pretrained-free default), vgg (needs "
                        "--vgg_weights), vgg_random (fixed-seed random "
                        "filters, round-3 behavior)")
    p.add_argument("--clip_weights", type=str, default="",
                   help="npz with CLIP ViT-B/32 weights (image tower via "
                        "convert_open_clip, text tower via "
                        "convert_open_clip_text; may be one combined "
                        "file). Without it, fixed-seed random towers run "
                        "the full pipeline (not semantically CLIP)")
    p.add_argument("--clip_bpe", type=str, default="",
                   help="path to CLIP's bpe_simple_vocab_16e6.txt.gz for "
                        "real tokenization of --clip_guide")
    p.add_argument("--clip_text_embed", type=str, default="",
                   help=".npy with a precomputed normalized text "
                        "embedding [512] (overrides --clip_guide encoding)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument(
        "--device_pool", type=str, default="auto",
        choices=("auto", "on", "off"),
        help="keep the replay pool in device HBM (auto: when < 4 GB)",
    )
    p.add_argument("--engine", choices=["band", "cells", "graph"],
                   default="band",
                   help="neighborhood engine: band (curve-banded pair "
                        "tables, the round-3 flagship), cells "
                        "(cell-dense + Pallas), or graph (fixed-K "
                        "neighbor lists)")
    p.add_argument("--smoothing_kernel",
                   choices=["poly6", "wendlandC2", "wendlandC4"],
                   default="poly6",
                   help="SPH smoothing kernel (reference "
                        "sphops/ops/kernels.py:6 module constant); band "
                        "and graph engines accept all three, cells is "
                        "poly6-only (Pallas kernels hard-wire the core)")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint dir to resume from (pool + RNG + "
                        "optimizer state restored exactly), or 'auto' to "
                        "pick the latest resumable checkpoint in "
                        "--output_dir")
    p.add_argument("--save_resume", type=str2bool, default=True,
                   help="write the full-resume sidecar (pool + RNG states) "
                        "with each checkpoint; the previous checkpoint's "
                        "sidecar is pruned to bound disk use")
    p.add_argument("--platform", type=str, default="auto",
                   help="JAX platform: auto (default resolution), cpu, "
                        "tpu, ... — use cpu to train through a TPU-tunnel "
                        "outage (env SPH_NCA_PLATFORM also honored)")
    p.add_argument("--max_rss_gb", type=float, default=0.0,
                   help="if >0, save a resumable checkpoint and exit with "
                        "code 42 when host RSS exceeds this many GB (rerun "
                        "with --resume auto to continue; works around "
                        "host-memory growth on long runs)")
    return p


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
    except OSError:
        pass
    return 0.0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(args)

    import jax
    import jax.numpy as jnp

    from ..utils.profiling import enable_compilation_cache, select_platform

    select_platform(args.platform)
    enable_compilation_cache()

    from .. import ops
    from ..io import (
        find_latest_resumable,
        load_checkpoint,
        load_resume_state,
        restore_opt_state,
        save_checkpoint,
        save_resume_state,
        save_weights_json,
    )
    from ..models import SPHNCAConfig
    from ..training import (
        MSELossConfig,
        OTLossConfig,
        CLIPLossConfig,
        Pool,
        TrainConfig,
        Trainer,
        make_mse_bundle,
        make_ot_bundle,
    )
    from ..utils.geometry import grange
    from ..utils.image import flat_color_target, load_emoji, load_image
    from ..utils.seeds import plane_seed

    h = args.h
    m = args.image_size
    image_scale = args.target_size / m
    seed_radius = (
        args.initial_feature_radius if args.initial_feature_radius > 0 else h
    )
    norm_perception = (
        args.nca_normalize_perception
        if args.nca_normalize_perception > 0
        else 1.0 / h
    )
    steps_range = tuple(int(s) for s in args.steps_range.split(","))

    # --- target image (reference train.py:218-234) -----------------------
    if args.target:
        img_np = load_emoji(
            args.target, args.target_size, args.alpha_premultiply
        )
    elif args.img:
        img_np = load_image(
            args.img, args.target_size, args.alpha_premultiply
        )
    else:
        img_np = flat_color_target(args.target_size)
    img = jnp.asarray(img_np)
    print(f"target image: {img.shape}")

    # --- geometry + neighbor graph ---------------------------------------
    gmin, gsize = (-1.0, -1.0), (2.0, 2.0)
    x2 = grange((m, m), jnp.asarray(gmin), jnp.asarray(gsize)).reshape(-1, 2)
    if args.use_3d:
        x = jnp.pad(x2, ((0, 0), (0, 1)))  # z = 0 (reference nca.py:133-134)
        period = (
            jnp.asarray([gsize[0], gsize[1], 2.0]) if args.wrap else None
        )
    else:
        x = x2
        period = jnp.asarray(gsize) if args.wrap else None

    t0 = time.time()
    if args.engine == "band":
        from ..ops.bands import build_band_engine

        # the round-3 flagship pair structure (ops/bands.py): true-pair
        # band/far tables (f32 for training numerics), native C++ build
        graph = build_band_engine(x, h, period=period,
                                  smoothing=args.smoothing_kernel,
                                  table_dtype="float32")
        print(
            f"band engine: n={x.shape[0]} blocks={graph.num_cells} "
            f"P={graph.slots_per_cell} ({time.time() - t0:.1f}s"
            f"{', periodic' if args.wrap else ''})"
        )
    elif args.engine == "cells":
        from ..ops.cells import build_cell_engine

        # f32 pair tables switch the trainer onto the batched-lane
        # rollout (ops/batched.py): the whole batch shares one set of
        # table matmuls per step (measured ~10x over the vmapped
        # per-sample rollout at the reference config)
        # xla_tables=False: the trainer only uses the batched/Pallas
        # paths; skipping the per-cell einsum tables cuts the build from
        # ~8 min to seconds at the reference config
        if args.smoothing_kernel != "poly6":
            raise SystemExit(
                "--engine cells is poly6-only (the Pallas pair kernels "
                "hard-wire the core); use --engine band or graph for "
                f"{args.smoothing_kernel}"
            )
        graph = build_cell_engine(
            x, h, period=period, pair_tables="float32", xla_tables=False
        )
        print(
            f"cell engine: n={x.shape[0]} C={graph.num_cells} "
            f"M={graph.slots_per_cell} ({time.time() - t0:.1f}s"
            f"{', periodic' if args.wrap else ''})"
        )
    else:
        dims = ops.default_dims(h)
        mpc, k = ops.suggest_capacity(
            np.asarray(x), h, dims,
            period=np.asarray(period) if args.wrap else None,
        )
        graph = ops.build_graph(
            x, h, dims, max_per_cell=mpc, k=k, period=period,
            smoothing=args.smoothing_kernel,
        )
        nd = int(graph.valid.sum())
        print(
            f"graph: n={x.shape[0]} k={k} max_per_cell={mpc} "
            f"({time.time() - t0:.1f}s, avg {nd / x.shape[0]:.1f} nbrs"
            f"{', periodic' if args.wrap else ''})"
        )

    # --- model + losses ---------------------------------------------------
    model_cfg = SPHNCAConfig(
        channels=args.channels,
        hidden=args.hidden,
        fire_rate=0.5,
        update_rule=args.nca_update,
        use_alpha=args.use_alpha,
        normalize_perception=norm_perception,
        smoothing=args.smoothing_kernel,
    )

    if args.loss == "mse_simple":
        loss_cfg = MSELossConfig(
            gmin=gmin,
            gsize=gsize,
            image_scale=image_scale,
            overflow_weight=args.loss_weight_overflow,
            use_alpha=args.use_alpha,
        )
        bundle = make_mse_bundle(img, loss_cfg)
    elif args.loss == "ot":
        from ..training.features import get_texture_features

        kind = args.texture_features
        if args.vgg_weights:
            kind = "vgg"
        feature_fn = get_texture_features(kind, args.vgg_weights or None)
        ot_cfg = OTLossConfig(
            image_size=m,
            style_weight=args.loss_weight_style,
            color_weight=args.loss_weight_color,
            overflow_weight=args.loss_weight_overflow,
            use_alpha=args.use_alpha,
        )
        # target for OT is the style exemplar resampled to the particle grid
        target_hw = jax.image.resize(img, (m, m, img.shape[-1]), "bilinear")
        bundle = make_ot_bundle(target_hw, feature_fn, ot_cfg)
    else:  # clip_multiscale (reference losses.py:72-102, nca.py:470-508)
        from ..training import make_clip_bundle
        from ..training.clip_encoder import get_clip_encoder
        from ..training.clip_text import get_text_features

        if args.clip_text_embed:
            text_features = jnp.asarray(np.load(args.clip_text_embed))
        else:
            if not args.clip_guide:
                raise SystemExit(
                    "--loss clip_multiscale needs --clip_guide (a text "
                    "prompt) or --clip_text_embed"
                )
            text_features = get_text_features(
                args.clip_guide,
                weights_path=args.clip_weights or None,
                bpe_path=args.clip_bpe or None,
            )
            if not (args.clip_weights and args.clip_bpe):
                print(
                    "WARNING: encoding --clip_guide with "
                    f"{'random weights' if not args.clip_weights else ''}"
                    f"{' and ' if not (args.clip_weights or args.clip_bpe) else ''}"
                    f"{'fallback tokenizer' if not args.clip_bpe else ''}"
                    " — pipeline-correct but not semantically CLIP"
                )
        encoder = get_clip_encoder(args.clip_weights or None)
        scales = tuple(
            float(s) for s in args.clip_multiscale_scales.split(",")
        )
        clip_cfg = CLIPLossConfig(
            image_size=m,
            scales=scales,
            clip_weight=args.loss_weight_clip,
            overflow_weight=args.loss_weight_overflow,
            use_alpha=args.use_alpha,
        )
        bundle = make_clip_bundle(text_features, encoder, clip_cfg)

    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        pool_size=args.pool_size,
        training_iter=args.training_iter,
        steps_range=steps_range,
        steps_increment=args.steps_increment,
        lr=args.lr,
        normalize_grads=args.nca_normalize_grad,
        degrade_prob=args.degrade_prob,
        erase_radius=args.erase_radius,
        optimizer=args.optimizer,
        seed=args.seed,
    )

    resume_path = args.resume
    if resume_path == "auto":
        resume_path = find_latest_resumable(args.output_dir) or ""
        if resume_path:
            print(f"resume auto -> {resume_path}")
        else:
            print("resume auto: no resumable checkpoint found, fresh start")

    params = None
    resume_ck = None
    if resume_path:
        resume_ck = load_checkpoint(resume_path)
        params = resume_ck["params"]
        print(f"resuming from {resume_path} (step {resume_ck['step']})")
    elif args.pretrained_checkpoint:
        ck = load_checkpoint(args.pretrained_checkpoint)
        params = ck["params"]
        print(f"loaded pretrained checkpoint (step {ck['step']})")

    trainer = Trainer(
        model_cfg, train_cfg, graph, x2, bundle, h, params=params
    )

    from ..models.nca import num_params

    print(f"model params: {num_params(trainer.params)}")

    # --- pool + loop ------------------------------------------------------
    key = jax.random.key(args.seed)
    A_seed = plane_seed(
        x2,
        args.channels,
        gmin=gmin,
        gsize=gsize,
        radius=seed_radius,
        randomized=(args.initial_feature == "random"),
        key=key,
    )
    # device-resident pool when it fits comfortably in HBM (zero
    # host<->device state traffic per iteration; iterations pipeline)
    pool_bytes = args.pool_size * x2.shape[0] * args.channels * 4
    pool_cls = Pool
    if args.device_pool == "on" or (
        args.device_pool == "auto" and pool_bytes < 4e9
    ):
        from ..training.pool import DevicePool as pool_cls  # noqa: N813
    pool = pool_cls(
        np.asarray(x2),
        np.asarray(A_seed),
        args.pool_size,
        randomized_feat=(args.initial_feature == "random"),
        rng=np.random.default_rng(args.seed),
    )

    start_iter = 0
    if resume_ck is not None:
        if "opt_state" in resume_ck:
            trainer.opt_state = restore_opt_state(
                trainer.opt_state, resume_ck["opt_state"]
            )
        from ..io import has_resume_state

        if not has_resume_state(resume_path):
            # soft resume: the run was saved with --save_resume false —
            # params + optimizer restore exactly, the pool re-seeds and
            # RNG streams are fresh (the reference restores only
            # weights even on its warm start, train.py:266-269)
            print(
                "resume: no pool/RNG sidecar (saved with "
                "--save_resume false) — soft resume with a fresh pool"
            )
            start_iter = int(resume_ck["step"])
            resume_ck = None
        else:
            rs = load_resume_state(resume_path)
            if rs["pool_A"].shape != tuple(pool.A.shape):
                raise SystemExit(
                    f"--resume pool shape {rs['pool_A'].shape} does not "
                    f"match current config {tuple(pool.A.shape)}; rerun "
                    "with the original flags"
                )
            if hasattr(pool, "load_state"):
                pool.load_state(rs["pool_A"])
            else:
                pool.A[:] = rs["pool_A"]
            pool.rng.bit_generator.state = rs["pool_rng"]
            trainer.set_rng_state(rs["np_rng"], rs["key_data"])
            start_iter = int(resume_ck["step"])

    os.makedirs(args.output_dir, exist_ok=True)
    run_id = time.strftime("%m%d%H%M")
    t_start = time.time()
    from ..utils.profiling import MetricsLogger

    metrics = MetricsLogger(
        os.path.join(args.output_dir, f"metrics-{run_id}.jsonl")
    )
    import gc

    mode_name = "image" if args.loss == "mse_simple" else "texture"
    prev_resume_ck = [resume_path if resume_ck is not None else ""]

    def save_all(step: int, loss: float) -> str:
        ck_path = os.path.join(args.output_dir, f"sphnca-{run_id}-{step:04d}")
        save_checkpoint(
            ck_path,
            params=trainer.params,
            model_cfg=model_cfg,
            h=h,
            step=step,
            loss=loss,
            opt_state=trainer.opt_state,
            train_cfg=train_cfg,
            seed_x=np.asarray(x2),
            seed_A=np.asarray(A_seed),
            extra_meta={"args": vars(args), "mode": mode_name},
        )
        save_weights_json(
            ck_path + ".json", trainer.params, model_cfg, h, mode=mode_name
        )
        if args.save_resume:
            rng = trainer.rng_state()
            save_resume_state(
                ck_path,
                pool_A=np.asarray(pool.A),
                key_data=rng["key_data"],
                np_rng_state=rng["np_rng"],
                pool_rng_state=pool.rng.bit_generator.state,
            )
            # prune the previous sidecar (pool states are large); the
            # checkpoint itself (weights/opt_state) is kept
            prev = prev_resume_ck[0]
            if prev and prev != ck_path:
                for side in ("resume.npz", "resume_rng.json"):
                    try:
                        os.remove(os.path.join(prev, side))
                    except OSError:
                        pass
            prev_resume_ck[0] = ck_path
        print(f"saved checkpoint {ck_path}")
        return ck_path

    for i in range(start_iter, args.training_iter + 1):
        loss = trainer.run_iteration(i, pool)
        if i % 200 == 199:
            # long-run hygiene: reference cycles can delay freeing of
            # per-iteration host/device buffers (observed unbounded RSS
            # growth over multi-hour runs under tunneled PJRT backends)
            gc.collect()
        if i % args.log_every == 0:
            loss = float(loss)  # sync point (device-pool path defers)
            rate = (i + 1 - start_iter) / (time.time() - t_start)
            rss = _rss_gb()
            print(
                f"iter {i:6d}  loss {loss:.6f}  ({rate:.2f} it/s, "
                f"rss {rss:.2f} GB)",
                flush=True,
            )
            metrics.log(i, loss=loss, it_per_sec=rate, rss_gb=rss)
            if args.max_rss_gb > 0 and rss > args.max_rss_gb:
                save_all(i + 1, loss)
                metrics.close()
                print(
                    f"RSS {rss:.2f} GB > --max_rss_gb {args.max_rss_gb}; "
                    "checkpointed for --resume auto, exiting 42",
                    flush=True,
                )
                return 42
        if (i + 1) % args.checkpoint_every == 0:
            save_all(i + 1, float(loss))

    metrics.close()
    print(f"Done! total {time.time() - t_start:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
