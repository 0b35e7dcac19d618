"""Inference/rollout CLI — re-design of the reference test.py.

Image mode:
    python -m sph_nca_tpu.cli.test --checkpoint ckpt_dir --image_size 128 \
        --steps 128 --output_dir ./output
3D surface mode:
    python -m sph_nca_tpu.cli.test --checkpoint ckpt_dir --surface bunny.obj \
        --surface_numpoints 25600 --steps 128

Also accepts reference web-demo JSON weights via --weights_json (e.g. the
shipped pretrained models in docs/weights/), which the reference's test.py
cannot do.

Exports per-step PNGs (image mode) or binary PLY point clouds (surface
mode) plus a .npz with raw states, mirroring test.py:224-263.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .train import str2bool


def build_parser() -> argparse.ArgumentParser:
    # Flags mirror the reference CLI (test.py:25-46).
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--weights_json", type=str, default="",
                   help="reference web-demo JSON weights")
    p.add_argument("--seed", type=int, default=0)
    # defaults of None mean "derive from the model's mode": image-mode
    # models use alpha + radial seed, texture-mode models use no-alpha +
    # random seed + wrapped boundary (as the reference demo derives them,
    # docs/main.js:207-209)
    p.add_argument(
        "--initial_feature", choices=["radial", "random"], default=None
    )
    p.add_argument("--initial_feature_radius", type=float, default=-1)
    p.add_argument("--use_alpha", type=str2bool, default=None)
    p.add_argument("--wrap", type=str2bool, default=None)
    p.add_argument("--image_size", type=int, default=-1)
    p.add_argument("--surface", type=str, default="")
    p.add_argument("--surface_scale", type=float, default=1.0)
    p.add_argument("--surface_numpoints", type=int, default=25600)
    p.add_argument("--surface_numseed", type=int, default=10)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--nca_update", choices=["orig", "gated"], default="gated")
    p.add_argument("--nca_normalize_perception", type=float, default=-1)
    p.add_argument("--h", type=float, default=0.08)
    p.add_argument("--firerate", type=float, default=0.5)
    p.add_argument("--output_dir", type=str, default="./output/")
    p.add_argument("--use_3d", type=str2bool, default=True)
    p.add_argument("--export_every", type=int, default=1,
                   help="export every n-th step")
    p.add_argument("--engine", choices=["band", "cells", "graph"],
                   default="band")
    p.add_argument("--platform", type=str, default="auto",
                   help="JAX platform (auto/cpu/tpu); cpu rides out "
                        "TPU-tunnel outages")
    return p


def load_model(args):
    from ..io import load_checkpoint, load_weights_json
    from ..models import SPHNCAConfig

    mode = "image"
    if args.weights_json:
        m = load_weights_json(args.weights_json)
        cfg, params, h = m.cfg, m.params, m.h
        mode = m.mode
    elif args.checkpoint:
        ck = load_checkpoint(args.checkpoint)
        cfg, params, h = ck["model_cfg"], ck["params"], ck["h"]
        mode = ck["meta"].get("extra", {}).get("mode", "image")
    else:
        raise SystemExit("need --checkpoint or --weights_json")

    # derive mode-dependent defaults (reference docs/main.js:207-209)
    if args.use_alpha is None:
        args.use_alpha = mode == "image"
    if args.wrap is None:
        args.wrap = mode != "image"
    if args.initial_feature is None:
        args.initial_feature = "radial" if mode == "image" else "random"

    import dataclasses

    overrides = {}
    if args.nca_normalize_perception > 0:
        overrides["normalize_perception"] = args.nca_normalize_perception
    if args.firerate is not None:
        overrides["fire_rate"] = args.firerate
    overrides["use_alpha"] = args.use_alpha
    cfg = dataclasses.replace(cfg, **overrides)
    if args.h != build_parser().get_default("h"):
        h = args.h  # explicit override for cross-discretization rollouts
    return cfg, params, h


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(args)

    import jax
    import jax.numpy as jnp

    from ..utils.profiling import select_platform

    select_platform(args.platform)

    from .. import ops
    from ..models import rollout_states, to_rgba
    from ..utils.geometry import grange
    from ..utils.image import save_frame_png
    from ..utils.seeds import add_radial_seed, plane_seed

    cfg, params, h = load_model(args)
    print(f"model: {cfg}, h={h}")

    seed_radius = (
        args.initial_feature_radius if args.initial_feature_radius > 0 else h
    )
    dims = ops.default_dims(h)
    key = jax.random.key(args.seed)

    run_id = time.strftime("%m%d%H%M")
    out_dir = os.path.join(args.output_dir, f"sphnca-test-{run_id}")
    os.makedirs(out_dir, exist_ok=True)

    if args.surface:
        # ---- 3D surface mode (reference test.py:148-206) ----------------
        from ..models.surface import (
            DIFFUSE_DIMS,
            DIFFUSE_H,
            diffuse,
            orthogonalize,
            rollout_mesh,
        )
        from ..utils.meshes import (
            farthest_point_sampling,
            load_obj,
            normalize_mesh,
            sample_surface,
            save_ply,
            vertex_normals,
        )

        rng = np.random.default_rng(args.seed)
        v, f = load_obj(args.surface)
        v = normalize_mesh(v, args.surface_scale)
        vn = vertex_normals(v, f)
        # 8x oversample then FPS down (test.py:167-171)
        pts, fi, w = sample_surface(v, f, args.surface_numpoints * 8, rng)
        nrm = np.einsum("nc,ncd->nd", w, vn[f[fi]])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        sel = np.asarray(
            farthest_point_sampling(jnp.asarray(pts), args.surface_numpoints)
        )
        x = jnp.asarray(pts[sel])
        n_vec = jnp.asarray(nrm[sel])

        if args.engine == "graph":
            # graph engines only feed the fallback path
            mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
            graph = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)
            dmpc, dk = ops.suggest_capacity(
                np.asarray(x), DIFFUSE_H, DIFFUSE_DIMS
            )
            diffuse_graph = ops.build_graph(
                x, DIFFUSE_H, DIFFUSE_DIMS, max_per_cell=dmpc, k=dk
            )

        A = jnp.zeros((x.shape[0], cfg.channels))
        t = jnp.zeros_like(n_vec)
        if args.initial_feature == "random":
            # consistent pre-diffused tangent field (test.py:180-189)
            tc = jnp.zeros_like(n_vec)
            for _ in range(10):
                i = int(rng.integers(x.shape[0]))
                A = add_radial_seed(x, A, x[i], 0.2)
                key, kt = jax.random.split(key)
                t0 = orthogonalize(n_vec[i], jax.random.normal(kt, (3,)))
                tc = tc.at[i].set(t0)
            ones = jnp.ones_like(A)
            # pre-diffusion at radius 0.2 on a band engine: the fixed-K
            # graph needs K~2000 here and its [N, K, 4] gather lane-pads
            # to 26 GB at 25,600 points (see models.surface.diffuse_band)
            from ..models.surface import diffuse_band
            from ..ops.bands import build_band_engine as _bbe

            ceng = _bbe(np.asarray(x), 0.2)
            for _ in range(50):
                tc = diffuse_band(ceng, n_vec, tc, ones,
                                  lerp_multiplier=0.0)
            key, ka = jax.random.split(key)
            A = jax.random.uniform(ka, A.shape)
            t = tc
        else:
            seed_sel = np.asarray(
                farthest_point_sampling(x, args.surface_numseed)
            )
            for i in seed_sel:
                A = add_radial_seed(x, A, x[int(i)], seed_radius)
                key, kt = jax.random.split(key)
                t = t.at[int(i)].set(
                    orthogonalize(n_vec[int(i)], jax.random.normal(kt, (3,)))
                )

        print(f"surface rollout: n={x.shape[0]}, {args.steps} steps")
        t0_wall = time.time()
        if args.engine in ("band", "cells"):
            # fast path for ANY h: tangent perception on a band engine
            # at the model's h, the diffusion blur on a second band
            # engine at the reference's hard-coded DIFFUSE_H=0.1
            # (nca.py:357) — one engine when they coincide (every
            # shipped config). Round-2's gate `h == DIFFUSE_H` is gone.
            from ..models.surface import rollout_mesh_batched_dual
            from ..ops.bands import build_band_engine

            beng = build_band_engine(
                np.asarray(x), h, table_dtype="bfloat16",
                smoothing=cfg.smoothing,
            )
            beng_d = beng if abs(h - DIFFUSE_H) < 1e-9 else (
                build_band_engine(
                    np.asarray(x), DIFFUSE_H, table_dtype="bfloat16",
                    smoothing=cfg.smoothing,
                )
            )
            _, _, states = rollout_mesh_batched_dual(
                params, cfg, beng, beng_d, A[None], n_vec, t[None], key,
                args.steps, h, fire_rate=args.firerate, collect_all=True,
            )
            states = states[:, 0]  # single rollout in the batch dim
        else:
            _, _, states = rollout_mesh(
                params, cfg, graph, diffuse_graph, A, n_vec, t, key,
                args.steps, h, fire_rate=args.firerate, collect_all=True,
            )
        states = np.asarray(states)
        print(f"rollout {time.time() - t0_wall:.1f}s")

        np.savez(
            os.path.join(out_dir, "states.npz"),
            x=np.asarray(x), states=states,
        )
        for i in range(0, states.shape[0], args.export_every):
            rgba = np.asarray(to_rgba(jnp.asarray(states[i]), cfg.use_alpha))
            save_ply(os.path.join(out_dir, f"{i:04d}.ply"),
                     np.asarray(x), rgba)
        print(f"exported {out_dir}")
    else:
        # ---- image mode (reference test.py:130-147, 207-247) ------------
        if args.image_size <= 0:
            raise SystemExit("need --image_size or --surface")
        m = args.image_size
        gmin, gsize = (-1.0, -1.0), (2.0, 2.0)
        x2 = grange((m, m), jnp.asarray(gmin), jnp.asarray(gsize)).reshape(-1, 2)
        x = jnp.pad(x2, ((0, 0), (0, 1))) if args.use_3d else x2
        period = None
        if args.wrap:
            period = (
                jnp.asarray([2.0, 2.0, 2.0]) if args.use_3d
                else jnp.asarray([2.0, 2.0])
            )
        key, ks = jax.random.split(key)
        A0 = plane_seed(
            x2, cfg.channels, gmin=gmin, gsize=gsize, radius=seed_radius,
            randomized=(args.initial_feature == "random"), key=ks,
        )
        print(f"image rollout: n={x.shape[0]}, {args.steps} steps")
        t0_wall = time.time()
        if args.engine == "band":
            import jax.numpy as jnpb

            from ..models.cell_step import rollout_cells_batched
            from ..ops.bands import build_band_engine
            from ..ops.batched import batched_gather_back, batched_scatter

            beng = build_band_engine(np.asarray(x), h, period=period,
                                     table_dtype="bfloat16",
                                     smoothing=cfg.smoothing)
            SB0 = batched_scatter(beng, A0[None])
            out = rollout_cells_batched(
                params, cfg, beng, SB0, 1, key, args.steps, h,
                fire_rate=args.firerate,
                collect_steps=jnpb.arange(args.steps + 1),
            )
            states = np.asarray(
                jax.vmap(lambda S: batched_gather_back(beng, S, 1))(
                    out.collected
                )
            )[:, 0]
        elif args.engine == "cells":
            from ..models.cell_step import rollout_states_cells
            from ..ops.cells import build_cell_engine

            eng = build_cell_engine(x, h, period=period)
            states = rollout_states_cells(
                params, cfg, eng, A0, key, args.steps, h,
                fire_rate=args.firerate,
            )
        else:
            mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
            graph = ops.build_graph(
                x, h, dims, max_per_cell=mpc, k=k, period=period
            )
            states = rollout_states(
                params, cfg, graph, A0, key, args.steps, h,
                fire_rate=args.firerate,
            )
        states = np.asarray(states)
        print(f"rollout {time.time() - t0_wall:.1f}s")

        np.savez(os.path.join(out_dir, "states.npz"),
                 x=np.asarray(x2), states=states)
        import jax.numpy as jnp2

        for i in range(0, states.shape[0], args.export_every):
            rgba = np.asarray(to_rgba(jnp2.asarray(states[i]), cfg.use_alpha))
            if not cfg.use_alpha:
                rgba = rgba[..., :3]
            save_frame_png(
                os.path.join(out_dir, f"{i:04d}.png"), rgba, side=m
            )
        print(f"exported {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
