"""Checkpointing with full training resume.

The reference saves {configs, seed, model, epoch, loss} every 1000 iters
(train.py:310-318) but restores *weights only* — no optimizer/scheduler/RNG
state (train.py:266-269). Here checkpoints carry the optimizer state and
step so training resumes exactly.

Format: a directory with
  checkpoint.msgpack  — flax-serialized pytree {params, opt_state, extras}
  meta.json           — model/train configs, step, loss, h, seed arrays info
  seed.npz            — seed geometry (x) and state (A)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models.nca import MLPParams, SPHNCAConfig


def save_checkpoint(
    path: str,
    *,
    params: MLPParams,
    model_cfg: SPHNCAConfig,
    h: float,
    step: int,
    loss: float = float("nan"),
    opt_state: Any = None,
    train_cfg: Any = None,
    seed_x: Optional[np.ndarray] = None,
    seed_A: Optional[np.ndarray] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    state = {"params": params._asdict()}
    if opt_state is not None:
        # to_state_dict flattens optax's nested NamedTuples into plain
        # dicts that msgpack can carry
        state["opt_state"] = serialization.to_state_dict(opt_state)
    with open(os.path.join(path, "checkpoint.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.tree.map(np.asarray, state)))

    meta = {
        "model_cfg": dataclasses.asdict(model_cfg),
        "h": float(h),
        "step": int(step),
        "loss": float(loss),
        "has_opt_state": opt_state is not None,
    }
    if train_cfg is not None:
        meta["train_cfg"] = (
            dataclasses.asdict(train_cfg)
            if dataclasses.is_dataclass(train_cfg)
            else dict(train_cfg)
        )
    if extra_meta:
        meta["extra"] = extra_meta
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)

    if seed_x is not None:
        np.savez(
            os.path.join(path, "seed.npz"),
            x=np.asarray(seed_x),
            A=np.asarray(seed_A) if seed_A is not None else np.zeros(0),
        )


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Returns {params, model_cfg, h, step, loss, opt_state?, seed_x?, seed_A?,
    meta}."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "checkpoint.msgpack"), "rb") as f:
        state = serialization.msgpack_restore(f.read())

    params = MLPParams(**{k: jnp.asarray(v) for k, v in state["params"].items()})
    mc = meta["model_cfg"]
    # tuple fields survive json as lists
    model_cfg = SPHNCAConfig(**mc)

    out: Dict[str, Any] = {
        "params": params,
        "model_cfg": model_cfg,
        "h": meta["h"],
        "step": meta["step"],
        "loss": meta["loss"],
        "meta": meta,
    }
    if "opt_state" in state:
        out["opt_state"] = state["opt_state"]

    seed_path = os.path.join(path, "seed.npz")
    if os.path.exists(seed_path):
        seed = np.load(seed_path)
        out["seed_x"] = seed["x"]
        out["seed_A"] = seed["A"] if seed["A"].size else None
    return out


def restore_opt_state(template: Any, raw: Any) -> Any:
    """Restore a raw msgpack opt_state dict onto a freshly-initialized
    optimizer state pytree (serialization.from_state_dict)."""
    return serialization.from_state_dict(template, raw)


# ---------------------------------------------------------------------------
# Full-resume sidecar: pool states + host/device RNG states.
#
# The reference restores weights only (train.py:266-269); with this sidecar a
# killed run resumes with an identical loss trajectory (pool contents, numpy
# PCG64 streams, and the jax PRNG key all round-trip).
# ---------------------------------------------------------------------------


def save_resume_state(
    path: str,
    *,
    pool_A: np.ndarray,
    key_data: np.ndarray,
    np_rng_state: Dict[str, Any],
    pool_rng_state: Dict[str, Any],
) -> None:
    np.savez(
        os.path.join(path, "resume.npz"),
        pool_A=np.asarray(pool_A),
        key_data=np.asarray(key_data),
    )
    with open(os.path.join(path, "resume_rng.json"), "w") as f:
        json.dump({"np_rng": np_rng_state, "pool_rng": pool_rng_state}, f)


def load_resume_state(path: str) -> Dict[str, Any]:
    data = np.load(os.path.join(path, "resume.npz"))
    with open(os.path.join(path, "resume_rng.json")) as f:
        rng = json.load(f)
    return {
        "pool_A": data["pool_A"],
        "key_data": data["key_data"],
        "np_rng": rng["np_rng"],
        "pool_rng": rng["pool_rng"],
    }


def has_resume_state(path: str) -> bool:
    return os.path.exists(os.path.join(path, "resume.npz"))


def find_latest_resumable(output_dir: str) -> Optional[str]:
    """Latest (highest-step) checkpoint dir under output_dir that carries a
    resume sidecar; None if there is none."""
    best, best_step = None, -1
    if not os.path.isdir(output_dir):
        return None
    for name in os.listdir(output_dir):
        p = os.path.join(output_dir, name)
        if not (os.path.isdir(p) and has_resume_state(p)):
            continue
        try:
            with open(os.path.join(p, "meta.json")) as f:
                step = int(json.load(f)["step"])
        except (OSError, KeyError, ValueError):
            continue
        if step > best_step:
            best, best_step = p, step
    return best
