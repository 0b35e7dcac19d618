"""JSON weight interchange with the reference's web-demo format.

The reference exports checkpoints to JSON for its browser demo
(docs/export_weights.py:42-95); pretrained models ship in that format
(docs/weights/*.json). This module reads and writes it, so:

  * reference-trained models run directly on this framework (golden parity
    tests load the shipped weights), and
  * models trained here can drive the reference's web demo unmodified.

Format:
  {"layers": [{"index": 0, "weight": [[out x in]], "bias": [out]},
              {"index": 2, ...}],
   "config": {"input_features", "hidden_features", "output_features",
              "fire_rate", "update_rule", "h", "mode"}}

Torch Linear stores weight as [out, in]; our MLPParams store [in, out].
"""

from __future__ import annotations

import json
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.nca import MLPParams, SPHNCAConfig


class ImportedModel(NamedTuple):
    params: MLPParams
    cfg: SPHNCAConfig
    h: float
    mode: str  # 'image' (mse-trained) or 'texture'


def load_weights_json(path: str) -> ImportedModel:
    with open(path) as f:
        data = json.load(f)

    layers = sorted(data["layers"], key=lambda l: l["index"])
    if len(layers) != 2:
        raise ValueError(f"expected 2 linear layers, got {len(layers)}")
    w1 = np.asarray(layers[0]["weight"], np.float32).T  # [in, hidden]
    b1 = np.asarray(layers[0]["bias"], np.float32)
    w2 = np.asarray(layers[1]["weight"], np.float32).T  # [hidden, out]
    b2 = np.asarray(layers[1]["bias"], np.float32)

    cfg_json = data.get("config", {})
    in_features = int(cfg_json.get("input_features", w1.shape[0]))
    hidden = int(cfg_json.get("hidden_features", w1.shape[1]))
    out_features = int(cfg_json.get("output_features", w2.shape[1]))
    update_rule = cfg_json.get("update_rule", "gated")
    smoothing = cfg_json.get("smoothing", "poly6")
    fire_rate = float(cfg_json.get("fire_rate", 0.5))
    h = float(cfg_json.get("h", 0.08))
    mode = cfg_json.get("mode", "image")

    channels = in_features // 3
    cfg = SPHNCAConfig(
        channels=channels,
        hidden=hidden,
        fire_rate=fire_rate,
        update_rule=update_rule,
        smoothing=smoothing,
        # The web demo bakes gA * h/h0 into its input prep
        # (docs/nca.js:225-231); shipped weights are h0-normalized.
        normalize_perception=1.0 / h,
    )
    if cfg.in_features != in_features or cfg.out_features != out_features:
        raise ValueError(
            f"inconsistent layer shapes for {update_rule}: "
            f"in={in_features}, out={out_features}, channels={channels}"
        )

    params = MLPParams(
        w1=jnp.asarray(w1), b1=jnp.asarray(b1),
        w2=jnp.asarray(w2), b2=jnp.asarray(b2),
    )
    return ImportedModel(params=params, cfg=cfg, h=h, mode=mode)


def save_weights_json(
    path: str,
    params: MLPParams,
    cfg: SPHNCAConfig,
    h: float,
    mode: str = "image",
) -> None:
    data = {
        "layers": [
            {
                "index": 0,
                "weight": np.asarray(params.w1).T.tolist(),
                "bias": np.asarray(params.b1).tolist(),
            },
            {
                "index": 2,  # torch Sequential index (Linear, ReLU, Linear)
                "weight": np.asarray(params.w2).T.tolist(),
                "bias": np.asarray(params.b2).tolist(),
            },
        ],
        "config": {
            "input_features": cfg.in_features,
            "hidden_features": cfg.hidden,
            "output_features": cfg.out_features,
            "fire_rate": cfg.fire_rate,
            "update_rule": cfg.update_rule,
            # extension key: absent in reference JSONs (= poly6); both
            # demo engines honor it so Wendland-trained checkpoints
            # render with the kernel they were trained on
            "smoothing": getattr(cfg, "smoothing", "poly6"),
            "h": h,
            "mode": mode,
        },
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
