"""sph_nca_tpu.models — SPHNCA model, rollouts, surface machinery."""

from .nca import (
    ALIVE_THRESHOLD,
    MLPParams,
    SPHNCAConfig,
    apply_mlp,
    cell_activity,
    init_params,
    life_mask,
    nca_step,
    num_params,
    perceive,
    to_rgba,
)
from .cell_step import nca_step_cells, rollout_cells
from .rollout import RolloutOut, rollout, rollout_batch, rollout_states
from .surface import (
    DIFFUSE_DIMS,
    DIFFUSE_H,
    diffuse,
    normalize,
    orthogonalize,
    project_tangent_space,
    rollout_mesh,
    tangent_perception,
)

__all__ = [
    "ALIVE_THRESHOLD",
    "DIFFUSE_DIMS",
    "DIFFUSE_H",
    "MLPParams",
    "RolloutOut",
    "SPHNCAConfig",
    "apply_mlp",
    "cell_activity",
    "diffuse",
    "init_params",
    "life_mask",
    "nca_step",
    "nca_step_cells",
    "normalize",
    "num_params",
    "orthogonalize",
    "perceive",
    "project_tangent_space",
    "rollout",
    "rollout_cells",
    "rollout_batch",
    "rollout_mesh",
    "rollout_states",
    "tangent_perception",
    "to_rgba",
]
