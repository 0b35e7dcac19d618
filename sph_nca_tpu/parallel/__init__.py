"""sph_nca_tpu.parallel — device mesh, shardings, sharded training."""

from .mesh import (
    DATA_AXIS,
    PARTICLE_AXIS,
    batch_state_spec,
    factorize,
    graph_spec,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
    shard_cell_engine,
    shard_graph,
)
from .band_shard import (
    BandShards,
    comm_bytes_per_pass,
    perceive_band_sharded,
    rollout_band_sharded,
    shard_band_engine,
)
from .cell_shard import mask_blur_sharded, perceive_cells_dmajor_sharded
from .shard import ShardedTrainStep, dryrun_train_step, make_sharded_train_step

__all__ = [
    "DATA_AXIS",
    "PARTICLE_AXIS",
    "BandShards",
    "ShardedTrainStep",
    "comm_bytes_per_pass",
    "perceive_band_sharded",
    "rollout_band_sharded",
    "shard_band_engine",
    "mask_blur_sharded",
    "perceive_cells_dmajor_sharded",
    "batch_state_spec",
    "dryrun_train_step",
    "factorize",
    "graph_spec",
    "make_mesh",
    "make_sharded_train_step",
    "replicate",
    "replicated_spec",
    "shard_batch",
    "shard_cell_engine",
    "shard_graph",
]
