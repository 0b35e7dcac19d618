"""sph_nca_tpu.ops — differentiable SPH operators for TPU.

Public API mirrors the reference's ``sphops`` package
(code/sphops/__init__.py: initialize_hashgrid, volume, gradient, divergence,
count, blur), restructured around static-shape fixed-K neighbor lists.
"""

from . import dense
from .bands import BandEngine, build_band_engine
from .batched import (
    batched_gather_back,
    batched_scatter,
    blur_batched,
    mask_blur_batched,
    perceive_cells_batched,
)
from .cells import CellEngine, build_cell_engine
from .kernels import (
    DEFAULT_GRADIENT,
    DEFAULT_SMOOTHING,
    get_gradient_kernel,
    get_smoothing_kernel,
)
from .hashgrid import (
    NeighborList,
    SPHGraph,
    build_graph,
    build_neighbor_list,
    cell_index,
    default_dims,
    graph_from_neighbor_list,
    minimum_image,
    suggest_capacity,
)
from .neighbor_ops import (
    blur,
    count,
    divergence,
    gradient,
    graph_blur,
    graph_divergence,
    graph_gradient,
    volume,
)

__all__ = [
    "BandEngine",
    "CellEngine",
    "build_band_engine",
    "DEFAULT_GRADIENT",
    "DEFAULT_SMOOTHING",
    "NeighborList",
    "SPHGraph",
    "blur",
    "build_cell_engine",
    "build_graph",
    "build_neighbor_list",
    "cell_index",
    "count",
    "default_dims",
    "dense",
    "divergence",
    "get_gradient_kernel",
    "get_smoothing_kernel",
    "gradient",
    "graph_blur",
    "graph_divergence",
    "graph_from_neighbor_list",
    "graph_gradient",
    "minimum_image",
    "suggest_capacity",
    "volume",
]
