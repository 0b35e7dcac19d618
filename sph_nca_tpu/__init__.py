"""sph_nca_tpu — a TPU-native SPH Neural Cellular Automata framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JackZhouSz/SPH-NCA (SIGGRAPH 2025 poster "Train Once, Generate Anywhere:
Discretization Agnostic Neural Cellular Automata using SPH Method").

Layers (bottom-up):
  ops/       SPH kernel functions, neighbor engine, differentiable operators
  models/    SPHNCA model, rollout drivers, surface (tangent-frame) machinery
  training/  losses, sample pool, trainer (optax), progressive growing
  parallel/  device mesh, shardings, halo-exchange particle parallelism
  utils/     geometry, seeding, meshes, imaging
  io/        checkpoints + JSON weight interchange with the reference demo
  cli/       train / test command-line entry points
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
