"""sph_nca_tpu.utils — geometry, seeding, meshes, imaging."""

from .geometry import bilinear_sample, grange, trilinear_sample
from .seeds import add_radial_seed, plane_seed, radial_seed_weights

__all__ = [
    "add_radial_seed",
    "bilinear_sample",
    "grange",
    "plane_seed",
    "radial_seed_weights",
    "trilinear_sample",
]
