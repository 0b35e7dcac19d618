"""sph_nca_tpu.io — checkpoints + JSON weight interchange."""

from .checkpoint import load_checkpoint, restore_opt_state, save_checkpoint
from .weights_json import ImportedModel, load_weights_json, save_weights_json

__all__ = [
    "ImportedModel",
    "load_checkpoint",
    "load_weights_json",
    "restore_opt_state",
    "save_checkpoint",
    "save_weights_json",
]
