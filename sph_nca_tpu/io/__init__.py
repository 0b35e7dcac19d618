"""sph_nca_tpu.io — checkpoints + JSON weight interchange."""

from .checkpoint import (
    find_latest_resumable,
    has_resume_state,
    load_checkpoint,
    load_resume_state,
    restore_opt_state,
    save_checkpoint,
    save_resume_state,
)
from .weights_json import ImportedModel, load_weights_json, save_weights_json

__all__ = [
    "ImportedModel",
    "find_latest_resumable",
    "has_resume_state",
    "load_checkpoint",
    "load_resume_state",
    "load_weights_json",
    "restore_opt_state",
    "save_checkpoint",
    "save_resume_state",
    "save_weights_json",
]
