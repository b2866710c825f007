from .export_hf import (
    config_to_hf,
    export_hf_checkpoint,
    spatialvla_to_state_dict,
)
from .params import (
    ego3d_from_state_dict,
    gemma2_from_state_dict,
    siglip_from_state_dict,
    spatialvla_from_state_dict,
)

__all__ = [
    "config_to_hf",
    "ego3d_from_state_dict",
    "export_hf_checkpoint",
    "gemma2_from_state_dict",
    "siglip_from_state_dict",
    "spatialvla_from_state_dict",
    "spatialvla_to_state_dict",
]
