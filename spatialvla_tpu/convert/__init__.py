from .params import (
    ego3d_from_state_dict,
    gemma2_from_state_dict,
    siglip_from_state_dict,
    spatialvla_from_state_dict,
)

__all__ = [
    "ego3d_from_state_dict",
    "gemma2_from_state_dict",
    "siglip_from_state_dict",
    "spatialvla_from_state_dict",
]
