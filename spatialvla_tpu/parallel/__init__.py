from .mesh import (
    AXES,
    MeshConfig,
    batch_sharding,
    form_global_batch,
    honor_jax_platforms_env,
    initialize_distributed,
    make_mesh,
    replicated,
)
from .pipeline import pipeline_apply
from .ring_attention import ring_flash_attention
from .partitioning import (
    DEFAULT_RULES,
    param_pspecs,
    param_shardings,
    shard_params,
    spec_for,
)

__all__ = [
    "AXES",
    "DEFAULT_RULES",
    "MeshConfig",
    "batch_sharding",
    "form_global_batch",
    "honor_jax_platforms_env",
    "initialize_distributed",
    "make_mesh",
    "param_pspecs",
    "param_shardings",
    "pipeline_apply",
    "replicated",
    "ring_flash_attention",
    "shard_params",
    "spec_for",
]
