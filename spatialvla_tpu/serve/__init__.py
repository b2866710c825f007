from .engine import (
    EngineOverloaded,
    RequestExpired,
    ServingEngine,
    assemble_batch,
    warmup_buckets,
)

__all__ = [
    "EngineOverloaded",
    "RequestExpired",
    "ServingEngine",
    "assemble_batch",
    "warmup_buckets",
]
