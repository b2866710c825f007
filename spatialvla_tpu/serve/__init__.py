from .engine import (
    EngineOverloaded,
    RequestExpired,
    ServingEngine,
    assemble_batch,
    warmup_buckets,
)
from .split_engine import SplitServingEngine

__all__ = [
    "EngineOverloaded",
    "RequestExpired",
    "ServingEngine",
    "SplitServingEngine",
    "assemble_batch",
    "warmup_buckets",
]
