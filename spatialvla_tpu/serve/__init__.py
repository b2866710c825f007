from .engine import ServingEngine, assemble_batch, warmup_buckets

__all__ = ["ServingEngine", "assemble_batch", "warmup_buckets"]
