from .engine import ServingEngine, assemble_batch

__all__ = ["ServingEngine", "assemble_batch"]
