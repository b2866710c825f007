from . import attention, gemma2, layers, rope

__all__ = ["attention", "gemma2", "layers", "rope"]
