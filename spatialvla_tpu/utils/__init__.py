from .profiling import sync, timeit, trace
from .tree import count_params, leaves_with_paths, map_with_paths, param_summary, path_str

__all__ = [
    "count_params",
    "leaves_with_paths",
    "map_with_paths",
    "param_summary",
    "path_str",
    "sync",
    "timeit",
    "trace",
]
