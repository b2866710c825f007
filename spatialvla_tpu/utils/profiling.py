"""Profiling/timing helpers (TPU equivalent of the reference's opt-in
torch.profiler ProfilerTrainer, train/monkey_patch.py:344-359)."""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context -> TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Block until a jax value is materialized. On the experimental axon
    backend block_until_ready does not reliably synchronize, so we force a
    host transfer of one leaf."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[-1])


def timeit(fn, *args, iters: int = 10, warmup: int = 1, **kwargs) -> float:
    """Median-free simple wall-clock mean over iters; returns seconds."""
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / iters
