"""Training orchestration: the step loop around the compiled train step.

Replaces the reference's HF Trainer + monkey patches (train/monkey_patch.py)
with a plain loop: host-side data iterator -> device batches -> jitted step
-> metrics logging (JSONL + stdout) -> Orbax checkpoints (+ processor
artifacts sidecar) -> auto-resume. Profiling via jax.profiler traces over a
configurable step window (the XProf equivalent of the reference's
torch.profiler schedule, monkey_patch.py:344-359).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "output"
    max_steps: int = 1000
    log_every: int = 50
    save_every: int = 500
    save_total_limit: int = 3
    profile_steps: Optional[tuple] = None  # (start, stop) step window
    resume: bool = True
    tensorboard: bool = True  # also emit events.out.tfevents scalars
    # (first-party writer, train/tb_writer.py — reference: --report_to
    # tensorboard via HF Trainer, torchrun_pretrain.sh:70)


class MetricsLogger:
    """JSONL metrics log + periodic stdout line + (optional) first-party
    TensorBoard scalar events (train/tb_writer.py)."""

    def __init__(self, output_dir: str, *, tensorboard: bool = False):
        # metrics are global (replicated) values; process 0 writes, like the
        # reference's rank-0 logging
        self._primary = jax.process_index() == 0
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._f = None
        self._tb = None
        if self._primary:
            os.makedirs(output_dir, exist_ok=True)
            self._f = open(self.path, "a")
            if tensorboard:
                from .tb_writer import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))

    def log(self, step: int, metrics: Dict[str, Any], *, echo: bool = True):
        if not self._primary:
            return
        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars(
                row["step"], {k: v for k, v in row.items() if k != "step"}
            )
            self._tb.flush()
        if echo:
            parts = " ".join(f"{k}={v:.4f}" for k, v in row.items() if k != "step")
            print(f"[step {row['step']}] {parts}", flush=True)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


def train_loop(
    *,
    state,
    train_step: Callable,
    batches: Iterator[Dict[str, np.ndarray]],
    config: TrainerConfig,
    checkpoint_manager=None,
    sidecar: Optional[Dict] = None,
    step_args: tuple = (),
    on_metrics: Optional[Callable] = None,
):
    """Runs the loop; returns the final state.

    step signature: train_step(state, *step_args, batch) -> (state, metrics).
    """
    logger = MetricsLogger(config.output_dir, tensorboard=config.tensorboard)
    start_step = int(state["step"])

    if checkpoint_manager is not None and config.resume:
        latest = checkpoint_manager.latest_step()
        if latest is not None and latest > start_step:
            state = checkpoint_manager.restore(state)
            start_step = int(state["step"])
            if jax.process_index() == 0:
                print(f"resumed from checkpoint step {start_step}", flush=True)

    t_last = time.perf_counter()
    step_last = start_step
    profiling = False
    step = start_step
    for step in range(start_step, config.max_steps):
        # window conditions are >= / interval-based so a resume INTO the
        # window, or a window end past max_steps, behaves (start without
        # stop crashed stop_trace; stop never reached leaked the trace)
        if (
            config.profile_steps and not profiling
            and config.profile_steps[0] <= step < config.profile_steps[1]
        ):
            jax.profiler.start_trace(os.path.join(config.output_dir, "traces"))
            profiling = True
        batch = next(batches, None)
        if batch is None:
            break
        state, metrics = train_step(state, *step_args, batch)

        if profiling and step + 1 >= config.profile_steps[1]:
            jax.profiler.stop_trace()
            profiling = False

        if (step + 1) % config.log_every == 0 or step == start_step:
            metrics = jax.tree_util.tree_map(np.asarray, metrics)  # sync
            now = time.perf_counter()
            metrics = dict(metrics)
            n_steps = step + 1 - step_last  # actual steps in the interval
            metrics["steps_per_sec"] = (
                n_steps / (now - t_last) if step > start_step else 0.0
            )
            t_last, step_last = now, step + 1
            logger.log(step + 1, metrics)
            if on_metrics is not None:
                on_metrics(step + 1, metrics)

        if checkpoint_manager is not None and (step + 1) % config.save_every == 0:
            checkpoint_manager.save(step + 1, state, sidecar=sidecar)

    if profiling:  # loop ended inside the window (exhausted iterator etc.)
        jax.profiler.stop_trace()
    if checkpoint_manager is not None:
        checkpoint_manager.save(int(state["step"]), state, sidecar=sidecar, force=True)
        checkpoint_manager.wait()
    logger.close()
    return state
