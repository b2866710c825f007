"""Orbax checkpointing: the TPU-native replacement for the reference's HF
Trainer + DeepSpeed checkpoint stack (SURVEY.md §5.4 — save every N steps,
keep K, processor artifacts beside each checkpoint, auto-resume from the
latest)."""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-numbered async checkpoints of the full train state + sidecar
    JSON artifacts (model config, processor state)."""

    def __init__(
        self,
        directory: str,
        *,
        save_interval_steps: int = 1,
        max_to_keep: int = 3,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Dict[str, Any], *, sidecar: Optional[Dict] = None, force: bool = False) -> bool:
        if step in (self._mgr.all_steps() or []):
            return False  # already saved (e.g. final save == last interval save)
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if saved and sidecar and jax.process_index() == 0:
            # step-scoped sidecar so restore(step) pairs params with THAT
            # step's artifacts (processor state can change mid-run, e.g.
            # statistics/bin-policy adaptation); the unscoped copy stays as
            # the latest for consumers that just want the newest
            with open(self._sidecar_path(step), "w") as f:
                json.dump(sidecar, f, indent=2)
            with open(os.path.join(self.directory, "artifacts.json"), "w") as f:
                json.dump(sidecar, f, indent=2)
        if saved and jax.process_index() == 0:
            self._prune_sidecars(keep_extra={step})
        return saved

    def _prune_sidecars(self, keep_extra=()):
        """Delete artifacts-<step>.json for steps the manager's retention
        policy (max_to_keep) already pruned, so sidecars never accumulate
        without bound or pair with a deleted checkpoint."""
        kept = set(self._mgr.all_steps() or []) | set(keep_extra)
        for name in os.listdir(self.directory):
            if name.startswith("artifacts-") and name.endswith(".json"):
                try:
                    step = int(name[len("artifacts-"):-len(".json")])
                except ValueError:
                    continue
                if step not in kept:
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except OSError:
                        pass

    def _sidecar_path(self, step: int) -> str:
        return os.path.join(self.directory, f"artifacts-{step}.json")

    def load_sidecar(self, step: Optional[int] = None) -> Optional[Dict]:
        """The sidecar saved WITH the given (default latest) step, falling
        back to the directory-level latest copy for old checkpoints."""
        step = step if step is not None else self.latest_step()
        for path in (
            [] if step is None else [self._sidecar_path(step)]
        ) + [os.path.join(self.directory, "artifacts.json")]:
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Dict[str, Any], step: Optional[int] = None):
        """Restore into the structure/shardings of `state_like` (pass the
        freshly initialized state so shardings are preserved)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(directory: str, params, *, config_json: Optional[str] = None):
    """One-shot export of bare params (inference checkpoint)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(directory, "params"), params)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(config_json)


def load_params(directory: str, params_like=None):
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(directory, "params")
    if params_like is not None:
        return ckptr.restore(path, params_like)
    return ckptr.restore(path)
