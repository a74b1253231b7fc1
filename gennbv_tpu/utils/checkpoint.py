"""Orbax checkpointing of {params, batch_stats, opt_state, step}.

Replaces the SB3 zip-archive checkpoints (save_util.py) and the rsl_rl
torch.save dicts (on_policy_runner.py:228-244).  Same writer policy as the
reference: periodic `rl_model_<steps>_steps` saves plus best-by-metric
(gennbv/callback.py:25-70).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, name: str, train_state: Any, force: bool = True):
        # Fetch to host on the MAIN thread first: orbax's async writer pulls
        # device arrays from a background thread, which deadlocks under
        # tunneled PJRT backends (observed on axon: the save wrote metadata
        # then hung the training loop indefinitely).
        tree = jax.device_get(train_state)
        self._ckpt.save(self._path(name), tree, force=force)
        self._ckpt.wait_until_finished()

    def save_step(self, step: int, train_state: Any):
        self.save(f"rl_model_{step}_steps", train_state)

    def save_best(self, metric_name: str, train_state: Any):
        self.save(f"rl_model_best_{metric_name}", train_state)

    def restore(self, name: str, target: Any) -> Any:
        return self._ckpt.restore(self._path(name), target)

    def restore_policy(self, name: str) -> dict:
        """Restore only the inference variables {params, batch_stats} —
        for play/eval/export, where no optimizer template exists (a full
        `restore` requires a target whose opt_state matches the save)."""
        raw = self._ckpt.restore(self._path(name))
        return {"params": raw["params"], "batch_stats": raw["batch_stats"]}

    def latest_step(self) -> Optional[int]:
        steps = []
        if not os.path.isdir(self.ckpt_dir):
            return None
        for d in os.listdir(self.ckpt_dir):
            parts = d.split("_")
            if d.startswith("rl_model_") and d.endswith("_steps"):
                try:
                    steps.append(int(parts[2]))
                except ValueError:
                    pass
        return max(steps) if steps else None
