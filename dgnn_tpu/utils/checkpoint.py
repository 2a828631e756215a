"""Checkpoint/resume via orbax.

The reference has only a vestigial --save/--load-model-path pair (save never
called, train_edgeconv.py:246-247; SURVEY.md §5).  Here: full train-state
checkpointing (params + optimizer state + step), periodic saves with
retention, and restore-latest — the expected behavior for long-running
training.
"""

from __future__ import annotations

from typing import Any, Optional

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint.CheckpointManager for pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=self._ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore_latest(self, template: Any) -> Optional[tuple]:
        """Returns (step, state) or None if no checkpoint exists.

        `template` is a pytree of the same structure (used for
        shape/dtype/sharding restoration)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return step, state

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
