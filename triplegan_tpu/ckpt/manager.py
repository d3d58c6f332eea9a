"""Orbax-backed checkpointing of the full three-player state.

Reference parity (SURVEY.md §3.5): ``tf.train.Saver`` persisted every graph
variable — player params, Adam m/v slots, BN moving stats, global step — and
``Saver.restore`` resumed training exactly. The rebuild's single TrainState
pytree carries all of that plus the explicit RNG key; orbax saves it
asynchronously (the TPU keeps training while the previous checkpoint
serializes) and keeps the N latest.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, write: bool = True):
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
                # A SIGKILL mid-save leaves a torn *.orbax-checkpoint-tmp dir;
                # purge such debris on open so crashed runs don't accumulate
                # garbage (restore already ignores them — verified by the
                # kill-resume rehearsal, DESIGN.md). Only the WRITING owner
                # (the train loop) may clean: a restore-only manager (eval/
                # sample/inception against a possibly-live run dir) purging
                # tmp dirs could destroy another process's in-flight async
                # save (advisor r2 finding).
                cleanup_tmp_directories=write,
            ),
        )

    def save(self, step: int, state) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure of ``state_template`` (a concrete state
        built the same way as at first init). Returns None if no checkpoint;
        raises FileNotFoundError for an explicit ``step`` that doesn't exist
        (orbax 0.11 would otherwise fail default-item detection on the
        missing directory and raise a misleading ValueError)."""
        target = step if step is not None else self._mngr.latest_step()
        if target is None:
            return None
        if step is not None and target not in self._mngr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint for step {step} (available: "
                f"{sorted(self._mngr.all_steps())})"
            )
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mngr.restore(target, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def refresh(self) -> None:
        """Re-scan the directory: orbax caches the step list at open, so a
        long-lived restore-only manager (the serve `/reload` path) would
        otherwise never see checkpoints written by a concurrent training
        run."""
        self._mngr.reload()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
