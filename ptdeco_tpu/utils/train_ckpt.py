"""Training-stage checkpointing with autoresume (orbax).

The reference delegates training resilience to composer
(``autoresume=True`` + save_folder, run_decompose_lockd.py:215-219) and the
HF Trainer (save_steps, run_finetune.py:305-307).  This is the TPU-native
equivalent: periodic orbax snapshots of (trainable, opt_state, step) with
latest-step restore.  Works on arbitrary module/optimizer pytrees,
including partition trees with None placeholders.
"""

from __future__ import annotations

import logging
from typing import Any, Optional


logger = logging.getLogger(__name__)


class TrainCheckpointer:
    def __init__(
        self,
        directory: Optional[str],
        save_interval_steps: int = 0,
        max_to_keep: int = 2,
    ) -> None:
        self.enabled = bool(directory) and save_interval_steps > 0
        self.save_interval_steps = save_interval_steps
        self._mgr = None
        if not self.enabled:
            return
        import orbax.checkpoint as ocp

        self._ocp = ocp
        import os

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
            ),
        )

    def maybe_save(self, step: int, trainable: Any, opt_state: Any) -> None:
        if not self.enabled:
            return
        self._mgr.save(
            step,
            args=self._ocp.args.StandardSave(
                {"trainable": trainable, "opt_state": opt_state}
            ),
        )

    def maybe_save_chunk(
        self, start_step: int, n_steps: int, trainable: Any, opt_state: Any
    ) -> None:
        """Chunked-dispatch (``steps_per_dispatch``) variant.

        A chunked driver only observes state at chunk tails
        (``start_step + n_steps - 1``), so the orbax fixed-interval policy
        (saves iff ``step % save_interval_steps == 0``) never fires for any
        interval not aligned to the chunk tails — periodic checkpoints
        silently stop and autoresume restarts from scratch.  If the chunk
        covered an interval multiple, force-save the post-chunk state at
        the true tail step: resume is exact (``latest + 1``) and no steps
        are replayed."""
        if not self.enabled or n_steps <= 0:
            return
        last = start_step + n_steps - 1
        covered = (last // self.save_interval_steps) * self.save_interval_steps
        if covered >= start_step:
            self._mgr.save(
                last,
                args=self._ocp.args.StandardSave(
                    {"trainable": trainable, "opt_state": opt_state}
                ),
                force=True,
            )

    def restore_or(
        self, trainable: Any, opt_state: Any
    ) -> tuple[Any, Any, int]:
        """Autoresume: restore the latest snapshot if one exists, else
        return the inputs and step 0."""
        if not self.enabled:
            return trainable, opt_state, 0
        latest = self._mgr.latest_step()
        if latest is None:
            return trainable, opt_state, 0
        restored = self._mgr.restore(
            latest,
            args=self._ocp.args.StandardRestore(
                {"trainable": trainable, "opt_state": opt_state}
            ),
        )
        logger.info(f"Autoresumed training from step {latest}")
        return restored["trainable"], restored["opt_state"], latest + 1

    def close(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()
            self._mgr.close()
