"""Checkpoint/resume via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference is a stateless toy env with no checkpointing; the target saves
the FULL train state — params, optimizer state, env states, per-env RNG keys
and counters, step counters — so resume is bit-exact (counter-based RNG makes
this trivial: the piece stream depends only on saved keys + counters).
Sharded arrays save/restore with their sharding on the live mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: numbered steps, retention, bit-exact restore."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()
        return saved

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``state_template``."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_params(self, params_template: Any, step: Optional[int] = None) -> Any:
        """Restore only the ``params`` subtree of a saved TrainState.

        Lets evaluation restore weights from checkpoints whose optimizer
        state doesn't match the local template (e.g. trained with a LR
        schedule).
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")

        def to_abstract(x):
            # accept both concrete arrays and jax.eval_shape outputs
            if isinstance(x, jax.ShapeDtypeStruct):
                return x
            return ocp.utils.to_shape_dtype_struct(x)

        abstract = jax.tree.map(to_abstract, params_template)
        # a dedicated manager: orbax binds an item to ONE handler type per
        # manager instance, so mixing StandardSave (save/restore above) and
        # PyTreeRestore on self._mgr raises "does not match any registered
        # handler"
        with ocp.CheckpointManager(self._dir) as mgr:
            restored = mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item={"params": abstract},
                    partial_restore=True,
                ),
            )
        return restored["params"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
