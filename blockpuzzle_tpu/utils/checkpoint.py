"""Checkpoint/resume via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference is a stateless toy env with no checkpointing; the target saves
the FULL train state — params, optimizer state, env states, per-env RNG keys
and counters, step counters — so resume is bit-exact (counter-based RNG makes
this trivial: the piece stream depends only on saved keys + counters).
Sharded arrays save/restore with their sharding on the live mesh.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

RUN_META_FILE = "run_meta.json"


def _key_name(k: Any) -> str:
    """Normalize a pytree path key (GetAttrKey/DictKey/SequenceKey) to str."""
    for attr in ("name", "key", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _path_names(path) -> tuple:
    return tuple(_key_name(k) for k in path)


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
        """Restore into the structure/shardings of ``state_template``.

        Forward compatibility: when ``state_template`` has leaves the saved
        checkpoint lacks — a state field added AFTER the checkpoint was
        written (e.g. ``EnvState.streak``, added with the streak-bonus
        mechanic) — the saved leaves are restored and the new fields keep
        the template's (freshly initialized) values, with a note on stderr.
        Any other structure mismatch (removed/renamed/reshaped leaves)
        still raises, because silently dropping saved state would corrupt
        the resume.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
        except ValueError:
            restored = self._restore_filling_new_fields(
                state_template, abstract, step
            )
            if restored is None:
                raise
            return restored

    def _saved_leaf_paths(self, step: int) -> "set[tuple]":
        """Leaf paths (as name tuples) present in the saved checkpoint."""
        meta = ocp.PyTreeCheckpointer().metadata(
            os.path.join(self._dir, str(step), "default")
        )
        tree = meta.item_metadata.tree
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        return {_path_names(p) for p, _ in flat}

    def _restore_filling_new_fields(
        self, state_template: Any, abstract: Any, step: int
    ) -> Optional[Any]:
        """Partial restore for checkpoints that PREDATE new state fields.

        Returns None (caller re-raises the original error) unless the only
        difference is template-side leaves missing from the checkpoint.
        """
        try:
            saved = self._saved_leaf_paths(step)
        except Exception:
            return None  # unreadable metadata: not a new-field mismatch
        flat, treedef = jax.tree_util.tree_flatten_with_path(abstract)
        missing = [p for p, _ in flat if _path_names(p) not in saved]
        if not missing or len(missing) == len(flat):
            return None  # a different kind of mismatch — let it raise
        request = treedef.unflatten(
            [
                ocp.PLACEHOLDER if _path_names(p) not in saved else leaf
                for p, leaf in flat
            ]
        )
        # dedicated manager: orbax binds one handler type per manager
        # instance (see restore_params)
        with ocp.CheckpointManager(self._dir) as mgr:
            out = mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item=request, partial_restore=True
                ),
            )
        is_ph = lambda x: x is ocp.PLACEHOLDER
        out_leaves = jax.tree_util.tree_leaves(out, is_leaf=is_ph)
        tmpl_leaves = jax.tree_util.tree_leaves(state_template)
        merged = []
        for t_leaf, r_leaf in zip(tmpl_leaves, out_leaves):
            if is_ph(r_leaf):
                merged.append(t_leaf)  # new field: keep template init value
            elif isinstance(t_leaf, jax.Array):
                # re-lay restored leaves onto the template's sharding (the
                # file's recorded sharding may be from a different topology)
                merged.append(jax.device_put(r_leaf, t_leaf.sharding))
            else:
                merged.append(r_leaf)
        filled = ", ".join(jax.tree_util.keystr(p) for p in missing)
        print(
            f"[checkpoint] step {step} predates state field(s) {filled}; "
            f"restored the saved leaves and kept the template's fresh "
            f"values for the new field(s)",
            file=sys.stderr,
        )
        return treedef.unflatten(merged)

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

    def save_run_meta(self, meta: dict) -> None:
        """Make the checkpoint dir self-describing (``run_meta.json``).

        Written once at train start with everything evaluation needs to
        rebuild the network (algo, preset, env overrides, torso shape) —
        ``cli.evaluate`` auto-fills its flags from it, so users don't have
        to re-type (and can't mis-type) the training configuration.
        Atomic write: evaluate never sees a half-written file.
        """
        path = os.path.join(self._dir, RUN_META_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, path)

    def load_run_meta(self) -> Optional[dict]:
        """Read ``run_meta.json`` if present (None for older checkpoints)."""
        path = os.path.join(self._dir, RUN_META_FILE)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        """All retained checkpoint steps, ascending (peak-hunting evals)."""
        return sorted(self._mgr.all_steps())

    def close(self) -> None:
        self._mgr.close()
