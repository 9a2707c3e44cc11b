"""Orbax checkpoint/resume for the optimization loop.

TPU-native upgrade of the reference's proto-checkpointing (SURVEY.md §5
"Checkpoint / resume": the reference only dumps intermediate images; it
cannot resume the optimizer). Here the full optimization state — output
image, optax optimizer state, step counter — is checkpointed via orbax at
the intermediate interval, and `--resume` continues bit-where-it-left-off.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


class RunCheckpointer:
    """Save/restore (step, image, opt_state) under a directory."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import os
        self._dir = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, image, opt_state) -> None:
        tree = {"image": image, "opt_state": opt_state}
        self._mngr.save(step, args=ocp.args.StandardSave(tree))

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def restore(self, image_like, opt_state_like
                ) -> tuple[int, jnp.ndarray, object] | None:
        """Restore the latest checkpoint, or None if there is none.

        `image_like` / `opt_state_like` provide the pytree structure and
        shapes (e.g. a freshly initialized image and opt state).
        """
        step = self._mngr.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct,
            {"image": image_like, "opt_state": opt_state_like})
        out = self._mngr.restore(step, args=ocp.args.StandardRestore(
            abstract))
        return int(step), out["image"], out["opt_state"]

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
