"""Checkpointing.

The reference only offers ``torch.save(state_dict)`` of model weights
(reference ``core.py:199-213``).  Here:

* :func:`save` / :func:`load` — flat-array model serialization into one
  ``.npz`` (same capability, template-based: structure comes from the code).
* :class:`CheckpointManager` — full training-state checkpointing via orbax
  (params + optimizer state + RNG key + step), which is strictly more than
  the reference (SURVEY §5 "Checkpoint / resume").  All stateful buffers —
  ActNorm s/t, spectral-norm u/v, permutations — are pytree leaves and are
  captured automatically.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .module import is_array


def save(path, model):
    """Serialize every array leaf of ``model`` to an ``.npz``."""
    leaves = jax.tree_util.tree_leaves(model)
    arrays = {}
    for i, leaf in enumerate(leaves):
        if is_array(leaf):
            arr = np.asarray(leaf)
            if str(arr.dtype) == "bfloat16":
                # npz cannot round-trip ml_dtypes; store f32, load() casts
                # back to the template's dtype
                arr = arr.astype(np.float32)
            arrays[f"leaf_{i}"] = arr
        else:
            arrays[f"py_{i}"] = np.asarray(repr(leaf))
    np.savez(path, **arrays)


def load(path, template):
    """Rebuild a model with ``template``'s structure and saved arrays."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        key = f"leaf_{i}"
        if key in data:
            # cast to the template's dtype: a checkpoint saved at another
            # precision must not silently produce a mixed-precision model
            dtype = leaf.dtype if is_array(leaf) else None
            arr = jnp.asarray(data[key], dtype)
            if is_array(leaf) and tuple(leaf.shape) != tuple(arr.shape):
                raise ValueError(
                    f"leaf {i}: shape mismatch {arr.shape} vs template "
                    f"{leaf.shape}")
            new_leaves.append(arr)
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointManager:
    """Orbax-backed training-state checkpointing with resume."""

    def __init__(self, directory, max_to_keep=3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step, state, wait=True):
        """Save a pytree training state at ``step``.

        ``wait=False`` returns as soon as the device arrays are snapshotted
        and lets orbax write to disk in the background (overlaps
        checkpointing with the next training steps — call
        :meth:`wait_until_finished` before exiting). Safe as long as the
        training step does not donate the state buffers."""
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def wait_until_finished(self):
        """Block until all pending async saves are durable on disk."""
        self.manager.wait_until_finished()

    def restore(self, template, step=None):
        """Restore into ``template``'s structure; latest step if None."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            return None, None
        state = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return state, step

    def latest_step(self):
        return self.manager.latest_step()
