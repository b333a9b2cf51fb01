"""Checkpoint / resume for solver state.

The reference has no checkpointing (SURVEY.md section 5 — resume = rerun);
here the full per-node solver state (anchors, surrogate terms, Nesterov
scalars, restart counters) round-trips through one .npz file, so long runs
survive preemption. State is a flat pytree of arrays, so this is a direct
flatten/unflatten.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state, step: int) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{k}": np.asarray(v) for k, v in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Restore into the structure of `template` (same solver configuration).

    Returns (state, step)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    n = len(leaves)
    restored = []
    for k in range(n):
        arr = data[f"leaf_{k}"]
        ref = leaves[k]
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint leaf {k} shape {arr.shape} != expected "
                f"{ref.shape}; was the checkpoint written by a different "
                "problem configuration?")
        restored.append(jnp.asarray(arr, ref.dtype))
    return jax.tree.unflatten(treedef, restored), int(data["__step__"])
