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


def save_state(path: str, state, step: int, gauge_c=None) -> None:
    """`gauge_c` (optional [N, d]) records the solver's local-gauge
    centroids (driver._set_gauge) so a resumed process reuses the exact
    frame the state was written in."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{k}": np.asarray(v) for k, v in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    if gauge_c is not None:
        arrays["__gauge_c__"] = np.asarray(gauge_c)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template, solver=None):
    """Restore into the structure of `template` (same solver configuration).

    With `solver` given, also restores the local-gauge frame recorded by
    save_state into it. Returns (state, step)."""
    data = np.load(path)
    if solver is not None and "__gauge_c__" in data:
        solver.set_gauge(data["__gauge_c__"])
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
