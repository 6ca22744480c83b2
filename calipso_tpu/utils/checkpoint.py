"""Checkpoint / resume for solver state.

The reference has no solver checkpointing (SURVEY.md section 5: examples
persist trajectories via JLD2; warmstart reuses the previous primal-dual
point). Here the whole solver state is a pytree, so checkpointing is a
flat save/load; `load_point` feeds straight into `Solver.solve(warm=...)`
for warmstarted MPC loops or restart-after-preemption."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from calipso_tpu.solver.kkt import Blocks

_FIELDS = ("x", "r", "s", "y", "z", "t")


def save_point(path: str, point: Blocks) -> None:
    """Persist a primal-dual point (x, r, s, y, z, t) to an .npz file."""
    np.savez(path, **{k: np.asarray(v) for k, v in zip(_FIELDS, point)})


def load_point(path: str) -> Blocks:
    """Load a primal-dual point saved with save_point."""
    data = np.load(path)
    return Blocks(*(jnp.asarray(data[k]) for k in _FIELDS))
