"""Checkpoint/resume and profiling-stats utilities."""

import os

import numpy as np
import jax.numpy as jnp

from calipso_tpu import Solver, Options
from calipso_tpu.utils import checkpoint, profiling


def test_checkpoint_warmstart(tmp_path):
    opts = Options(warmstart=True)
    solver = Solver(
        lambda x: (x[0] - 1.0) ** 2 + x[1] ** 2,
        lambda x: jnp.array([x[0] + x[1] - 1.0]),
        lambda x: x,
        2,
        options=opts,
    )
    res = solver.solve(jnp.array([0.5, 0.5]))
    assert bool(res.solved)

    path = os.path.join(tmp_path, "point.npz")
    checkpoint.save_point(path, res.state.p)
    point = checkpoint.load_point(path)
    np.testing.assert_allclose(np.asarray(point.x), np.asarray(res.state.p.x))

    # resume from the checkpoint: converges at least as fast
    res2 = solver.solve(jnp.array([0.5, 0.5]), warm=point)
    assert bool(res2.solved)
    assert int(res2.iterations) <= int(res.iterations)

    stats = profiling.iteration_stats(res2.state)
    assert stats["solved"] and stats["residual_violation"] < 1e-4
