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
    assert stats["lu_fallbacks"] == 0


def test_batch_stats():
    from calipso_tpu import BatchedSolver

    bs = BatchedSolver(
        lambda x, th: (x[0] - th[0]) ** 2 + x[1] ** 2,
        lambda x, th: jnp.array([x[0] + x[1] - 1.0]),
        lambda x, th: x,
        2,
        num_parameters=1,
    )
    rng = np.random.default_rng(0)
    B = 8
    res = bs.solve(
        jnp.asarray(rng.uniform(0.2, 0.8, size=(B, 2))),
        jnp.asarray(rng.uniform(0.5, 2.0, size=(B, 1))),
    )
    stats = profiling.batch_stats(res.state)
    assert stats["solved"] == B and stats["failed"] == 0
    assert stats["iterations_max"] >= stats["iterations_mean"] > 0
    assert 0.0 <= stats["lockstep_waste"] < 1.0
