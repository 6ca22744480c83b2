"""Robustness matrix: every linear-solver backend solves every canonical
problem class with identical iteration counts (the backends must compute
the same Newton steps up to floating point)."""

import numpy as np
import jax.numpy as jnp
import pytest

from calipso_tpu import Solver, Options, empty_constraint

PROBLEMS = {
    "wachter": (
        lambda x: x[0],
        lambda x: jnp.array([x[0] ** 2 - x[1] - 1.0, x[0] - x[2] - 0.5]),
        lambda x: x[1:3],
        3,
        np.array([-2.0, 3.0, 1.0]),
        {},
    ),
    "maratos": (
        lambda x: 2.0 * (x[0] ** 2 + x[1] ** 2 - 1.0) - x[0],
        lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
        empty_constraint,
        2,
        np.array([2.0, 1.0]),
        {},
    ),
    "soc-friction": (
        lambda x: jnp.array([0.0, 1.0, 1.0]) @ x,
        lambda x: jnp.array([x[0] - 0.5]),
        lambda x: x,
        3,
        np.array([0.3, -0.5, 0.2]),
        dict(nonnegative_indices=[], second_order_indices=[[0, 1, 2]]),
    ),
}


@pytest.mark.slow
def test_backend_matrix():
    iters = {}
    for method in ["ldl", "schur", "lu"]:
        for name, (f, g, h, n, x0, kw) in PROBLEMS.items():
            s = Solver(f, g, h, n, options=Options(linear_solver=method), **kw)
            r = s.solve(jnp.asarray(x0))
            assert bool(r.solved), (method, name)
            iters.setdefault(name, set()).add(int(r.iterations))
    # identical iteration counts across backends
    for name, counts in iters.items():
        assert len(counts) == 1, (name, counts)
