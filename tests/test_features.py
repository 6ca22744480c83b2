"""Feature-parity tests: general (cross-stage) equality constraints,
warmstart, and solver callbacks (reference equality_general.jl:1-319,
options.jl:55-57, solver.jl:183-193)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import TrajOptSolver, Solver, Options, empty_constraint
from calipso_tpu.models import pendulum

from tests.test_solver_nlp import assert_contract


def test_equality_general_periodicity():
    """Cross-stage coupling that breaks the banded structure (reference
    equality_general.jl): periodic pendulum motion x_T = x_1 with a
    offset rotation, imposed on the whole trajectory vector."""
    horizon = 11

    objective = [
        *[(lambda x, u, w: 0.01 * u @ u + 0.1 * (x[1] ** 2))] * (horizon - 1),
        lambda x, u, w: 0.1 * (x[1] ** 2),
    ]

    # no stage boundary equalities; instead couple first and last states
    # through the general constraint: x_first = (0,0), x_last = (pi, 0)
    def general(z, theta):
        return jnp.concatenate(
            [z[0:2] - jnp.array([0.0, 0.0]), z[-2:] - jnp.array([np.pi, 0.0])]
        )

    ts = TrajOptSolver(
        objective,
        [pendulum.discrete] * (horizon - 1),
        [2] * horizon,
        [1] * (horizon - 1),
        equality_general=general,
    )
    ts.initialize_states(
        pendulum.swingup_problem(horizon)["state_guess"]
    )
    ts.initialize_actions([np.zeros(1)] * (horizon - 1))
    res = ts.solve()
    assert_contract(res)
    z = np.asarray(res.variables)
    np.testing.assert_allclose(z[0:2], [0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(z[-2:], [np.pi, 0.0], atol=1e-4)


def test_warmstart():
    """Warmstart keeps the primal-dual point; a re-solve from the solution
    converges immediately (reference options.jl:57, solve.jl:10-13 -- the
    mechanism MPC examples rely on)."""
    opts = Options(warmstart=True)
    solver = Solver(
        lambda x: (x[0] - 1.0) ** 2 + x[1] ** 2,
        lambda x: jnp.array([x[0] + x[1] - 1.0]),
        lambda x: x,
        2,
        options=opts,
    )
    res1 = solver.solve(jnp.array([0.5, 0.5]))
    assert bool(res1.solved)
    it1 = int(res1.iterations)
    # second solve warmstarts from the converged point
    res2 = solver.solve(jnp.array([0.5, 0.5]))
    assert bool(res2.solved)
    assert int(res2.iterations) <= it1


def test_callbacks():
    """Host callbacks fire per accepted inner step and per outer update
    (reference callback_inner/outer, solver.jl:183-193)."""
    calls = {"inner": 0, "outer": 0}

    def cb_inner(diag):
        calls["inner"] += 1

    def cb_outer(diag):
        calls["outer"] += 1

    solver = Solver(
        lambda x: x @ x,
        lambda x: jnp.array([x[0] - 1.0]),
        empty_constraint,
        2,
        options=Options(),
    )
    solver.callbacks(inner=cb_inner, outer=cb_outer)
    res = solver.solve(jnp.zeros(2))
    assert bool(res.solved)
    assert calls["inner"] >= 1
    assert calls["outer"] >= 1
