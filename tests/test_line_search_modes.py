"""Serial vs parallel line-search equivalence.

The parallel mode (Options.line_search_mode="parallel") evaluates every
backtracking candidate alpha_s * 0.5^k in one batched call and selects the
first accepted one -- the same acceptance rule as the reference's serial
backtracking (reference solve.jl:193-221 cone search, :252-302 filter
search), so iterate trajectories must match the serial mode step for step.
"""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import Solver, Options

from tests.test_solver_nlp import assert_contract


def _solve_both(make_solver, x0, parameters=None):
    results = {}
    for mode in ("serial", "parallel"):
        solver = make_solver(Options(line_search_mode=mode))
        kw = {} if parameters is None else {"parameters": parameters}
        results[mode] = solver.solve(jnp.asarray(x0), **kw)
    return results["serial"], results["parallel"]


def test_wachter_modes_match():
    def make(opts):
        return Solver(
            lambda x: x[0],
            lambda x: jnp.array([x[0] ** 2 - x[1] - 1.0, x[0] - x[2] - 0.5]),
            lambda x: x[1:3],
            3,
            options=opts,
        )

    rs, rp = _solve_both(make, [-2.0, 3.0, 1.0])
    assert_contract(rs)
    assert_contract(rp)
    assert int(rs.iterations) == int(rp.iterations)
    assert int(rs.state.outer_i) == int(rp.state.outer_i)
    np.testing.assert_allclose(
        np.asarray(rs.variables), np.asarray(rp.variables), atol=1e-10
    )
    np.testing.assert_allclose(
        float(rs.state.step_size), float(rp.state.step_size), rtol=0
    )


def test_soc_modes_match():
    """Friction-cone SOC problem: exercises the fraction-to-the-boundary
    search (t gets its own step size) in both modes."""

    def make(opts):
        return Solver(
            lambda x, th: th[:3] @ x,
            lambda x, th: jnp.array([x[0] - th[3]]),
            lambda x, th: x,
            3,
            num_parameters=4,
            nonnegative_indices=[],
            second_order_indices=[[0, 1, 2]],
            options=opts,
        )

    theta = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.5]))
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=3)
    rs, rp = _solve_both(make, x0, parameters=theta)
    assert_contract(rs)
    assert_contract(rp)
    assert int(rs.iterations) == int(rp.iterations)
    np.testing.assert_allclose(
        np.asarray(rs.variables), np.asarray(rp.variables), atol=1e-10
    )


def test_trajopt_modes_match():
    """Pendulum swing-up through the trajopt front-end + riccati backend."""
    from calipso_tpu import TrajOptSolver, linear_interpolation

    horizon = 11

    def pend_c(x, u):
        return jnp.array(
            [x[1], u[0] / 0.25 - 9.81 * jnp.sin(x[0]) / 0.5 - 0.1 * x[1] / 0.25]
        )

    def pend_d(y, x, u):
        return y - (x + 0.05 * pend_c(0.5 * (x + y), u))

    x0 = jnp.array([0.0, 0.0])
    xg = jnp.array([jnp.pi, 0.0])
    objective = [
        *[(lambda x, u: 0.1 * x @ x + 0.1 * u @ u)] * (horizon - 1),
        lambda x, u: 0.1 * x @ x,
    ]
    equality = [lambda x, u: x - x0, *[None] * (horizon - 2), lambda x, u: x - xg]

    res = {}
    for mode in ("serial", "parallel"):
        ts = TrajOptSolver(
            objective,
            [pend_d] * (horizon - 1),
            [2] * horizon,
            [1] * (horizon - 1),
            equality=equality,
            options=Options(line_search_mode=mode),
        )
        rng = np.random.default_rng(0)
        ts.initialize_states(linear_interpolation(x0, xg, horizon))
        ts.initialize_actions([rng.normal(size=1) for _ in range(horizon - 1)])
        res[mode] = ts.solve()
    rs, rp = res["serial"], res["parallel"]
    assert bool(rs.state.solved) and bool(rp.state.solved)
    assert int(rs.state.total_i) == int(rp.state.total_i)
    np.testing.assert_allclose(
        np.asarray(rs.state.p.x), np.asarray(rp.state.p.x), atol=1e-9
    )
