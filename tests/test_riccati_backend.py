"""Riccati (block-tridiagonal) backend equivalence with the dense Schur
path on trajopt problems, including SOCs and ragged stage dims."""

import numpy as np
import pytest

from calipso_tpu import TrajOptSolver, Options
from calipso_tpu.models import pendulum, rocket

from tests.test_solver_nlp import assert_contract


def _solve(prob, method, seed=0, actions_scale=0.0):
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "state_goal", "action_guess", "penalty_initial")
    }
    ts = TrajOptSolver(options=Options(linear_solver=method), **kw)
    ts.initialize_states(prob["state_guess"])
    rng = np.random.default_rng(seed)
    ts.initialize_actions([actions_scale * rng.normal(size=k) for k in prob["num_actions"]])
    return ts, ts.solve()


def test_pendulum_riccati_matches_schur():
    prob = pendulum.swingup_problem(horizon=11)
    _, r1 = _solve(prob, "schur")
    _, r2 = _solve(prob, "riccati")
    assert_contract(r1)
    assert_contract(r2)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(
        np.asarray(r1.variables), np.asarray(r2.variables), atol=1e-6
    )


def test_rocket_soc_riccati():
    prob = rocket.landing_problem(horizon=31)
    ts, r = _solve(prob, "riccati", actions_scale=1e-3)
    assert_contract(r)
    states, actions = ts.get_trajectory(r)
    for u in actions:
        assert np.linalg.norm(u[:2]) < u[2] + 1e-8


def test_riccati_rejects_general_equality():
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="equality_general"):
        ts = TrajOptSolver(
            [lambda x, u, w: x @ x + u @ u, lambda x, u, w: x @ x],
            [pendulum.discrete],
            [2, 2],
            [1],
            equality_general=lambda z, th: z[:2],
            options=Options(linear_solver="riccati"),
        )
        ts.initialize_states([np.zeros(2), np.zeros(2)])
        ts.initialize_actions([np.zeros(1)])
        ts.solve()
