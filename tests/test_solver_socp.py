"""Tier-2 second-order-cone tests (reference test/solver/friction_cone.jl,
portfolio.jl): friction-cone sweep with directional-opposition checks and
the minimum-variance portfolio SOCP."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import Solver, Options, empty_constraint

from tests.test_solver_nlp import assert_contract


def test_friction_cone_sweep():
    """minimize v'b s.t. b1 = mu*gamma, b in SOC(3) -- the friction force
    opposes the tangential velocity (reference friction_cone.jl:1-60+).
    The sweep runs as one compiled solver with (v, mu*gamma) as parameters."""
    num_variables = 3

    def objective(x, th):
        return th[:3] @ x

    def equality(x, th):
        return jnp.array([x[0] - th[3]])

    solver = Solver(
        objective,
        equality,
        lambda x, th: x,
        num_variables,
        num_parameters=4,
        nonnegative_indices=[],
        second_order_indices=[[0, 1, 2]],
    )

    rng = np.random.default_rng(0)
    V = [
        [0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 1.0],
        [0.0, 10.0, 1.0],
    ]
    for v in V:
        for mu in [0.0, 0.5, 1.0]:
            for gamma in [0.0, 1.0]:
                theta = jnp.asarray(np.array(v + [mu * gamma]))
                res = solver.solve(jnp.asarray(rng.normal(size=3)), parameters=theta)
                assert_contract(res)
                x = np.asarray(res.variables)
                # solution lies in the cone
                assert x[0] + 1e-6 >= np.linalg.norm(x[1:])
                if np.linalg.norm(v[1:]) > 0 and gamma > 0 and mu > 0:
                    v_dir = np.asarray(v[1:]) / np.linalg.norm(v[1:])
                    b_dir = x[1:] / np.linalg.norm(x[1:])
                    assert np.max(np.abs(v_dir + b_dir)) < 1e-3
                    assert np.linalg.norm(x[1:]) <= mu * gamma + 1e-6


def test_portfolio():
    """Minimum-variance portfolio SOCP (reference portfolio.jl)."""
    p = 10
    rng = np.random.default_rng(1)
    E = rng.normal(size=(p, p))
    Sigma = E.T @ E
    evals, evecs = np.linalg.eigh(Sigma)
    Sigma_half = evecs @ np.diag(np.sqrt(evals)) @ evecs.T
    c = np.concatenate([np.zeros(p), [1.0]])

    G1 = np.block([[2.0 * Sigma_half, np.zeros((p, 1))], [np.zeros((1, p)), -np.ones((1, 1))]])
    h = np.concatenate([np.zeros(p), [1.0]])
    q = np.concatenate([np.zeros(p), [1.0]])
    z = 1.0
    G2 = np.concatenate([np.ones(p), [0.0]])[None, :]
    G3 = np.concatenate([-np.ones(p), [0.0]])[None, :]
    A = np.vstack([G2, G3, -q[None, :], -G1])
    b = np.concatenate([[1.0, -1.0, z], h])

    solver = Solver(
        lambda x: jnp.asarray(c) @ x,
        empty_constraint,
        lambda x: jnp.asarray(b) - jnp.asarray(A) @ x,
        p + 1,
        nonnegative_indices=np.arange(2),
        second_order_indices=[2 + np.arange(12)],
    )
    res = solver.solve(jnp.asarray(rng.normal(size=p + 1)))
    assert_contract(res)
    s = np.asarray(res.state.p.s)
    assert np.all(s[:2] > -1e-5)
    assert np.linalg.norm(s[3:14]) < s[2] + 1e-5
    x = np.asarray(res.variables)
    assert np.max(np.abs(b - A @ x - s)) < Options().equality_tolerance
