"""Tier-2 convergence tests on the reference's canonical NLPs
(reference test/solver/{wachter,maratos,knitro,test1-4,qp_*}.jl).
Every test asserts the four-tolerance acceptance contract
(reference wachter.jl:35-46, BASELINE.md)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import Solver, Options, empty_constraint


def assert_contract(result, opts=Options()):
    st = result.state
    assert bool(st.solved), (
        f"not solved: res={float(st.residual_violation):.3e} "
        f"slack={float(st.slack_violation):.3e} eq={float(st.equality_violation):.3e} "
        f"comp={float(st.cone_product_violation):.3e} failed={bool(st.failed)}"
    )
    assert float(st.residual_violation) < opts.residual_tolerance
    assert float(st.slack_violation) < opts.slack_tolerance
    assert float(st.equality_violation) <= opts.equality_tolerance
    assert float(st.cone_product_violation) <= opts.complementarity_tolerance


def test_wachter():
    # reference test/solver/wachter.jl: known solution x* = [1, 0, 0.5]
    solver = Solver(
        lambda x: x[0],
        lambda x: jnp.array([x[0] ** 2 - x[1] - 1.0, x[0] - x[2] - 0.5]),
        lambda x: x[1:3],
        3,
    )
    res = solver.solve(jnp.array([-2.0, 3.0, 1.0]))
    assert_contract(res)
    np.testing.assert_allclose(
        np.asarray(res.variables), [1.0, 0.0, 0.5], atol=1e-3
    )


def test_maratos():
    solver = Solver(
        lambda x: 2.0 * (x[0] ** 2 + x[1] ** 2 - 1.0) - x[0],
        lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
        empty_constraint,
        2,
    )
    res = solver.solve(jnp.array([2.0, 1.0]))
    assert_contract(res)


def test_knitro_complementarity():
    def equality(x):
        return jnp.array(
            [
                2.0 * (x[1] - 1.0) - 1.5 * x[1] + x[2] - 0.5 * x[3] + x[4],
                3.0 * x[0] - x[1] - 3.0 - x[5],
                -x[0] + 0.5 * x[1] + 4.0 - x[6],
                -x[0] - x[1] + 7.0 - x[7],
                x[2] * x[5],
                x[3] * x[6],
                x[4] * x[7],
            ]
        )

    solver = Solver(
        lambda x: (x[0] - 5.0) ** 2 + (2.0 * x[1] + 1.0) ** 2,
        equality,
        lambda x: x,
        8,
    )
    res = solver.solve(jnp.zeros(8))
    assert_contract(res)


def test_nlp1():
    # reference test/solver/test1.jl: 50 vars, 30 nonconvex equalities
    solver = Solver(
        lambda x: x @ x,
        lambda x: x[:30] ** 2 - 1.2,
        lambda x: jnp.array([x[0] + 10.0, x[1] + 5.0, 20.0 - x[4]]),
        50,
    )
    res = solver.solve(jnp.ones(50))
    assert_contract(res)


def test_nlp2():
    rng = np.random.default_rng(0)
    solver = Solver(
        lambda x: -x[0] * x[1] + 2.0 / (3.0 * jnp.sqrt(3.0)),
        empty_constraint,
        lambda x: jnp.array([-x[0] - x[1] ** 2 + 1.0, x[0] + x[1]]),
        2,
    )
    res = solver.solve(jnp.asarray(rng.uniform(size=2)))
    assert_contract(res)


def test_nlp3_rosenbrock():
    rng = np.random.default_rng(1)
    solver = Solver(
        lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        empty_constraint,
        lambda x: jnp.array([-((x[0] - 1.0) ** 3) + x[1] - 1.0, -x[0] - x[1] + 2.0]),
        2,
    )
    res = solver.solve(jnp.asarray(rng.uniform(size=2)))
    assert_contract(res)


def test_nlp4():
    rng = np.random.default_rng(2)
    solver = Solver(
        lambda x: x[0] - 2.0 * x[1] + x[2] + jnp.sqrt(6.0),
        empty_constraint,
        lambda x: jnp.array([1.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2]),
        3,
    )
    res = solver.solve(jnp.asarray(rng.uniform(size=3)))
    assert_contract(res)


def _qp_problem(num_variables=10, num_equality=5, seed=4):
    rng = np.random.default_rng(seed)
    xhat = np.maximum(0.0, rng.normal(size=num_variables))
    Q = rng.uniform(size=(num_variables, num_variables))
    Pd = np.diag(Q.T @ Q).copy()
    p = rng.normal(size=num_variables)
    A = rng.uniform(size=(num_equality, num_variables))
    b = A @ xhat
    params = np.concatenate([Pd, p, A.reshape(-1), b])

    nv, ne = num_variables, num_equality

    def objective(x, th):
        return 0.5 * x @ (th[:nv] * x) + th[nv : 2 * nv] @ x

    def equality(x, th):
        At = th[2 * nv : 2 * nv + ne * nv].reshape(ne, nv)
        bt = th[2 * nv + ne * nv :]
        return At @ x - bt

    return objective, equality, params, Pd, p, A, b


def test_qp_equality():
    # reference test/solver/qp_equality.jl: tight tolerances + sensitivity
    objective, equality, params, Pd, p, A, b = _qp_problem()
    opts = Options(
        residual_tolerance=1e-8,
        equality_tolerance=1e-6,
        complementarity_tolerance=1e-6,
        differentiate=True,
    )
    solver = Solver(
        objective, equality, empty_constraint, 10, parameters=params, options=opts
    )
    rng = np.random.default_rng(5)
    res = solver.solve(jnp.asarray(rng.normal(size=10)))
    assert_contract(res, opts)
    x = np.asarray(res.variables)
    assert np.max(np.abs(A @ x - b)) < opts.equality_tolerance

    # sensitivity vs the dense implicit-function oracle
    # (reference qp_equality.jl sensitivity block)
    nv, ne, npar = 10, 5, len(params)
    y = np.asarray(res.state.p.y)
    K = np.block([[np.diag(Pd), A.T], [A, np.zeros((ne, ne))]])
    # dR/dtheta rows: grad_x L wrt theta, then g wrt theta
    dPx = np.zeros((nv, npar))
    dPx[:, :nv] = np.diag(x)  # d(P x)/d(diag P)
    dPx[:, nv : 2 * nv] = np.eye(nv)  # d(p)/dp
    dAty = np.zeros((nv, npar))
    for i in range(ne):
        dAty[:, 2 * nv + i * nv : 2 * nv + (i + 1) * nv] = y[i] * np.eye(nv)
    dAxb = np.zeros((ne, npar))
    for i in range(ne):
        dAxb[i, 2 * nv + i * nv : 2 * nv + (i + 1) * nv] = x
    dAxb[:, 2 * nv + ne * nv :] = -np.eye(ne)
    want = -np.linalg.solve(K, np.vstack([dPx + dAty, dAxb]))

    sens = np.asarray(res.sensitivity)
    np.testing.assert_allclose(sens[:nv], want[:nv], atol=1e-2)


def test_qp_nonnegative():
    objective, equality, params, Pd, p, A, b = _qp_problem(seed=6)
    solver = Solver(
        objective,
        equality,
        lambda x, th: x,
        10,
        parameters=params,
        options=Options(differentiate=True),
    )
    rng = np.random.default_rng(7)
    res = solver.solve(jnp.asarray(rng.normal(size=10)))
    assert_contract(res)
    x = np.asarray(res.variables)
    assert np.all(x > -1e-4)
    assert np.max(np.abs(A @ x - b)) < Options().equality_tolerance
