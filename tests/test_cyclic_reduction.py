"""Parallel-in-time block cyclic reduction backend (ops/cyclic_reduction.py).

Op level: exact agreement with a dense solve on random SPD block-tridiagonal
systems over a range of horizons (power-of-two and ragged), multi-RHS, and
non-PD detection (the inertia signal, reference inertia.jl:7-11).
Solver level: linear_solver='cr' reproduces the Riccati backend's iterates
on a pendulum swing-up (backend equivalence, same contract as
tests/test_backend_matrix.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calipso_tpu.ops import riccati as rc
from calipso_tpu.ops import cyclic_reduction as crd


def _random_spd_tridiag(rng, T, d, shift=5.0):
    O = jnp.asarray(rng.normal(size=(max(T - 1, 0), d, d)))
    D = jnp.asarray(
        np.stack([(lambda A: A @ A.T + shift * np.eye(d))(rng.normal(size=(d, d))) for _ in range(T)])
    )
    n = T * d
    S = np.zeros((n, n))
    for t in range(T):
        S[t * d : (t + 1) * d, t * d : (t + 1) * d] = D[t]
    for t in range(T - 1):
        S[(t + 1) * d : (t + 2) * d, t * d : (t + 1) * d] = O[t]
        S[t * d : (t + 1) * d, (t + 1) * d : (t + 2) * d] = O[t].T
    w = np.linalg.eigvalsh(S).min()
    if w < 0.5:
        S += (0.5 - w) * np.eye(n)
        D = D + (0.5 - w) * jnp.eye(d)[None]
    return D, O, S


@pytest.mark.parametrize("T", [1, 2, 3, 8, 13, 31])
def test_cr_matches_dense(T):
    rng = np.random.default_rng(T)
    d = 4
    D, O, S = _random_spd_tridiag(rng, T, d)
    b = jnp.asarray(rng.normal(size=(T, d)))
    fact = crd.factor(D, O)
    x = crd.solve(fact, b)
    x_ref = np.linalg.solve(S, np.asarray(b).ravel()).reshape(T, d)
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-10
    assert bool(crd.factors_finite(fact))
    # multi-RHS
    B = jnp.asarray(rng.normal(size=(T, d, 3)))
    X = crd.solve_multi(fact, B)
    for k in range(3):
        xk = np.linalg.solve(S, np.asarray(B[:, :, k]).ravel()).reshape(T, d)
        assert np.abs(np.asarray(X[:, :, k]) - xk).max() < 1e-10


def test_cr_detects_indefinite():
    d = 3
    D = jnp.asarray(np.stack([np.eye(d)] * 5)).at[2].set(-jnp.eye(d))
    O = jnp.zeros((4, d, d))
    assert not bool(crd.factors_finite(crd.factor(D, O)))


def test_cr_jit_vmap_agrees_with_riccati():
    rng = np.random.default_rng(7)
    T, d, B = 9, 4, 6
    Ds, Os, bs = [], [], []
    for i in range(B):
        D, O, _ = _random_spd_tridiag(rng, T, d)
        Ds.append(D), Os.append(O), bs.append(rng.normal(size=(T, d)))
    D, O, b = jnp.stack(Ds), jnp.stack(Os), jnp.asarray(np.stack(bs))
    x_cr = jax.jit(jax.vmap(lambda D, O, b: crd.solve(crd.factor(D, O), b)))(D, O, b)
    def one(D, O, b):
        L, M = rc.factor(D, O)
        return rc.solve(L, M, b)
    x_rc = jax.vmap(one)(D, O, b)
    assert np.abs(np.asarray(x_cr) - np.asarray(x_rc)).max() < 1e-10


def test_cr_backend_solves_pendulum():
    from calipso_tpu import TrajOptSolver, Options

    def pend_c(x, u):
        return jnp.array(
            [x[1], u[0] / 0.25 - 9.81 * jnp.sin(x[0]) / 0.5 - 0.1 * x[1] / 0.25]
        )

    def pend_d(y, x, u):
        return y - (x + 0.05 * pend_c(0.5 * (x + y), u))

    H = 11
    xg = jnp.array([np.pi, 0.0])
    objective = [
        *[(lambda x, u, w: 0.1 * x @ x + 0.1 * u @ u)] * (H - 1),
        lambda x, u, w: 0.1 * x @ x,
    ]
    equality = [lambda x, u, w: x, *[None] * (H - 2), lambda x, u, w: x - xg]

    iters = {}
    for backend in ("riccati", "cr"):
        ts = TrajOptSolver(
            objective,
            [pend_d] * (H - 1),
            [2] * H,
            [1] * (H - 1),
            equality=equality,
            options=Options(linear_solver=backend),
        )
        guess = np.zeros(ts.num_variables)
        for t, idx in enumerate(ts._state_indices):
            guess[idx] = np.asarray(xg) * t / (H - 1)
        ts.solver.initialize(jnp.asarray(guess))
        st = ts.solve().state
        assert bool(st.solved), backend
        assert float(st.residual_violation) < 1e-4
        assert float(st.equality_violation) <= 1e-4
        assert float(st.cone_product_violation) <= 1e-4
        iters[backend] = int(st.total_i)
    # identical elimination up to roundoff -> identical iteration counts
    assert iters["cr"] == iters["riccati"]
