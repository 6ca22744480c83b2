"""Dense LDL^T + inertia tests (replaces the reference's QDDL unit
behavior: factorize, solve, inertia from sign(D))."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.ops.ldl import ldl_factor, ldl_solve, inertia_counts


def quasidefinite(n, m, rng):
    A = rng.normal(size=(n, n))
    H = A @ A.T + np.eye(n)
    B = rng.normal(size=(m, n))
    C = np.diag(rng.uniform(0.5, 2.0, m))
    K = np.block([[H, B.T], [B, -C]])
    return K


def test_factor_solve():
    rng = np.random.default_rng(0)
    K = quasidefinite(12, 7, rng)
    L, d = ldl_factor(jnp.asarray(K))
    recon = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    np.testing.assert_allclose(recon, K, atol=1e-9)
    b = rng.normal(size=19)
    x = ldl_solve(L, d, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, b), atol=1e-8)


def test_multi_rhs():
    rng = np.random.default_rng(1)
    K = quasidefinite(8, 4, rng)
    L, d = ldl_factor(jnp.asarray(K))
    B = rng.normal(size=(12, 5))
    X = ldl_solve(L, d, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(K, B), atol=1e-8)


def test_inertia():
    rng = np.random.default_rng(2)
    K = quasidefinite(9, 6, rng)
    _, d = ldl_factor(jnp.asarray(K))
    pos, neg, zero = inertia_counts(d)
    evals = np.linalg.eigvalsh(K)
    assert int(pos) == int(np.sum(evals > 0)) == 9
    assert int(neg) == int(np.sum(evals < 0)) == 6
    assert int(zero) == 0


def test_inertia_indefinite_hessian():
    # Sylvester check on a non-quasidefinite symmetric matrix
    rng = np.random.default_rng(3)
    A = rng.normal(size=(10, 10))
    K = 0.5 * (A + A.T)
    _, d = ldl_factor(jnp.asarray(K))
    pos, neg, zero = inertia_counts(d)
    evals = np.linalg.eigvalsh(K)
    assert int(pos) == int(np.sum(evals > 1e-12))
    assert int(neg) == int(np.sum(evals < -1e-12))
