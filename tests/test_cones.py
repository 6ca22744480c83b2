"""Tier-1 kernel tests: padded cone ops vs dense per-cone references
(mirrors the role of the reference's assembly checks, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calipso_tpu.ops import cones
from calipso_tpu.ops.cones import ConeLayout


def dense_arrow(u):
    n = len(u)
    A = u[0] * np.eye(n)
    A[0, :] = u
    A[:, 0] = u
    return A


@pytest.fixture
def layout():
    # 3 orthant entries + SOC(3) + SOC(4), interleaved order
    return ConeLayout(
        10,
        nonnegative_indices=[0, 4, 9],
        second_order_indices=[[1, 2, 3], [5, 6, 7, 8]],
    )


def blocks(layout):
    return [np.array([0]), np.array([4]), np.array([9]), np.array([1, 2, 3]), np.array([5, 6, 7, 8])]


def interior(layout, rng):
    x = rng.uniform(0.5, 1.5, layout.num_cone)
    for idx in layout.second_order_indices:
        x[idx[0]] = 1.0 + np.linalg.norm(x[idx[1:]])
    return x


def test_product(layout):
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=10), rng.normal(size=10)
    got = np.asarray(cones.product(layout, jnp.asarray(a), jnp.asarray(b)))
    want = np.zeros(10)
    for idx in blocks(layout):
        ab, bb = a[idx], b[idx]
        want[idx] = np.concatenate([[ab @ bb], ab[0] * bb[1:] + bb[0] * ab[1:]])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_arrow_solve_roundtrip(layout):
    rng = np.random.default_rng(1)
    u = interior(layout, rng)
    x = rng.normal(size=10)
    y = cones.arrow_solve(layout, jnp.asarray(u), jnp.asarray(x))
    # arrow(u) y == u o y == x
    back = cones.product(layout, jnp.asarray(u), y)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)


def test_barrier_and_gradient(layout):
    rng = np.random.default_rng(2)
    s = interior(layout, rng)
    val = float(cones.barrier(layout, jnp.asarray(s)))
    want = 0.0
    for idx in blocks(layout):
        sb = s[idx]
        want += 0.5 * np.log(sb[0] ** 2 - sb[1:] @ sb[1:])
    assert abs(val - want) < 1e-12
    # gradient consistency with autodiff of the barrier itself
    g = cones.barrier_gradient(layout, jnp.asarray(s))
    g_ad = jax.grad(lambda v: cones.barrier(layout, v))(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-10)


def test_target_and_init(layout):
    e = np.asarray(layout.target(jnp.float64))
    init = np.asarray(layout.initialize(jnp.float64))
    for idx in blocks(layout):
        assert e[idx[0]] == 1.0
        assert np.all(e[idx[1:]] == 0.0)
        assert init[idx[0]] == 1.0
        assert np.all(init[idx[1:]] == (0.1 if len(idx) > 1 else 0.1))


def test_violation(layout):
    rng = np.random.default_rng(3)
    x = interior(layout, rng)
    tau = 0.99
    # no violation at a strictly feasible candidate shrunk toward x
    assert not bool(cones.violation(layout, jnp.asarray(x), jnp.asarray(x), tau))
    # violate the first orthant entry
    bad = x.copy()
    bad[0] = -1.0
    assert bool(cones.violation(layout, jnp.asarray(bad), jnp.asarray(x), tau))
    # violate a SOC: tail norm exceeds head
    bad2 = x.copy()
    bad2[1] = 0.0
    bad2[2] = 10.0
    assert bool(cones.violation(layout, jnp.asarray(bad2), jnp.asarray(x), tau))


def test_condensed_block_formula(layout):
    rng = np.random.default_rng(4)
    s, t = interior(layout, rng), interior(layout, rng)
    eps_p, eps_d = 0.12, 0.21
    got = np.asarray(
        cones.condensed_block(layout, jnp.asarray(s), jnp.asarray(t), eps_p, eps_d, jnp.float64)
    )
    want = np.zeros((10, 10))
    for idx in blocks(layout):
        e1 = np.zeros(len(idx))
        e1[0] = 1.0
        v = s[idx] - eps_d * e1
        M = dense_arrow(t[idx]) + eps_p * dense_arrow(v)
        block = -eps_d * np.eye(len(idx)) - np.linalg.solve(M, dense_arrow(v))
        want[np.ix_(idx, idx)] = block
    np.testing.assert_allclose(got, want, atol=1e-10)
