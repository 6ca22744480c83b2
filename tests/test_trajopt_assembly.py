"""Trajopt derivative-assembly parity tests.

Mirrors reference test/trajectory_optimization/{objective,dynamics,
constraints,hessian_lagrangian}.jl: the grouped/vmapped/scatter-assembled
stage evaluators (calipso_tpu/trajopt/structured.py) must agree with dense
autodiff oracles of the assembled flat functions — the jax equivalent of the
reference's FiniteDiff.finite_difference_jacobian checks
(test/trajectory_optimization/dynamics.jl:43-51) and the symbolic dense
Hessian-of-Lagrangian check (hessian_lagrangian.jl).

Exercises every constraint family at once: ragged state dims, implicit
dynamics, per-stage equality, nonnegative cones, multiple SOCs per stage,
cross-stage equality_general, and per-stage parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calipso_tpu import TrajOptSolver


@pytest.fixture(scope="module")
def setup():
    T = 5
    nxs = [3, 3, 2, 2, 2]  # ragged state dims
    nus = [2, 2, 1, 1]

    def dyn01(y, x, u, w):
        return y - (x + 0.1 * jnp.sin(x) + 0.1 * jnp.concatenate([u, u[:1]]) + w)

    def dyn12(y, x, u, w):  # 3 -> 2 state contraction
        return y - (x[:2] * x[2] + 0.05 * u)

    def dyn23(y, x, u, w):
        return y - (x + 0.1 * jnp.tanh(u) * x)

    dynamics = [dyn01, dyn12, dyn23, dyn23]

    objective = [
        lambda x, u, w: x @ x + 0.5 * (u @ u) + w @ x,
        lambda x, u, w: jnp.sum(jnp.cos(x)) + u @ u,
        lambda x, u, w: x @ x * (1.0 + u[0] ** 2),
        lambda x, u, w: x @ x * (1.0 + u[0] ** 2),
        lambda x, u, w: 10.0 * x @ x,
    ]
    equality = [
        lambda x, u, w: x - w,
        None,
        lambda x, u, w: jnp.array([x[0] * x[1] - u[0]]),
        None,
        None,
    ]
    nonnegative = [
        None,
        lambda x, u, w: jnp.concatenate([1.0 - u, 1.0 + u]),
        None,
        lambda x, u, w: x + 2.0,
        None,
    ]
    second_order = [
        [],
        [lambda x, u, w: jnp.concatenate([jnp.array([2.0]), x[:2]])],
        [],
        [
            lambda x, u, w: jnp.concatenate([u + 1.5, x]),
            lambda x, u, w: jnp.array([3.0, x[0], u[0]]),
        ],
        [],
    ]

    def eq_general(z, th):  # cross-stage coupling (periodicity-style)
        return jnp.array([z[0] - z[-1] + th[0] * z[1]])

    parameters = [np.array([0.3, -0.2, 0.1])] + [np.zeros(0)] * (T - 1)

    ts = TrajOptSolver(
        objective,
        dynamics,
        nxs,
        nus,
        equality=equality,
        nonnegative=nonnegative,
        second_order=second_order,
        equality_general=eq_general,
        parameters=parameters,
    )
    fns = ts.solver.fns
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(size=fns.dims.variables))
    th = jnp.asarray(rng.normal(size=fns.dims.parameters))
    y = jnp.asarray(rng.normal(size=fns.dims.equality))
    zc = jnp.asarray(rng.normal(size=fns.dims.cone))
    return fns, z, th, y, zc


@pytest.mark.slow
def test_objective_gradient_and_hessian(setup):
    """reference test/trajectory_optimization/objective.jl"""
    fns, z, th, *_ = setup
    assert np.allclose(fns.fx(z, th), jax.jit(jax.grad(fns.f))(z, th), atol=1e-10)
    assert np.allclose(fns._fxx(z, th), jax.jit(jax.hessian(fns.f))(z, th), atol=1e-10)
    assert np.allclose(
        fns.fxt(z, th), jax.jit(jax.jacfwd(jax.grad(fns.f), argnums=1))(z, th), atol=1e-10
    )


def test_equality_jacobians(setup):
    """reference test/trajectory_optimization/dynamics.jl:43-51 (dynamics rows)
    + constraints.jl (stage equality rows) + equality_general rows."""
    fns, z, th, *_ = setup
    assert np.allclose(fns.gx(z, th), jax.jit(jax.jacfwd(fns.g))(z, th), atol=1e-10)
    assert np.allclose(
        fns.gt(z, th), jax.jit(jax.jacfwd(fns.g, argnums=1))(z, th), atol=1e-10
    )


def test_cone_jacobians(setup):
    """reference test/trajectory_optimization/constraints.jl (cone rows,
    incl. multiple SOCs per stage via constraints_vector.jl)."""
    fns, z, th, *_ = setup
    assert np.allclose(fns.hx(z, th), jax.jit(jax.jacfwd(fns.h))(z, th), atol=1e-10)
    assert np.allclose(
        fns.ht(z, th), jax.jit(jax.jacfwd(fns.h, argnums=1))(z, th), atol=1e-10
    )


@pytest.mark.slow
def test_dual_scalarization_derivatives(setup):
    """grad/hess of g'y and h'z vs dense oracles (reference codegen.jl:48-55
    scalarizations, checked in hessian_lagrangian.jl)."""
    fns, z, th, y, zc = setup
    gy = lambda zz, tt: fns.g(zz, tt) @ y
    hz = lambda zz, tt: fns.h(zz, tt) @ zc
    assert np.allclose(fns.gty_x(z, th, y), jax.jit(jax.grad(gy))(z, th), atol=1e-10)
    assert np.allclose(fns.htz_x(z, th, zc), jax.jit(jax.grad(hz))(z, th), atol=1e-10)
    assert np.allclose(fns._gty_xx(z, th, y), jax.jit(jax.hessian(gy))(z, th), atol=1e-10)
    assert np.allclose(fns._htz_xx(z, th, zc), jax.jit(jax.hessian(hz))(z, th), atol=1e-10)
    assert np.allclose(
        fns.gty_xt(z, th, y),
        jax.jit(jax.jacfwd(jax.grad(gy), argnums=1))(z, th),
        atol=1e-10,
    )
    assert np.allclose(
        fns.htz_xt(z, th, zc),
        jax.jit(jax.jacfwd(jax.grad(hz), argnums=1))(z, th),
        atol=1e-10,
    )


def test_hessian_blocks_direct_assembly(setup):
    """The direct stage-block tridiagonal assembly
    (structured.py:lagrangian_hessian_blocks -- no dense scatter, no
    (n, n) intermediate) must reproduce the dense Lagrangian Hessian
    exactly: densify(D, O) + Hgen == hessian(f + g'y + h'z), and the
    matrix-free band matvec must agree column-by-column."""
    fns, z, th, y, zc = setup
    st = fns.stage_structure
    assert fns._block_maps() is not None  # the maps engage on this fixture
    D, O, Hgen = fns.lagrangian_hessian_blocks(z, th, y, zc)
    lag = lambda zz: fns.f(zz, th) + fns.g(zz, th) @ y + fns.h(zz, th) @ zc
    H_ref = np.asarray(jax.jit(jax.hessian(lag))(z))
    H_band = np.asarray(st.densify(D, O))
    H = H_band + (np.asarray(Hgen) if Hgen is not None else 0.0)
    assert np.allclose(H, H_ref, atol=1e-10)
    # the band truly is block-tridiagonal: D/O blocks cover everything
    # outside Hgen
    assert np.allclose(H_ref - H_band, np.asarray(Hgen), atol=1e-10)
    # matrix-free band matvec == densified band matmul
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=fns.dims.variables))
    assert np.allclose(st.band_matvec(D, O, v), H_band @ np.asarray(v), atol=1e-10)


def test_hessian_of_lagrangian(setup):
    """reference test/trajectory_optimization/hessian_lagrangian.jl: the
    assembled Lagrangian Hessian equals the dense Hessian of the scalar
    Lagrangian f + g'y + h'z."""
    fns, z, th, y, zc = setup
    lag = lambda zz: fns.f(zz, th) + fns.g(zz, th) @ y + fns.h(zz, th) @ zc
    H = fns.lagrangian_hessian_xx(z, th, y, zc, constraint_tensor=True)
    assert np.allclose(H, jax.jit(jax.hessian(lag))(z), atol=1e-10)
    # without the constraint curvature tensor: objective Hessian only
    H0 = fns.lagrangian_hessian_xx(z, th, y, zc, constraint_tensor=False)
    assert np.allclose(H0, jax.jit(jax.hessian(lambda zz: fns.f(zz, th)))(z), atol=1e-10)
