"""Planar box move: contact-implicit sliding with corner contacts and
friction cones (reference test/examples/box_move.jl, which wraps RoboDojo's
box simulator; here an analytic planar box).

Configuration q = [x, z, yaw]; 4 corners at (+-w, +-h) body frame contact
the ground z=0. Per corner: normal impulse gamma_i, friction SOC pair
(beta_i = (slack, force), eta_i = (slack, tangential velocity)).
State: [q_prev; q_cur] (6) at t=0, then + gamma memory (10).
Action u (23) = [F(3); gamma(4); beta(8); eta(8)]."""

import numpy as np
import jax
import jax.numpy as jnp

from calipso_tpu.trajopt.transcription import linear_interpolation

MASS, INERTIA = 1.0, 0.1
HALF_W, HALF_H = 0.5, 0.5
GRAVITY = 9.81
MU = 0.5
TIMESTEP = 0.1
CORNERS = np.array(
    [[HALF_W, HALF_H], [HALF_W, -HALF_H], [-HALF_W, HALF_H], [-HALF_W, -HALF_H]]
)
NU = 3 + 4 + 8 + 8


def corner_positions(q):
    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    R = jnp.array([[c, -s], [s, c]])
    return q[:2][None, :] + (jnp.asarray(CORNERS) @ R.T)  # (4, 2)


def corner_jacobian(q, i):
    """(2, 3) Jacobian of corner i world position wrt q (rows: x, z)."""
    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    cx, cz = CORNERS[i]
    return jnp.array(
        [[1.0, 0.0, -cx * s - cz * c], [0.0, 1.0, cx * c - cz * s]]
    )


def signed_distance(q):
    return corner_positions(q)[:, 1]  # (4,) corner heights


def lagrangian(q, v):
    M = jnp.array([MASS, MASS, INERTIA])
    return 0.5 * v @ (M * v) - MASS * GRAVITY * q[1]


_D1L = jax.grad(lagrangian, argnums=0)
_D2L = jax.grad(lagrangian, argnums=1)


def dynamics(y, x, u):
    h = TIMESTEP
    q1m, q2m = x[0:3], x[3:6]
    q2p, q3p = y[0:3], y[3:6]
    gamma = u[3:7]
    lam = jnp.zeros(3)
    for i in range(4):
        beta_force = u[7 + 2 * i + 1]
        J = corner_jacobian(q2p, i)
        lam = lam + J.T @ jnp.array([beta_force, gamma[i]])
    qm1, vm1 = 0.5 * (q1m + q2p), (q2p - q1m) / h
    qm2, vm2 = 0.5 * (q2p + q3p), (q3p - q2p) / h
    d = (
        0.5 * h * _D1L(qm1, vm1)
        + _D2L(qm1, vm1)
        + 0.5 * h * _D1L(qm2, vm2)
        - _D2L(qm2, vm2)
    )
    d = d + u[0:3] + lam
    return jnp.concatenate([q2p - q2m, d, y[6:10] - u[3:7]])


def dynamics_first(y, x, u):
    return dynamics(y, x, u)


def soc_product2(a, b):
    return jnp.array([a @ b, a[0] * b[1] + b[0] * a[1]])


def contact_equality(x, u):
    q2, q3 = x[0:3], x[3:6]
    gamma = u[3:7]
    v = (q3 - q2) / TIMESTEP
    rows = []
    for i in range(4):
        b = u[7 + 2 * i : 9 + 2 * i]
        e = u[15 + 2 * i : 17 + 2 * i]
        vT = (corner_jacobian(q3, i) @ v)[0]
        rows.append(jnp.array([MU * gamma[i] - b[0], vT - e[1]]))
        rows.append(soc_product2(b, e))
    return jnp.concatenate(rows)


def move_problem(horizon=11):
    q1 = np.array([0.0, HALF_H, 0.0])
    qT = np.array([1.0, HALF_H, 0.0])
    x1 = np.concatenate([q1, q1])
    xg = np.concatenate([qT, qT])

    def obj_t(x, u):
        dx = x[:6] - xg
        return 0.5 * dx @ dx + 0.5e-2 * (u[0:3] @ u[0:3])

    def obj_T(x, u):
        dx = x[:6] - xg
        return 0.5 * dx @ dx

    objective = [obj_t] * (horizon - 1) + [obj_T]

    def eq_1(x, u):
        return jnp.concatenate([contact_equality(x, u), x[0:6] - x1])

    def eq_t(x, u):
        compl = x[6:10] * signed_distance(x[3:6])
        return jnp.concatenate([contact_equality(x, u), compl])

    def eq_T(x, u):
        compl = x[6:10] * signed_distance(x[3:6])
        return jnp.concatenate([compl, x[0:6] - xg])

    equality = [eq_1] + [eq_t] * (horizon - 2) + [eq_T]

    def ineq_t(x, u):
        return jnp.concatenate([signed_distance(x[3:6]), u[3:7]])

    def ineq_T(x, u):
        return signed_distance(x[3:6])

    nonnegative = [ineq_t] * (horizon - 1) + [ineq_T]

    soc_stage = [
        (lambda x, u, _i=i: u[7 + 2 * _i : 9 + 2 * _i]) for i in range(4)
    ] + [(lambda x, u, _i=i: u[15 + 2 * _i : 17 + 2 * _i]) for i in range(4)]
    second_order = [soc_stage] * (horizon - 1) + [[]]

    interp = linear_interpolation(x1, xg, horizon)
    state_guess = [np.asarray(interp[0])] + [
        np.concatenate([np.asarray(interp[t]), np.zeros(4)]) for t in range(1, horizon)
    ]
    # support impulses: bottom corners carry the weight
    g_half = MASS * GRAVITY * TIMESTEP / 2.0
    action_guess = [
        np.concatenate(
            [np.zeros(3), [0.0, g_half, 0.0, g_half], np.tile([0.2, 0.0], 4), np.tile([0.2, 0.0], 4)]
        )
        for _ in range(horizon - 1)
    ]

    return dict(
        objective=objective,
        dynamics=[dynamics] * (horizon - 1),
        num_states=[6] + [10] * (horizon - 1),
        num_actions=[NU] * (horizon - 1),
        equality=equality,
        nonnegative=nonnegative,
        second_order=second_order,
        state_guess=state_guess,
        action_guess=action_guess,
        state_initial=x1,
        state_goal=xg,
    )
