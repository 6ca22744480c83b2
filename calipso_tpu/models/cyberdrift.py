"""CYBERDRIFT: planar car drifting around obstacles with SOC friction at
front/rear contact patches (reference test/examples/cyberdrift.jl -- the
reference's inline CYBERTRUCK model, rebuilt analytic-JAX).

Configuration q = [x, y, yaw]; state [q_prev; q_cur]; action
u (14) = [v_cmd, omega_cmd; beta1(3); eta1(3); beta2(3); eta2(3)] where
(beta_i, eta_i) are 3-d SOC friction primal/dual triples per contact."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.trajopt.transcription import linear_interpolation

MASS, INERTIA = 1.0, 0.1
MU = (0.5, 0.25)  # front, rear
KIN_FRONT = np.array([0.1, 0.0])
KIN_REAR = np.array([-0.1, 0.0])
TIMESTEP = 0.1
NQ, NU = 3, 14


def _rot(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.array([[c, -s], [s, c]])


def contact_jacobian(q):
    """(4, 3): [tangent-plane velocities of front patch; rear patch]."""
    R = _rot(q[2])
    rf = R @ jnp.asarray(KIN_FRONT)
    rr = R @ jnp.asarray(KIN_REAR)
    return jnp.array(
        [
            [1.0, 0.0, rf[1]],
            [0.0, 1.0, -rf[0]],
            [1.0, 0.0, rr[1]],
            [0.0, 1.0, -rr[0]],
        ]
    )


def input_jacobian(q):
    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    return jnp.array([[c, s, 0.0], [0.0, 0.0, 1.0]])


def dynamics(y, x, u):
    """Variational midpoint with constant diagonal mass matrix (reference
    dynamics_discrete; D1L = 0: no in-plane gravity)."""
    M = jnp.array([MASS, MASS, INERTIA])
    h = TIMESTEP
    q1m, q2m = x[0:3], x[3:6]
    q2p, q3p = y[0:3], y[3:6]
    b1, b2 = u[3:5], u[9:11]
    lam = contact_jacobian(q2p).T @ jnp.concatenate([b1, b2])
    vm1 = (q2p - q1m) / h
    vm2 = (q3p - q2p) / h
    qm2 = 0.5 * (q2p + q3p)
    d = M * vm1 - M * vm2 + input_jacobian(qm2).T @ u[0:2] + lam
    return jnp.concatenate([q2p - q2m, d])


def soc_product3(a, b):
    return jnp.concatenate(
        [jnp.array([a @ b]), a[0] * b[1:] + b[0] * a[1:]]
    )


def contact_equality(x, u):
    q2, q3 = x[0:3], x[3:6]
    b1, e1 = u[2:5], u[5:8]
    b2, e2 = u[8:11], u[11:14]
    v = contact_jacobian(q3) @ ((q3 - q2) / TIMESTEP)
    return jnp.concatenate(
        [
            jnp.array([b1[0] - MU[0] * MASS * 9.81 * TIMESTEP]),
            jnp.array([b2[0] - MU[1] * MASS * 9.81 * TIMESTEP]),
            v[0:2] - e1[1:3],
            v[2:4] - e2[1:3],
            soc_product3(b1, e1),
            soc_product3(b2, e2),
        ]
    )


def drift_problem(horizon=15):
    x1 = np.array([0.0, 1.5, -0.5 * np.pi] * 2)
    xg = np.array([3.0, 0.0, 0.5 * np.pi] * 2)
    u_min, u_max = np.array([0.0, -0.5]), np.array([25.0, 0.5])
    p_car1, p_car2 = np.array([3.0, 0.65]), np.array([3.0, -0.65])

    def vel_term(x):
        v = (x[3:6] - x[0:3]) / TIMESTEP
        return v @ v

    def obj_t(x, u):
        dx = x - xg
        ru = jnp.concatenate([jnp.ones(2), 1.0e-5 * jnp.ones(12)])
        return 0.5e-3 * vel_term(x) + 0.5e-3 * dx @ dx + 0.5e-3 * u @ (ru * u)

    def obj_T(x, u):
        dx = x - xg
        return 2.5 * vel_term(x) + 0.5e-3 * dx @ dx

    objective = [obj_t] * (horizon - 1) + [obj_T]

    def eq_1(x, u):
        return jnp.concatenate([contact_equality(x, u), x - x1])

    def eq_t(x, u):
        return contact_equality(x, u)

    def eq_T(x, u):
        return x[0:3] - xg[0:3]

    equality = [eq_1] + [eq_t] * (horizon - 2) + [eq_T]

    def circle(x, p, r):
        return (x[0] - p[0]) ** 2 + (x[1] - p[1]) ** 2 - r**2

    def ineq_t(x, u):
        return jnp.concatenate(
            [
                u_max - u[0:2],
                u[0:2] - u_min,
                jnp.array([circle(x, p_car1, 0.1), circle(x, p_car2, 0.1)]),
            ]
        )

    nonnegative = [ineq_t] * (horizon - 1) + [None]

    soc_stage = [
        lambda x, u: u[2:5],
        lambda x, u: u[5:8],
        lambda x, u: u[8:11],
        lambda x, u: u[11:14],
    ]
    second_order = [soc_stage] * (horizon - 1) + [[]]

    state_guess = linear_interpolation(x1, xg, horizon)
    return dict(
        objective=objective,
        dynamics=[dynamics] * (horizon - 1),
        num_states=[6] * horizon,
        num_actions=[NU] * (horizon - 1),
        equality=equality,
        nonnegative=nonnegative,
        second_order=second_order,
        state_guess=state_guess,
        state_initial=x1,
        state_goal=xg,
    )
