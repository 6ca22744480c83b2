"""Planar hopper gait: contact-implicit trajopt with nonlinear (SOC)
friction cones, complementarity, joint limits, and gait periodicity
(reference test/examples/hopper_gait.jl, which wraps RoboDojo's hopper;
here the model is analytic JAX -- Lagrangian derivatives come from
jax.grad of the Lagrangian instead of RoboDojo codegen).

Configuration q = [x_body, z_body, body_angle, leg_length]:
  foot position  p_f = (x + r sin th, z - r cos th)
Contacts (4): body-ground, foot-ground, leg min/max limits.
Action u (14) = [controls(2); gamma(4); beta(4); eta(4)]:
  gamma  contact impulses, beta = (slack, force) friction pairs,
  eta    = (slack, tangential velocity) duals; |beta2| <= beta1 = mu*gamma
  enforced via 2-d SOCs on (beta, eta) pairs with beta o eta = 0.
State: [q1; q2] at t=0 (8), then [q1; q2; gamma_prev(4)] (12); the gait
periodicity + travel rows couple the first and last stages through
`equality_general`, handled by the structured KKT backends as a low-rank
Schur border (the reference instead augments every stage's state with a
carried copy of x_1, test/examples/hopper_gait.jl hopper_dyn1/dynt --
available here as gait_problem(carry_first_state=True) for comparison).
"""

import numpy as np
import jax
import jax.numpy as jnp

MASS_BODY, MASS_FOOT = 1.0, 0.1
INERTIA_BODY = 0.1
BODY_RADIUS, FOOT_RADIUS = 0.1, 0.05
GRAVITY = 9.81
MU_BODY, MU_FOOT = 0.5, 0.5
LEG_MIN, LEG_MAX = 0.25, 1.0
TIMESTEP = 0.05
NQ, NU_CTRL = 4, 2
NU = NU_CTRL + 4 + 4 + 4  # controls, gamma, beta, eta


def kinematics_foot(q):
    return jnp.array([q[0] + q[3] * jnp.sin(q[2]), q[1] - q[3] * jnp.cos(q[2])])


def foot_jacobian(q):
    s, c, r = jnp.sin(q[2]), jnp.cos(q[2]), q[3]
    return jnp.array([[1.0, 0.0, r * c, s], [0.0, 1.0, r * s, -c]])


def mass_matrix(q):
    J = foot_jacobian(q)
    M = jnp.diag(jnp.array([MASS_BODY, MASS_BODY, INERTIA_BODY, 1.0e-4]))
    return M + MASS_FOOT * J.T @ J


def potential(q):
    zf = q[1] - q[3] * jnp.cos(q[2])
    return GRAVITY * (MASS_BODY * q[1] + MASS_FOOT * zf)


def lagrangian(q, v):
    return 0.5 * v @ (mass_matrix(q) @ v) - potential(q)


_D1L = jax.grad(lagrangian, argnums=0)
_D2L = jax.grad(lagrangian, argnums=1)


def signed_distance(q):
    zf = q[1] - q[3] * jnp.cos(q[2])
    return jnp.array(
        [q[1] - BODY_RADIUS, zf - FOOT_RADIUS, q[3] - LEG_MIN, LEG_MAX - q[3]]
    )


def contact_impulse(q, gamma, beta):
    """Generalized contact impulse: body (tangent, normal), foot (tangent,
    normal), leg-limit impulses, plus the body rolling moment
    (reference hopper_dyn: lambda[3] += body_radius * beta[2])."""
    Jb = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    Jf = foot_jacobian(q)
    lam = Jb.T @ jnp.array([beta[1], gamma[0]])
    lam = lam + Jf.T @ jnp.array([beta[3], gamma[1]])
    lam = lam + jnp.array([0.0, 0.0, 0.0, 1.0]) * (gamma[2] - gamma[3])
    lam = lam.at[2].add(BODY_RADIUS * beta[1])
    return lam


def variational_dynamics(h, q0, q1, u_ctrl, lam, q2):
    """Variational midpoint integrator residual (RoboDojo.dynamics
    analogue)."""
    qm1, vm1 = 0.5 * (q0 + q1), (q1 - q0) / h
    qm2, vm2 = 0.5 * (q1 + q2), (q2 - q1) / h
    d = (
        0.5 * h * _D1L(qm1, vm1)
        + _D2L(qm1, vm1)
        + 0.5 * h * _D1L(qm2, vm2)
        - _D2L(qm2, vm2)
    )
    B = jnp.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    return d + B @ u_ctrl + lam


def _dyn_core(y, x, u):
    q1m, q2m = x[0:4], x[4:8]
    q2p, q3p = y[0:4], y[4:8]
    gamma, beta = u[2:6], u[6:10]
    lam = contact_impulse(q2p, gamma, beta)
    return jnp.concatenate(
        [q2p - q2m, variational_dynamics(TIMESTEP, q1m, q2p, u[:2], lam, q3p)]
    )


def dynamics(y, x, u):
    # y carries [q2+, q3+, gamma]
    return jnp.concatenate([_dyn_core(y, x, u), y[8:12] - u[2:6]])


def dynamics_first_carried(y, x, u):
    # y carries [q2+, q3+, gamma, x_first(8)]
    return jnp.concatenate([_dyn_core(y, x, u), y[8:12] - u[2:6], y[12:20] - x])


def dynamics_t_carried(y, x, u):
    return jnp.concatenate([_dyn_core(y, x, u), y[8:12] - u[2:6], y[12:20] - x[12:20]])


def soc_product2(a, b):
    return jnp.array([a @ b, a[0] * b[1] + b[0] * a[1]])


def friction_equality(x, u):
    """fc (2), vc (2), SOC products beta o eta (4) (reference
    contact_constraints_equality_*)."""
    q2, q3 = x[0:4], x[4:8]
    gamma, beta, eta = u[2:6], u[6:10], u[10:14]
    fc = jnp.array([MU_BODY, MU_FOOT]) * gamma[:2] - jnp.array([beta[0], beta[2]])
    v = (q3 - q2) / TIMESTEP
    vT_body = v[0] + BODY_RADIUS * v[2]
    vT_foot = (foot_jacobian(q3) @ v)[0]
    vc = jnp.array([vT_body - eta[1], vT_foot - eta[3]])
    socp = jnp.concatenate(
        [soc_product2(beta[0:2], eta[0:2]), soc_product2(beta[2:4], eta[2:4])]
    )
    return jnp.concatenate([fc, vc, socp])


def gait_problem(horizon=21, travel=0.5, carry_first_state=False):
    q1 = np.array([0.0, 0.5 + FOOT_RADIUS, 0.0, 0.5])
    q_ref = np.array([0.5, 0.5 + FOOT_RADIUS, 0.0, 0.25])
    x1 = np.concatenate([q1, q1])
    x_ref = np.concatenate([q_ref, q_ref])
    r_cost, q_cost = 1.0e-1, 1.0e-1

    nx_t = 20 if carry_first_state else 12
    num_states = [8] + [nx_t] * (horizon - 1)
    num_actions = [NU] * (horizon - 1)

    def obj1(x, u):
        dx = x - x_ref
        return 0.5 * dx @ dx + 0.5 * r_cost * (u[:2] @ u[:2])

    def objt(x, u):
        dx = x[:8] - x_ref
        return 0.5 * q_cost * dx @ dx + 0.5 * r_cost * (u[:2] @ u[:2])

    def objT(x, u):
        dx = x[:8] - x_ref
        return 0.5 * dx @ dx

    objective = [obj1] + [objt] * (horizon - 2) + [objT]

    def eq_1(x, u):
        return jnp.concatenate(
            [
                kinematics_foot(x[0:4]) - kinematics_foot(jnp.asarray(q1)),
                kinematics_foot(x[4:8]) - kinematics_foot(jnp.asarray(q1)),
                friction_equality(x, u),
                x[0:4] - q1,
            ]
        )

    def eq_t(x, u):
        compl = x[8:12] * signed_distance(x[4:8])
        return jnp.concatenate([friction_equality(x, u), compl])

    def eq_T_carried(x, u):
        # periodicity in (z, angle, leg) for both configurations vs the
        # carried first state
        th = x[12:20]
        compl = x[8:12] * signed_distance(x[4:8])
        return jnp.concatenate(
            [compl, x[1:4] - th[1:4], x[5:8] - th[5:8]]
        )

    def eq_T(x, u):
        # config-1 periodicity rows are stage-local: eq_1 pins x[0:4] = q1,
        # so x_T[1:4] - x_1[1:4] reduces to x[1:4] - q1[1:4]
        compl = x[8:12] * signed_distance(x[4:8])
        return jnp.concatenate([compl, x[1:4] - jnp.asarray(q1)[1:4]])

    equality = (
        [eq_1] + [eq_t] * (horizon - 2) + [eq_T_carried if carry_first_state else eq_T]
    )

    def ineq_1(x, u):
        return jnp.concatenate(
            [
                signed_distance(x[4:8]),
                u[0:6] - jnp.array([-10.0, -10.0, 0.0, 0.0, 0.0, 0.0]),
                jnp.array([10.0, 10.0]) - u[0:2],
                jnp.array([x[1], x[3], x[5], x[7], 1.0 - x[3], 1.0 - x[7]]),
            ]
        )

    ineq_t = ineq_1

    def ineq_T_carried(x, u):
        th = x[12:20]
        return jnp.concatenate(
            [
                jnp.array([x[0] - th[0] - travel, x[4] - th[4] - travel]),
                signed_distance(x[4:8]),
                jnp.array([x[1], x[3], x[5], x[7], 1.0 - x[3], 1.0 - x[7]]),
            ]
        )

    def ineq_T(x, u):
        # config-1 travel is stage-local too (x_1[0] = q1[0] pinned); the
        # reference's (x[1] - theta[1]) - x_travel inequality
        # (hopper_gait.jl inequality_T) with the carried theta replaced by
        # the known q1
        return jnp.concatenate(
            [
                signed_distance(x[4:8]),
                jnp.array(
                    [
                        x[0] - (q1[0] + travel),
                        x[1], x[3], x[5], x[7], 1.0 - x[3], 1.0 - x[7],
                    ]
                ),
            ]
        )

    nonnegative = (
        [ineq_1] + [ineq_t] * (horizon - 2) + [ineq_T_carried if carry_first_state else ineq_T]
    )

    # 2-d SOC pairs (beta and eta per contact) per stage
    soc_stage = [
        lambda x, u: u[6:8],
        lambda x, u: u[8:10],
        lambda x, u: u[10:12],
        lambda x, u: u[12:14],
    ]
    second_order = [soc_stage] * (horizon - 1) + [[]]

    if carry_first_state:
        state_guess = [x1] + [
            np.concatenate([x1, np.zeros(4), x1]) for _ in range(horizon - 1)
        ]
        dyn = [dynamics_first_carried] + [dynamics_t_carried] * (horizon - 2)
        equality_general = None
    else:
        state_guess = [x1] + [
            np.concatenate([x1, np.zeros(4)]) for _ in range(horizon - 1)
        ]
        dyn = [dynamics] * (horizon - 1)

        def equality_general(z, theta):
            # only the rows that truly couple stages: config-2 periodicity
            # (x_1[4:8] is free -- eq_1 pins the foot kinematics, not the
            # configuration) and the config-2 travel, made exact (the
            # reference's >= turns active at the optimum). 4 rows instead
            # of 8 keeps the Schur border small.
            x_first = z[0:8]
            x_last = z[z.shape[0] - 12 : z.shape[0] - 4]
            return jnp.concatenate(
                [
                    x_last[5:8] - x_first[5:8],
                    x_last[4:5] - x_first[4:5] - travel,
                ]
            )

    action_guess = [
        np.concatenate(
            [[0.0, GRAVITY * MASS_BODY * 0.5 * TIMESTEP], 1.0e-1 * np.ones(NU - 2)]
        )
        for _ in range(horizon - 1)
    ]

    return dict(
        objective=objective,
        dynamics=dyn,
        num_states=num_states,
        num_actions=num_actions,
        equality=equality,
        equality_general=equality_general,
        nonnegative=nonnegative,
        second_order=second_order,
        state_guess=state_guess,
        action_guess=action_guess,
        state_initial=x1,
    )
