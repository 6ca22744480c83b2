"""Bunny hop: a mountain bike (two wheel masses + rider mass on a rigid
wheelbase link) jumps both wheels over an obstacle (reference
examples/contact_implicit/bunnyhop.jl + models/mountain_bike.jl).

Unlike the trajopt examples this is a RAW flat NLP over
z = [q_1..q_N (6 each); u_1..u_{N-1} (2); lambda_1..{N-2} (1);
eta_1..{N-2} (3)]: variational discrete Euler-Lagrange dynamics with a
wheelbase pin (lambda) and ground-contact complementarity (eta), a jump
equality at the middle step, and nonnegativity of eta and the contact
gaps -- exercising the solver's unstructured path on a contact problem.
"""

import numpy as np
import jax.numpy as jnp

M_RIDER1, M_RIDER2, M_BODY = 1.0, 1.0, 10.0
H = 0.2
GRAV = np.array([0.0, -9.8])
WHEEL_BASE = 2.0
N = 10


def _control_forces(r1, r2, u):
    d = (-r1 + r2)
    d = d / jnp.sqrt(d @ d)
    return u * d, -u * d


def _trans_del(m, r1, r2, r3):
    return (m / H) * (r2 - r1) - (m / H) * (r3 - r2)


def link(q):
    r1, r2 = q[0:2], q[2:4]
    return (r1 - r2) @ (r1 - r2) - WHEEL_BASE**2


def gaps(q):
    """Wheels above ground, rider above 0.3 m."""
    return jnp.array([q[1], q[3], q[5] - 0.3])


def _del_eq(q1, q2, q3, u_m, u_p):
    r = lambda q, i: q[2 * i : 2 * i + 2]
    Fg = jnp.concatenate([M_RIDER1 * GRAV, M_RIDER2 * GRAV, M_BODY * GRAV])

    def forces(qa, qb, u):
        f1, f3a = _control_forces(0.5 * (r(qa, 0) + r(qb, 0)), 0.5 * (r(qa, 2) + r(qb, 2)), u[0])
        f2, f3b = _control_forces(0.5 * (r(qa, 1) + r(qb, 1)), 0.5 * (r(qa, 2) + r(qb, 2)), u[1])
        return jnp.concatenate([f1, f2, f3a + f3b])

    Fm = Fg + forces(q1, q2, u_m)
    Fp = Fg + forces(q3, q2, u_p)
    core = jnp.concatenate(
        [
            _trans_del(M_RIDER1, r(q1, 0), r(q2, 0), r(q3, 0)),
            _trans_del(M_RIDER2, r(q1, 1), r(q2, 1), r(q3, 1)),
            _trans_del(M_BODY, r(q1, 2), r(q2, 2), r(q3, 2)),
        ]
    )
    return core + 0.5 * H * Fm + 0.5 * H * Fp


def _dyn(q1, q2, q3, lam, eta, u1, u2):
    import jax

    Dc = jax.grad(link)(q2)
    Dd = jax.jacfwd(gaps)(q2)
    return jnp.concatenate(
        [
            _del_eq(q1, q2, q3, u1, u2) + H * Dc * lam[0] + H * Dd.T @ eta,
            jnp.array([link(q3)]),
            eta * gaps(q3),
        ]
    )


# flat indexing (reference bunnyhop.jl "problem indexing for NLP")
IDX_Q = [np.arange(6 * i, 6 * i + 6) for i in range(N)]
_u0 = IDX_Q[-1][-1] + 1
IDX_U = [np.arange(_u0 + 2 * i, _u0 + 2 * i + 2) for i in range(N - 1)]
_l0 = IDX_U[-1][-1] + 1
IDX_LAM = [np.arange(_l0 + i, _l0 + i + 1) for i in range(N - 2)]
_e0 = IDX_LAM[-1][-1] + 1
IDX_ETA = [np.arange(_e0 + 3 * i, _e0 + 3 * i + 3) for i in range(N - 2)]
NZ = IDX_ETA[-1][-1] + 1

Q0 = np.array(
    [-WHEEL_BASE / 2, 0.0, WHEEL_BASE / 2, 0.0, 0.0, np.sqrt(1.5**2 - (WHEEL_BASE / 2) ** 2)]
)
Q1 = Q0 + 11 * H * np.array([1, 0, 1, 0, 1, 0.0])
USREF = [-0.95 * np.sqrt(2) * 0.5 * M_BODY * 9.8 * np.ones(2) for _ in range(N - 1)]
QSREF = [Q0 + 11 * H * i * np.array([1, 0, 1, 0, 1, 0.0]) for i in range(N)]
W_Q1 = np.array([0, 1, 0, 1, 0, 0.1])
W_Q2 = np.array([0, 1, 0, 1, 0, 1e4])


def objective(z):
    J = 0.0
    for i in range(N):
        dq = z[IDX_Q[i]] - QSREF[i]
        w = W_Q2 if i > 5 else W_Q1
        J = J + 0.5 * dq @ (w * dq)
        q = z[IDX_Q[i]]
        J = J + 10.0 * (q[4] - 0.5 * (q[0] + q[2])) ** 2
    for i in range(N - 1):
        du = z[IDX_U[i]] - USREF[i]
        J = J + 0.5 * 0.01 * du @ du
        dq = z[IDX_Q[i]] - z[IDX_Q[i + 1]]
        J = J + 0.005 * dq @ dq
    for i in range(N - 2):
        a = (
            z[IDX_Q[i + 2]][np.array([0, 2, 4])]
            - 2 * z[IDX_Q[i + 1]][np.array([0, 2, 4])]
            + z[IDX_Q[i]][np.array([0, 2, 4])]
        )
        J = J + 10.0 * a @ a
    return J


def equality(z):
    rows = []
    for i in range(N - 2):
        rows.append(
            _dyn(
                z[IDX_Q[i]], z[IDX_Q[i + 1]], z[IDX_Q[i + 2]],
                z[IDX_LAM[i]], z[IDX_ETA[i]], z[IDX_U[i]], z[IDX_U[i + 1]],
            )
        )
    rows.append(z[IDX_Q[0]] - Q0)
    rows.append(z[IDX_Q[1]] - Q1)
    # jump constraint: both wheels clear the obstacle at step 5
    rows.append(z[IDX_Q[4]][np.array([1, 3])] - jnp.array([1.1, 1.15]))
    return jnp.concatenate(rows)


def inequality(z):
    rows = [z[IDX_ETA[i]] for i in range(N - 2)]
    rows += [gaps(z[IDX_Q[i]]) for i in range(N)]
    return jnp.concatenate(rows)


def initial_guess(seed=0):
    rng = np.random.default_rng(seed)
    z = 10.0 * np.ones(NZ)
    for i in range(N):
        z[IDX_Q[i]] = QSREF[i] + 1e-3 * np.abs(rng.normal(size=6))
    for i in range(N - 1):
        z[IDX_U[i]] = USREF[i] + 1e-3 * rng.normal(size=2)
    for i in range(N - 2):
        z[IDX_ETA[i]] = 9.8 * np.array([M_RIDER1, M_RIDER2, M_BODY])
    return z + 1e-3 * rng.normal(size=NZ)
