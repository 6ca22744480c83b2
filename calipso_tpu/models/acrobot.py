"""Acrobot swing-up (reference test/examples/acrobot.jl)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.trajopt.transcription import linear_interpolation

MASS1, INERTIA1, LENGTH1, LENGTHCOM1 = 1.0, 0.33, 1.0, 0.5
MASS2, INERTIA2, LENGTH2, LENGTHCOM2 = 1.0, 0.33, 1.0, 0.5
GRAVITY, FRICTION1, FRICTION2 = 9.81, 0.1, 0.1


def continuous(x, u):
    c2 = jnp.cos(x[1])
    a = INERTIA1 + INERTIA2 + MASS2 * LENGTH1**2 + 2.0 * MASS2 * LENGTH1 * LENGTHCOM2 * c2
    b = INERTIA2 + MASS2 * LENGTH1 * LENGTHCOM2 * c2
    c = INERTIA2
    Minv = jnp.array([[c, -b], [-b, a]]) / (a * c - b * b)

    tau = jnp.array(
        [
            -MASS1 * GRAVITY * LENGTHCOM1 * jnp.sin(x[0])
            - MASS2 * GRAVITY * (LENGTH1 * jnp.sin(x[0]) + LENGTHCOM2 * jnp.sin(x[0] + x[1])),
            -MASS2 * GRAVITY * LENGTHCOM2 * jnp.sin(x[0] + x[1]),
        ]
    )
    s2 = jnp.sin(x[1])
    C = jnp.array(
        [
            [-2.0 * MASS2 * LENGTH1 * LENGTHCOM2 * s2 * x[3], -MASS2 * LENGTH1 * LENGTHCOM2 * s2 * x[3]],
            [MASS2 * LENGTH1 * LENGTHCOM2 * s2 * x[2], 0.0],
        ]
    )
    B = jnp.array([0.0, 1.0])
    v = x[2:]
    qdd = Minv @ (-C @ v + tau + B * u[0] - jnp.array([FRICTION1, FRICTION2]) * v)
    return jnp.concatenate([v, qdd])


def discrete(y, x, u, h=0.05):
    """Explicit midpoint (reference acrobot.jl: acrobot_discrete)."""
    xm = x + 0.5 * h * continuous(x, u)
    return y - (x + h * continuous(xm, u))


def swingup_problem(horizon=51):
    x_init = jnp.array([0.0, 0.0, 0.0, 0.0])
    x_goal = jnp.array([np.pi, 0.0, 0.0, 0.0])
    objective = [
        *[(lambda x, u, w: 0.1 * x[2:] @ x[2:] + 0.1 * u @ u)] * (horizon - 1),
        lambda x, u, w: 0.1 * x[2:] @ x[2:],
    ]
    equality = [
        lambda x, u, w: x - x_init,
        *[None] * (horizon - 2),
        lambda x, u, w: x - x_goal,
    ]
    return dict(
        objective=objective,
        dynamics=[discrete] * (horizon - 1),
        num_states=[4] * horizon,
        num_actions=[1] * (horizon - 1),
        equality=equality,
        state_guess=linear_interpolation(x_init, x_goal, horizon),
        state_initial=x_init,
        state_goal=x_goal,
    )
