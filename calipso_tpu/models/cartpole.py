"""Cart-pole swing-up (reference test/examples/cartpole.jl,
examples/autotuning/cartpole.jl)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.trajopt.transcription import linear_interpolation


def continuous(x, u, mc=1.0, mp=0.2, pole_length=0.5, gravity=9.81):
    q2, qd = x[1], x[2:]
    s, c = jnp.sin(q2), jnp.cos(q2)
    H = jnp.array(
        [[mc + mp, mp * pole_length * c], [mp * pole_length * c, mp * pole_length**2]]
    )
    Cvec = jnp.array([-mp * qd[1] * pole_length * s * qd[1], 0.0])
    G = jnp.array([0.0, mp * gravity * pole_length * s])
    B = jnp.array([1.0, 0.0])
    qdd = jnp.linalg.solve(H, B * u[0] - Cvec - G)
    return jnp.concatenate([qd, qdd])


def discrete(y, x, u, h=0.05):
    return y - (x + h * continuous(0.5 * (x + y), u))


def swingup_problem(horizon=51, parametric_initial_state=False):
    x_init = jnp.array([0.0, 0.0, 0.0, 0.0])
    x_goal = jnp.array([0.0, np.pi, 0.0, 0.0])

    objective = [
        *[(lambda x, u, w: 0.1 * x @ x + 0.1 * u @ u)] * (horizon - 1),
        lambda x, u, w: 0.1 * x @ x,
    ]
    if parametric_initial_state:
        eq0 = lambda x, u, w: x - w
        parameters = [np.asarray(x_init)] + [np.zeros(0)] * (horizon - 1)
    else:
        eq0 = lambda x, u, w: x - x_init
        parameters = None
    equality = [eq0, *[None] * (horizon - 2), lambda x, u, w: x - x_goal]

    return dict(
        objective=objective,
        dynamics=[discrete] * (horizon - 1),
        num_states=[4] * horizon,
        num_actions=[1] * (horizon - 1),
        equality=equality,
        parameters=parameters,
        state_guess=linear_interpolation(x_init, x_goal, horizon),
        state_initial=x_init,
        state_goal=x_goal,
    )
