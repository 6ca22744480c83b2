"""Pendulum swing-up (reference test/examples/pendulum.jl)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.trajopt.transcription import linear_interpolation


def continuous(x, u, mass=1.0, length_com=0.5, gravity=9.81, damping=0.1):
    ml2 = mass * length_com * length_com
    return jnp.array(
        [
            x[1],
            u[0] / ml2 - gravity * jnp.sin(x[0]) / length_com - damping * x[1] / ml2,
        ]
    )


def discrete(y, x, u, h=0.05):
    """Implicit midpoint: y - (x + h f((x+y)/2, u)) = 0."""
    return y - (x + h * continuous(0.5 * (x + y), u))


def swingup_problem(horizon=11, parametric_initial_state=False):
    """Swing-up from hanging to upright. With parametric_initial_state the
    stage-0 equality reads the initial state from the stage parameter so a
    single compiled program serves scenario batches."""
    x_init = jnp.array([0.0, 0.0])
    x_goal = jnp.array([np.pi, 0.0])

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
        num_states=[2] * horizon,
        num_actions=[1] * (horizon - 1),
        equality=equality,
        parameters=parameters,
        state_guess=linear_interpolation(x_init, x_goal, horizon),
        state_initial=x_init,
        state_goal=x_goal,
    )
