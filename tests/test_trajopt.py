"""Tier-3 end-to-end trajopt tests (reference test/examples/pendulum.jl,
cartpole.jl): swing-ups through the stagewise front-end."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import TrajOptSolver, linear_interpolation

from tests.test_solver_nlp import assert_contract


def test_pendulum_swingup():
    horizon = 11
    num_states = [2] * horizon
    num_actions = [1] * (horizon - 1)

    def pendulum_continuous(x, u):
        mass, length_com, gravity, damping = 1.0, 0.5, 9.81, 0.1
        return jnp.array(
            [
                x[1],
                u[0] / (mass * length_com**2)
                - gravity * jnp.sin(x[0]) / length_com
                - damping * x[1] / (mass * length_com**2),
            ]
        )

    def pendulum_discrete(y, x, u):
        h = 0.05
        return y - (x + h * pendulum_continuous(0.5 * (x + y), u))

    state_initial = jnp.array([0.0, 0.0])
    state_goal = jnp.array([jnp.pi, 0.0])

    objective = [
        *[(lambda x, u: 0.1 * x @ x + 0.1 * u @ u) for _ in range(horizon - 1)],
        lambda x, u: 0.1 * x @ x,
    ]
    equality = [
        lambda x, u: x - state_initial,
        *[None] * (horizon - 2),
        lambda x, u: x - state_goal,
    ]

    solver = TrajOptSolver(
        objective,
        [pendulum_discrete] * (horizon - 1),
        num_states,
        num_actions,
        equality=equality,
    )

    rng = np.random.default_rng(0)
    solver.initialize_states(linear_interpolation(state_initial, state_goal, horizon))
    solver.initialize_actions([rng.normal(size=1) for _ in range(horizon - 1)])

    res = solver.solve()
    assert_contract(res)
    states, actions = solver.get_trajectory(res)
    np.testing.assert_allclose(states[0], np.asarray(state_initial), atol=1e-4)
    np.testing.assert_allclose(states[-1], np.asarray(state_goal), atol=1e-4)


def test_cartpole_swingup():
    # reference test/examples/cartpole.jl (implicit midpoint, T=51; shortened
    # horizon here for test wall-clock, full version exercised in bench)
    horizon = 26
    nx, nu = 4, 1

    def cartpole_continuous(x, u):
        mc, mp, l, g = 1.0, 0.2, 0.5, 9.81
        q2 = x[1]
        qd = x[2:]
        s, c = jnp.sin(q2), jnp.cos(q2)
        H = jnp.array([[mc + mp, mp * l * c], [mp * l * c, mp * l**2]])
        Cvec = jnp.array([-mp * qd[1] * l * s * qd[1], 0.0])
        G = jnp.array([0.0, mp * g * l * s])
        B = jnp.array([1.0, 0.0])
        qdd = jnp.linalg.solve(H, B * u[0] - Cvec - G)
        return jnp.concatenate([qd, qdd])

    def midpoint(y, x, u):
        h = 0.05
        return y - (x + h * cartpole_continuous(0.5 * (x + y), u))

    x_init = jnp.array([0.0, 0.0, 0.0, 0.0])
    x_goal = jnp.array([0.0, jnp.pi, 0.0, 0.0])

    objective = [
        *[(lambda x, u: 0.1 * x @ x + 0.1 * u @ u) for _ in range(horizon - 1)],
        lambda x, u: 0.1 * x @ x,
    ]
    equality = [
        lambda x, u: x - x_init,
        *[None] * (horizon - 2),
        lambda x, u: x - x_goal,
    ]

    solver = TrajOptSolver(
        objective,
        [midpoint] * (horizon - 1),
        [nx] * horizon,
        [nu] * (horizon - 1),
        equality=equality,
    )
    rng = np.random.default_rng(1)
    solver.initialize_states(linear_interpolation(x_init, x_goal, horizon))
    solver.initialize_actions([0.01 * rng.normal(size=nu) for _ in range(horizon - 1)])

    res = solver.solve()
    assert_contract(res)
    states, _ = solver.get_trajectory(res)
    np.testing.assert_allclose(states[-1], np.asarray(x_goal), atol=1e-4)
