"""MPC auto-tuning chain: differentiable solve -> jax.grad of rollout loss
(reference test/autotuning.jl + examples/autotuning; the reference
validates its hand-written chain rule, here jax.grad through the
custom-VJP solve is validated against finite differences and the tuning
loop must reduce the rollout loss)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from calipso_tpu import TrajOptSolver, Options
from calipso_tpu.apps import autotuning


A = np.array([[1.0, 0.1], [0.0, 1.0]])
B = np.array([0.005, 0.1])
HORIZON_MPC = 5


def _mpc_solver():
    def dyn(y, x, u, w):
        return y - (jnp.asarray(A) @ x + jnp.asarray(B) * u[0])

    def stage_cost(x, u, w):
        return 0.5 * x @ (w[:2] * x) + 0.5 * w[2] * (u @ u)

    def final_cost(x, u, w):
        return 0.5 * x @ (w[:2] * x)

    T = HORIZON_MPC
    objective = [
        lambda x, u, w: 0.5 * x @ (w[:2] * x) + 0.5 * w[2] * (u @ u),
        *[stage_cost] * (T - 2),
        final_cost,
    ]
    equality = [lambda x, u, w: x - w[3:5], *[None] * (T - 1)]
    # stage 0: [q1, q2, r, x_meas]; stages 1..T-2: [q1, q2, r]; final: [qT]
    parameters = (
        [np.array([1.0, 1.0, 0.1, 0.0, 0.0])]
        + [np.array([1.0, 1.0, 0.1])] * (T - 2)
        + [np.array([10.0, 10.0])]
    )
    opts = Options(
        residual_tolerance=1e-8, equality_tolerance=1e-7, complementarity_tolerance=1e-7
    )
    return TrajOptSolver(
        objective,
        [dyn] * (T - 1),
        [2] * T,
        [1] * (T - 1),
        equality=equality,
        parameters=parameters,
        options=opts,
    )


def _theta_builder(weights, state):
    # weights = [q1, q2, r]; terminal weights fixed
    T = HORIZON_MPC
    return jnp.concatenate(
        [weights, state] + [weights] * (T - 2) + [jnp.array([10.0, 10.0])]
    )


def _policy():
    ts = _mpc_solver()
    return ts, autotuning.make_mpc_policy(
        ts,
        guess=np.zeros(ts.num_variables),
        theta_builder=_theta_builder,
        action_indices=ts._action_indices[0],
        num_weights=3,
    )


def test_gradient_matches_finite_difference():
    ts, pol = _policy()
    sim = lambda x, u: jnp.asarray(A) @ x + jnp.asarray(B) * u[0]
    loss = autotuning.rollout_loss(
        pol.policy,
        sim,
        horizon=8,
        state_cost=np.eye(2),
        action_cost=0.01 * np.eye(1),
        state_reference=np.zeros(2),
        action_reference=np.zeros(1),
    )
    w0 = jnp.array([1.0, 1.0, 0.1])
    x0 = jnp.array([1.0, 0.0])
    g = jax.jit(jax.grad(loss))(w0, x0)
    # finite differences through full rollouts
    jloss = jax.jit(loss)
    eps = 1e-5
    for i in range(3):
        wp = w0.at[i].add(eps)
        wm = w0.at[i].add(-eps)
        fd = (jloss(wp, x0) - jloss(wm, x0)) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 5e-3 * max(1.0, abs(float(fd))), (
            i,
            float(g[i]),
            float(fd),
        )


def test_cartpole_mpc_autotuning():
    """Cart-pole MPC auto-tuning (reference examples/autotuning/cartpole.jl):
    learn the MPC cost weights that stabilize the pole by gradient descent
    on a closed-loop rollout loss through the differentiable solver."""
    import pytest

    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import cartpole
    from calipso_tpu import Options as Opts

    T = 4  # MPC horizon (short: each policy eval is a full solve)
    nx, nu = 4, 1

    def stage_cost(x, u, w):
        return 0.5 * x @ (w[:4] * x) + 0.05 * (u @ u)

    def final_cost(x, u, w):
        return 0.5 * x @ (w[:4] * x)

    objective = [
        lambda x, u, w: 0.5 * x @ (w[:4] * x) + 0.05 * (u @ u),
        *[stage_cost] * (T - 2),
        final_cost,
    ]
    equality = [lambda x, u, w: x - w[4:8], *[None] * (T - 1)]
    parameters = (
        [np.concatenate([np.ones(4), np.zeros(4)])]
        + [np.ones(4)] * (T - 2)
        + [10.0 * np.ones(4)]
    )
    opts = Opts(residual_tolerance=1e-6, equality_tolerance=1e-6, complementarity_tolerance=1e-6)
    ts = TrajOptSolver(
        objective,
        [cartpole.discrete] * (T - 1),
        [nx] * T,
        [nu] * (T - 1),
        equality=equality,
        parameters=parameters,
        options=opts,
    )

    def theta_builder(weights, state):
        return jnp.concatenate(
            [weights, state] + [weights] * (T - 2) + [10.0 * jnp.ones(4)]
        )

    pol = autotuning.make_mpc_policy(
        ts,
        guess=np.zeros(ts.num_variables),
        theta_builder=theta_builder,
        action_indices=ts._action_indices[0],
        num_weights=4,
    )

    # simulate with the same discrete model solved explicitly
    def sim(x, u):
        # one Newton iteration of the implicit midpoint is enough at h=0.05
        y = x + 0.05 * cartpole.continuous(x, u)
        for _ in range(3):
            y = x + 0.05 * cartpole.continuous(0.5 * (x + y), u)
        return y

    # track the upright reference from a small perturbation
    xref = jnp.array([0.0, np.pi, 0.0, 0.0])
    loss = autotuning.rollout_loss(
        pol.policy,
        sim,
        horizon=5,
        state_cost=np.diag([1.0, 5.0, 0.1, 0.1]),
        action_cost=0.01 * np.eye(1),
        state_reference=xref,
        action_reference=np.zeros(1),
    )
    w0 = jnp.array([1.0, 1.0, 1.0, 1.0])
    x0 = jnp.array([0.1, np.pi - 0.2, 0.0, 0.0])
    w_tuned, history = autotuning.autotune(loss, w0, x0, max_iterations=3)
    assert history[-1] < history[0], history


@pytest.mark.slow
def test_acrobot_mpc_autotuning():
    """Acrobot MPC auto-tuning (reference examples/autotuning/acrobot.jl):
    the second half of the reference's auto-tuning pair."""
    import pytest

    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import acrobot
    from calipso_tpu import Options as Opts

    T = 4
    nx, nu = 4, 1

    def stage_cost(x, u, w):
        return 0.5 * x @ (w[:4] * x) + 0.05 * (u @ u)

    objective = [
        lambda x, u, w: 0.5 * x @ (w[:4] * x) + 0.05 * (u @ u),
        *[stage_cost] * (T - 2),
        lambda x, u, w: 0.5 * x @ (w[:4] * x),
    ]
    equality = [lambda x, u, w: x - w[4:8], *[None] * (T - 1)]
    parameters = (
        [np.concatenate([np.ones(4), np.zeros(4)])]
        + [np.ones(4)] * (T - 2)
        + [10.0 * np.ones(4)]
    )
    opts = Opts(residual_tolerance=1e-6, equality_tolerance=1e-6, complementarity_tolerance=1e-6)
    ts = TrajOptSolver(
        objective,
        [acrobot.discrete] * (T - 1),
        [nx] * T,
        [nu] * (T - 1),
        equality=equality,
        parameters=parameters,
        options=opts,
    )

    def theta_builder(weights, state):
        return jnp.concatenate(
            [weights, state] + [weights] * (T - 2) + [10.0 * jnp.ones(4)]
        )

    pol = autotuning.make_mpc_policy(
        ts,
        guess=np.zeros(ts.num_variables),
        theta_builder=theta_builder,
        action_indices=ts._action_indices[0],
        num_weights=4,
    )

    def sim(x, u):
        xm = x + 0.5 * 0.05 * acrobot.continuous(x, u)
        return x + 0.05 * acrobot.continuous(xm, u)

    xref = jnp.array([np.pi, 0.0, 0.0, 0.0])
    loss = autotuning.rollout_loss(
        pol.policy,
        sim,
        horizon=5,
        state_cost=np.diag([5.0, 1.0, 0.1, 0.1]),
        action_cost=0.01 * np.eye(1),
        state_reference=xref,
        action_reference=np.zeros(1),
    )
    w0 = jnp.array([1.0, 1.0, 1.0, 1.0])
    x0 = jnp.array([np.pi - 0.15, 0.1, 0.0, 0.0])
    w_tuned, history = autotuning.autotune(loss, w0, x0, max_iterations=3)
    assert history[-1] < history[0], history


def test_autotune_reduces_loss():
    ts, pol = _policy()
    sim = lambda x, u: jnp.asarray(A) @ x + jnp.asarray(B) * u[0]
    loss = autotuning.rollout_loss(
        pol.policy,
        sim,
        horizon=8,
        state_cost=np.eye(2),
        action_cost=0.01 * np.eye(1),
        state_reference=np.zeros(2),
        action_reference=np.zeros(1),
    )
    w0 = jnp.array([1.0, 1.0, 1.0])
    x0 = jnp.array([1.0, 0.0])
    w_tuned, history = autotuning.autotune(loss, w0, x0, max_iterations=4)
    assert history[-1] < history[0], history
