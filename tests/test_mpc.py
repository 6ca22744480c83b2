"""Receding-horizon MPC app: warmstarted closed-loop rollout
(calipso_tpu.apps.mpc). The warmstart mechanism is the reference's
Options.warmstart (solve.jl:10-13), which its MPC examples rely on."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu import TrajOptSolver, Options
from calipso_tpu.apps.mpc import make_mpc_controller, mpc_rollout


def _pendulum_mpc(horizon=11, mode="serial"):
    def pend_c(x, u):
        return jnp.array(
            [x[1], u[0] / 0.25 - 9.81 * jnp.sin(x[0]) / 0.5 - 0.1 * x[1] / 0.25]
        )

    def pend_d(y, x, u):
        return y - (x + 0.05 * pend_c(0.5 * (x + y), u))

    xg = jnp.array([np.pi, 0.0])
    objective = [
        *[(lambda x, u, w: (x - xg) @ (x - xg) + 0.01 * u @ u)] * (horizon - 1),
        lambda x, u, w: 10.0 * (x - xg) @ (x - xg),
    ]
    equality = [lambda x, u, w: x - w, *[None] * (horizon - 1)]
    ts = TrajOptSolver(
        objective,
        [pend_d] * (horizon - 1),
        [2] * horizon,
        [1] * (horizon - 1),
        equality=equality,
        parameters=[np.zeros(2)] + [np.zeros(0)] * (horizon - 1),
        options=Options(line_search_mode=mode),
    )
    guess = np.zeros(ts.num_variables)
    for t, idx in enumerate(ts._state_indices):
        guess[idx] = np.asarray(xg) * t / (horizon - 1)

    def simulate(x, u):  # the "real" plant: same midpoint integrator
        return x + 0.05 * pend_c(0.5 * (2 * x + 0.05 * pend_c(x, u)), u)

    return ts, guess, simulate, xg


def test_mpc_rollout_regulates_to_goal():
    ts, guess, simulate, xg = _pendulum_mpc()
    ctrl = make_mpc_controller(ts, guess, lambda x: x)
    x0 = jnp.array([np.pi - 0.4, 0.3])  # disturbance near upright
    out = mpc_rollout(ctrl, simulate, x0, num_steps=100)

    assert bool(jnp.all(out.solved)), "every MPC solve must converge"
    final = np.asarray(out.states[-1])
    assert abs(final[0] - np.pi) < 0.01 and abs(final[1]) < 0.02, final
    assert out.states.shape == (100, 2) and out.actions.shape == (100, 1)

    # warmstarted steps should be cheaper than the cold start
    iters = np.asarray(out.iterations)
    assert iters[1:].mean() <= iters[0], iters[:8]


def test_mpc_warmstart_beats_cold():
    ts, guess, simulate, xg = _pendulum_mpc()
    warm_ctrl = make_mpc_controller(ts, guess, lambda x: x, warmstart=True)
    cold_ctrl = make_mpc_controller(ts, guess, lambda x: x, warmstart=False)
    x0 = jnp.array([np.pi - 0.3, 0.0])
    out_w = mpc_rollout(warm_ctrl, simulate, x0, num_steps=15)
    out_c = mpc_rollout(cold_ctrl, simulate, x0, num_steps=15)
    assert bool(jnp.all(out_w.solved)) and bool(jnp.all(out_c.solved))
    # identical first (cold) step, cheaper warm steps on average
    iw, ic = np.asarray(out_w.iterations), np.asarray(out_c.iterations)
    assert iw[0] == ic[0]
    assert iw[1:].mean() < ic[1:].mean(), (iw, ic)
