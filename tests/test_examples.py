"""Tier-3 end-to-end example tests from the model zoo (reference
test/examples/{acrobot,rocket_landing,double_integrator}.jl)."""

import numpy as np
import jax
import jax.numpy as jnp

from calipso_tpu import TrajOptSolver, Options
from calipso_tpu.models import acrobot, rocket, double_integrator

from tests.test_solver_nlp import assert_contract


def _build(problem, options=Options(), actions_scale=0.0, seed=0):
    kw = {
        k: v
        for k, v in problem.items()
        if k not in ("state_guess", "state_initial", "state_goal")
    }
    ts = TrajOptSolver(options=options, **kw)
    ts.initialize_states(problem["state_guess"])
    rng = np.random.default_rng(seed)
    T = len(problem["num_states"])
    ts.initialize_actions(
        [actions_scale * rng.normal(size=n) for n in problem["num_actions"]]
    )
    return ts


def test_acrobot_swingup():
    # shortened horizon (reference uses 51) to bound test wall-clock
    prob = acrobot.swingup_problem(horizon=21)
    ts = _build(prob, actions_scale=1.0)
    res = ts.solve()
    assert_contract(res)
    states, _ = ts.get_trajectory(res)
    np.testing.assert_allclose(states[-1], np.asarray(prob["state_goal"]), atol=1e-4)


def test_rocket_landing_soc():
    prob = rocket.landing_problem(horizon=31)
    ts = _build(prob, actions_scale=1e-3)
    res = ts.solve()
    assert_contract(res)
    states, actions = ts.get_trajectory(res)
    # thrust stays in the SOC: |u_xy| < u_z (reference rocket_landing.jl:82)
    for u in actions:
        assert np.linalg.norm(u[:2]) < u[2] + 1e-8
    np.testing.assert_allclose(states[-1], np.zeros(6), atol=1e-4)


def test_double_integrator_differentiation():
    """Milestone B contract (reference double_integrator.jl:116-164): the
    solver's solution sensitivity matches a dense implicit-function oracle
    built from the trajopt Lagrangian via autodiff."""
    horizon = 5
    prob = double_integrator.problem(horizon=horizon)
    opts = Options(
        residual_tolerance=1e-12,
        equality_tolerance=1e-8,
        complementarity_tolerance=1e-8,
        differentiate=True,
    )
    ts = _build(prob, options=opts, actions_scale=1.0)
    res = ts.solve()
    st = res.state
    assert bool(st.solved)
    assert float(st.equality_violation) <= 1e-8

    # dense oracle: z = (variables, equality duals); solve Lzz dz = -Lztheta
    fns = ts.solver.fns
    theta = jnp.asarray(np.concatenate([np.asarray(p) for p in prob["parameters"]]))
    nvar, ne = fns.dims.variables, fns.dims.equality

    def lagrangian(z, th):
        x, y = z[:nvar], z[nvar:]
        return fns.f(x, th) + fns.g(x, th) @ y

    zstar = jnp.concatenate([res.state.p.x, res.state.p.y])
    Lzz = jax.jit(jax.hessian(lagrangian))(zstar, theta)
    Lzt = jax.jit(jax.jacfwd(jax.grad(lagrangian), argnums=1))(zstar, theta)
    want = -np.linalg.solve(np.asarray(Lzz), np.asarray(Lzt))

    sens = np.asarray(res.sensitivity)
    np.testing.assert_allclose(sens[:nvar], want[:nvar], atol=1e-3)
