"""Differentiable solve: w*(theta) with custom VJP/JVP from the implicit
function theorem.

The reference exposes raw sensitivities (`solution_sensitivity`) that
applications chain by hand (reference examples/autotuning/autotuning.jl:
38-122 builds policy Jacobians manually). Here the solve itself is a
differentiable JAX primitive: `jax.grad` through any function of the
solution triggers the implicit-diff backward pass, so MPC auto-tuning is
literally `jax.grad(rollout_loss)` -- and it vmaps/shards like everything
else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calipso_tpu.solver.solve import make_solve, resolve_options
from calipso_tpu.solver import differentiate


def make_differentiable_solve(fns, layout, opts):
    """Returns solve_w(theta, x0) -> flat primal-dual solution w* (total,),
    differentiable in theta via the KKT implicit function theorem. x0 (the
    initial guess) gets zero cotangent: at a regular solution w* does not
    depend on the starting point."""
    opts = resolve_options(opts, fns)
    core = make_solve(fns, layout, opts)
    total = fns.dims.total

    def _solve_state(theta, x0):
        return core(x0, theta, None)

    @jax.custom_vjp
    def solve_w(theta, x0):
        st = _solve_state(theta, x0)
        return st.p.all

    def fwd(theta, x0):
        st = _solve_state(theta, x0)
        sens = differentiate.solution_sensitivity(fns, layout, opts, st, theta)
        return st.p.all, (sens,)

    def bwd(res, wbar):
        (sens,) = res
        theta_bar = sens.T @ wbar
        x0_bar = jnp.zeros((fns.dims.variables,), wbar.dtype)
        return (theta_bar, x0_bar)

    solve_w.defvjp(fwd, bwd)
    return solve_w
