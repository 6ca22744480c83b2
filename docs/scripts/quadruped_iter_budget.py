"""Per-term budget of the batched-quadruped lockstep iteration
(docs/performance.md "Batched quadruped", round-4 verdict next-round #2):
measures each component of the inner Newton iteration IN ISOLATION
(vmapped over the same B, marginal-K chains, same methodology as
bench.py) so the budget sums against the end-to-end per-iteration cost
and the "spread across the loop" remainder becomes a measured number.
Run on the TPU:

    python docs/scripts/quadruped_iter_budget.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench
from calipso_tpu import TrajOptSolver
from calipso_tpu.models import quadruped
from calipso_tpu.ops import cones
from calipso_tpu.solver import kkt

B = int(os.environ.get("QB_BATCH", "128"))


def marginal(make_fn, args, K1, K2, reps=4):
    f1, f2 = make_fn(K1), make_fn(K2)
    bench.force(f1(*args))
    bench.force(f2(*args))
    t1s, t2s = [], []
    for rep in range(reps):
        a0 = args[0] + 1e-6 * (rep + 1)
        t0 = time.time()
        bench.force(f1(a0, *args[1:]))
        t1 = time.time() - t0
        t0 = time.time()
        bench.force(f2(a0 + 1e-7, *args[1:]))
        t2 = time.time() - t0
        if rep:
            t1s.append(t1)
            t2s.append(t2)
    return max((statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1), 1e-12)


def chain(fn, K, x, *rest):
    """K dependent applications of fn, perturbing x by a 1-element
    function of the previous output (serialized, cache-proof)."""

    def body(i, c):
        xc, _ = c
        out = fn(xc, *rest)
        probe = jax.tree_util.tree_leaves(out)[0]
        xc = xc.at[(0,) * xc.ndim].add(1e-16 * probe.reshape(-1)[0])
        return (xc, out)

    out0 = fn(x, *rest)
    outs = lax.fori_loop(0, K, body, (x, out0))[1]
    # reduce to one scalar so bench.force works on any output pytree
    return sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(outs)
    )


def main():
    prob = quadruped.mpc_problem(horizon=8)
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "state_goal", "action_guess")
    }
    ts = TrajOptSolver(options=bench._tol_options(max_iterative_refinement=2), **kw)
    ts.initialize_states([np.asarray(s, np.float32) for s in prob["state_guess"]])
    ts.initialize_actions([np.asarray(a, np.float32) for a in prob["action_guess"]])
    solver = ts.solver
    fns, layout = solver.fns, solver.layout
    from calipso_tpu.solver.solve import resolve_options

    opts = resolve_options(solver.options, fns)
    st = fns.stage_structure
    dims = fns.dims
    n, me, mc = dims.variables, dims.equality, dims.cone

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.tile(np.asarray(ts._guess, np.float32)[None], (B, 1))
        + 0.01 * rng.normal(size=(B, n)).astype(np.float32)
    )
    th0 = np.asarray(prob["state_initial"], np.float32)
    theta = jnp.asarray(np.tile(th0[None], (B, 1)), jnp.float32)
    y = jnp.asarray(0.1 * rng.normal(size=(B, me)).astype(np.float32))
    z = jnp.asarray(0.1 * rng.normal(size=(B, mc)).astype(np.float32))
    s_ = jnp.tile(layout.initialize(jnp.float32)[None], (B, 1))
    t_ = jnp.tile(layout.initialize(jnp.float32)[None], (B, 1))
    rho = jnp.asarray(1.0, jnp.float32)
    ep = jnp.asarray(1e-7, jnp.float32)
    ed = jnp.asarray(1e-7, jnp.float32)

    out = {}

    def timed(tag, one_lane_fn, K1, K2, *rest):
        """vmap one_lane_fn over B, marginal-K chain, record ms/call."""

        def mk(K):
            f = jax.vmap(lambda xi, *r: one_lane_fn(xi, *r))

            def g(xb, *r):
                return chain(lambda xc, *rr: f(xc, *rr), K, xb, *r)

            return jax.jit(g)

        with jax.default_matmul_precision(opts.matmul_precision):
            dt = marginal(mk, (x,) + tuple(rest), K1, K2)
        out[tag + "_ms"] = round(dt * 1e3, 2)
        return dt

    # 1. second-derivative oracle (band Hessian blocks)
    timed(
        "oracle_hessian",
        lambda xi, yi, zi: fns.lagrangian_hessian_blocks(xi, theta[0], yi, zi, True)[:2],
        2, 22, y, z,
    )
    # 2. constraint Jacobians (dense gx + hx build)
    timed("oracle_jacobians", lambda xi: (fns.gx(xi, theta[0]), fns.hx(xi, theta[0])), 2, 22)
    # 3. residual evaluation (first derivatives + constraint values)
    timed(
        "residual_eval",
        lambda xi, yi, zi: (
            fns.fx(xi, theta[0]),
            fns.gty_x(xi, theta[0], yi),
            fns.htz_x(xi, theta[0], zi),
            fns.g(xi, theta[0]),
            fns.h(xi, theta[0]),
        ),
        2, 22, y, z,
    )

    # shared per-lane pieces for the KKT stages
    def build_fact(xi, yi, zi, si, ti):
        D, O, Hgen = fns.lagrangian_hessian_blocks(xi, theta[0], yi, zi, True)
        Hxx = kkt.BandHessian(D, O, Hgen, st)
        gxi = fns.gx(xi, theta[0])
        hxi = fns.hx(xi, theta[0])
        return Hxx, gxi, hxi

    # 4. factorization (riccati blocks assembly + Pallas factor + inertia)
    def fact_one(xi, yi, zi, si, ti):
        Hxx, gxi, hxi = build_fact(xi, yi, zi, si, ti)
        fact = kkt.factorize(
            layout, Hxx, gxi, hxi, si, ti, rho, ep, ed, "riccati", st
        )
        ok = kkt.inertia_ok(fact, n, me, mc, "riccati", st)
        nz = kkt.num_zero_eigs(fact, "riccati", st)
        return fact.L, fact.M, ok, nz

    timed("factorize_inertia", fact_one, 2, 12, y, z, s_, t_)

    # 5. one condensed solve (condense + banded solve + expand), plus
    # 6. one refinement error matvec -- measured through a prebuilt factor
    def prep(xi, yi, zi, si, ti):
        # BandHessian carries a static (non-array) StageStructure, so it
        # cannot cross the jit boundary: return the block arrays instead
        D, O, _Hgen = fns.lagrangian_hessian_blocks(xi, theta[0], yi, zi, True)
        Hxx = kkt.BandHessian(D, O, None, st)
        gxi = fns.gx(xi, theta[0])
        hxi = fns.hx(xi, theta[0])
        fact = kkt.factorize(layout, Hxx, gxi, hxi, si, ti, rho, ep, ed, "riccati", st)
        res = kkt.Blocks(
            xi * 0.1,
            jnp.zeros((me,), xi.dtype).at[:].set(0.1),
            si * 0.1,
            yi * 0.5,
            zi * 0.5,
            ti * 0.1,
        )
        return D, O, fact, res

    D_b, O_b, fact_b, res_b = jax.jit(jax.vmap(prep))(x, y, z, s_, t_)

    def solve_one(resx, Db, Ob, fact, res):
        res = res._replace(x=resx)
        step = kkt.solve_with(layout, fact, res, n, me, mc, "riccati", st)
        return step.x

    def mk_solve(K):
        f = jax.vmap(solve_one)

        def g(rx, *rr):
            return chain(lambda rc, *r2: f(rc, *r2), K, rx, *rr)

        return jax.jit(g)

    with jax.default_matmul_precision(opts.matmul_precision):
        dt = marginal(mk_solve, (res_b.x, D_b, O_b, fact_b, res_b), 2, 22)
    out["solve_with_ms"] = round(dt * 1e3, 2)

    def mv_one(resx, Db, Ob, fact, res):
        d = res._replace(x=resx)
        Hxx = kkt.BandHessian(Db, Ob, None, st)
        mv = kkt.matvec(
            layout, Hxx, fact.gx, fact.hx, fact.s, fact.t, fact.rho,
            fact.eps_p, fact.eps_d, d,
        )
        return mv.x

    def mk_mv(K):
        f = jax.vmap(mv_one)

        def g(rx, *rr):
            return chain(lambda rc, *r2: f(rc, *r2), K, rx, *rr)

        return jax.jit(g)

    with jax.default_matmul_precision(opts.matmul_precision):
        dt = marginal(mk_mv, (res_b.x, D_b, O_b, fact_b, res_b), 4, 44)
    out["refine_matvec_ms"] = round(dt * 1e3, 2)

    # 7. one W=8 line-search chunk: merit + violation at 8 candidates
    W = 8

    def cand_chunk(xi, si):
        alphas = 1.0 - 0.5 ** jnp.arange(1, W + 1, dtype=xi.dtype)

        def cand(a):
            xh = xi * (1.0 - 0.001 * a)
            sh = si * (1.0 - 0.001 * a)
            fh = fns.f(xh, theta[0])
            gh = fns.g(xh, theta[0])
            hh = fns.h(xh, theta[0])
            bh = cones.barrier(layout, sh)
            return fh + bh, jnp.sum(jnp.abs(gh)) + jnp.sum(jnp.abs(hh))

        return jax.vmap(cand)(alphas)

    timed("line_search_chunk_w8", cand_chunk, 2, 22, s_)

    # 8. cone fraction-to-the-boundary search (26 candidates x 2)
    def ftb(si, ti):
        alphas = 0.5 ** jnp.arange(26, dtype=si.dtype)
        v1 = jax.vmap(lambda a: cones.violation(layout, si - a * si * 0.01, si, 0.99))(alphas)
        v2 = jax.vmap(lambda a: cones.violation(layout, ti - a * ti * 0.01, ti, 0.99))(alphas)
        return v1, v2

    timed("ftb_search_2x", lambda xi, si, ti: ftb(si, ti), 4, 44, s_, t_)

    # context: what one end-to-end lockstep iteration costs (bench child)
    out["note"] = (
        "sum the terms x their per-iteration multiplicities (factorize x1, "
        "solve_with x(1 + refinement trips), matvec x(trips + 1), chunk x~1) "
        "against quadruped_per_batch_wall_s / lockstep iterations"
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
