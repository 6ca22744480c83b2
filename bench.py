"""Benchmark: batched trajopt solves/s on the current accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

All problems run at the reference acceptance contract (1e-4 tolerances,
reference src/solver/options.jl:25-29 + test/solver/wachter.jl:35-46).

vs_baseline is MEASURED fresh each run (BASELINE.md requirement): a
subprocess solves the same pendulum family sequentially, one problem at a
time, on the host CPU in f64 -- the reference solver's operating mode
(single-process CPU, SURVEY.md section 2.4; Julia is not in this image, so
the repo's own CPU path is the documented proxy). vs_baseline =
batched-accelerator solves/s / sequential-CPU solves/s.

MFU: the per-iteration KKT factorization flops are computed analytically
(block-tridiagonal Cholesky: ~8/3 * d^3 flops/stage/lane) and divided by
the chip's peak; for stage dims this small the batch is VPU/HBM-bound,
not MXU-bound, so the MFU is reported as a roofline statement, not a
target (see README).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# B=2048 is the measured throughput sweet spot on one v5e chip (solves/s
# keeps rising 256 -> 2048 and flattens after; see README benchmark table)
BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
HORIZON = int(os.environ.get("BENCH_HORIZON", "11"))
TOL = float(os.environ.get("BENCH_TOL", "1e-4"))

# bf16 MXU peak per chip; MFU is conventionally stated against this
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}


def _tol_options(**kw):
    from calipso_tpu import Options

    return Options(
        residual_tolerance=TOL,
        optimality_tolerance=TOL,
        slack_tolerance=TOL,
        equality_tolerance=TOL,
        complementarity_tolerance=TOL,
        iterative_refinement_tolerance=1e-6,
        **kw,
    )


def _pendulum_family(H):
    def pend_c(x, u):
        return jnp.array(
            [x[1], u[0] / 0.25 - 9.81 * jnp.sin(x[0]) / 0.5 - 0.1 * x[1] / 0.25]
        )

    def pend_d(y, x, u):
        return y - (x + 0.05 * pend_c(0.5 * (x + y), u))

    xg = jnp.array([np.pi, 0.0])
    objective = [
        *[(lambda x, u, w: 0.1 * x @ x + 0.1 * u @ u)] * (H - 1),
        lambda x, u, w: 0.1 * x @ x,
    ]
    equality = [
        lambda x, u, w: x - w,  # initial state is the scenario parameter
        *[None] * (H - 2),
        lambda x, u, w: x - xg,
    ]
    return objective, pend_d, equality, xg


def build():
    from calipso_tpu import TrajOptSolver

    H = HORIZON
    objective, pend_d, equality, xg = _pendulum_family(H)
    ts = TrajOptSolver(
        objective,
        [pend_d] * (H - 1),
        [2] * H,
        [1] * (H - 1),
        equality=equality,
        parameters=[np.zeros(2)] + [np.zeros(0)] * (H - 1),
        options=_tol_options(),
    )
    # shared swing-up guess, scenario-specific initial state
    ts.initialize_states([np.asarray(xg) * t / (H - 1) for t in range(H)])
    bts = ts.batched()
    stage_dims = [nx + nu for nx, nu in zip(ts.num_states, ts.num_actions)]
    return bts, stage_dims


_BASELINE_SNIPPET = r"""
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import bench
bench.TOL = {tol}
from calipso_tpu import TrajOptSolver
H = {horizon}
objective, pend_d, equality, xg = bench._pendulum_family(H)
ts = TrajOptSolver(objective, [pend_d] * (H - 1), [2] * H, [1] * (H - 1),
                   equality=equality,
                   parameters=[np.zeros(2)] + [np.zeros(0)] * (H - 1),
                   options=bench._tol_options())
ts.initialize_states([np.asarray(xg) * t / (H - 1) for t in range(H)])
rng = np.random.default_rng(0)
x0s = 0.2 * rng.normal(size=({k} + 1, 2))
r = ts.solve(parameters=jnp.asarray(x0s[0]))  # compile
jax.block_until_ready(r.state.p.x)
solved, t0 = 0, time.time()
for i in range(1, {k} + 1):
    r = ts.solve(parameters=jnp.asarray(x0s[i]))
    jax.block_until_ready(r.state.p.x)
    solved += int(r.solved)
dt = time.time() - t0
print(json.dumps({{"cpu_sequential_solves_per_s": {k} / dt,
                   "cpu_sequential_solved": solved, "cpu_k": {k}}}))
"""


def measure_cpu_baseline(k=16):
    """Sequential one-at-a-time CPU f64 solves of the same problem family
    in a subprocess (fresh measurement; see module docstring)."""
    code = _BASELINE_SNIPPET.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        horizon=HORIZON,
        tol=TOL,
        k=k,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def bench_rocket101():
    """Single rocket SOC landing T=101 (the reference's full-size trajopt,
    903 vars + 100 SOCs) on the cyclic-reduction backend, f32 (cr beats the
    Riccati sweep 1.5x at T=101 and 2x at T=301 for single solves on a
    v5e; riccati stays the batched-vmap winner)."""
    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import rocket

    prob = rocket.landing_problem(horizon=101)
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "state_goal")
    }
    # two refinement trips fully absorb the f32 CR solve error at this
    # tolerance (identical iteration count and final residual as the
    # default cap of 10; ~25% faster end to end)
    opts = _tol_options(max_iterative_refinement=2, linear_solver="cr")
    ts = TrajOptSolver(options=opts, **kw)
    guess = np.zeros(ts.num_variables, dtype=np.float32)
    for t, idx in enumerate(ts._state_indices):
        guess[idx] = np.asarray(prob["state_guess"][t])
    rng = np.random.default_rng(0)
    for t, idx in enumerate(ts._action_indices):
        guess[idx] = 1e-3 * rng.normal(size=3)
    ts.initialize_states([guess[i] for i in ts._state_indices])
    ts.solver.initialize(jnp.asarray(guess, jnp.float32))

    t0 = time.time()
    r = ts.solve()
    jax.block_until_ready(r.state.p.x)
    compile_s = time.time() - t0
    reps = 2
    t0 = time.time()
    for _ in range(reps):
        r = ts.solve()
        jax.block_until_ready(r.state.p.x)
    dt = (time.time() - t0) / reps
    return {
        "rocket101_solved": bool(r.solved),
        "rocket101_iterations": int(r.iterations),
        "rocket101_solve_s": round(dt, 3),
        "rocket101_compile_s": round(compile_s, 1),
        "rocket101_backend": ts.solver.options.linear_solver,
    }


def bench_hopper_gait():
    """Contact-implicit hopper gait T=21 (SOC friction, impact
    complementarity, gait periodicity + travel through equality_general on
    the riccati low-rank border) -- the reference's hardest-in-CI example
    family (test/examples/hopper_gait.jl), single solve, f32."""
    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import hopper

    prob = hopper.gait_problem()
    kw = {
        k: v
        for k, v in prob.items()
        if k
        not in ("state_guess", "state_initial", "state_goal", "action_guess", "penalty_initial")
    }
    # per-problem option tuning (the reference's examples tune options the
    # same way): a shorter first central-path leg suits this contact
    # problem (54 vs 81 iterations measured at 1e-4 on a v5e), and two
    # refinement trips absorb the f32 error like the rocket bench
    ts = TrajOptSolver(
        options=_tol_options(central_path_initial=0.1, max_iterative_refinement=2),
        **kw,
    )
    ts.initialize_states([np.asarray(s, np.float32) for s in prob["state_guess"]])
    if "action_guess" in prob:
        ts.initialize_actions([np.asarray(a, np.float32) for a in prob["action_guess"]])
    r = ts.solve()
    jax.block_until_ready(r.state.p.x)
    t0 = time.time()
    r = ts.solve()
    jax.block_until_ready(r.state.p.x)
    dt = time.time() - t0
    return {
        "hopper_gait_solved": bool(r.solved),
        "hopper_gait_iterations": int(r.iterations),
        "hopper_gait_solve_s": round(dt, 3),
        "hopper_gait_backend": ts.solver.options.linear_solver,
    }


def main():
    bts, stage_dims = build()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.2 * rng.normal(size=(BATCH, 2)), jnp.float32)

    # warmup / compile (compile_s includes tracing; trace_s isolates the
    # Python/jaxpr part, measured COLD on a freshly built solver so the
    # jaxpr cache from the warmup call cannot hide it -- the rest is the
    # XLA TPU compiler, which the on-by-default persistent compilation
    # cache absorbs across processes)
    t0 = time.time()
    res = bts.solve(parameters=x0s)
    jax.block_until_ready(res.state.p.x)
    compile_s = time.time() - t0
    bts_cold, _ = build()
    guess_b = jnp.broadcast_to(
        jnp.asarray(bts._ts._guess, x0s.dtype), (BATCH, int(np.size(bts._ts._guess)))
    )
    t0 = time.time()
    bts_cold._batched.lower(guess_b, x0s)
    trace_s = time.time() - t0

    reps = 2
    t0 = time.time()
    for r in range(reps):
        x0s_r = jnp.asarray(0.2 * rng.normal(size=(BATCH, 2)), jnp.float32)
        res = bts.solve(parameters=x0s_r)
        jax.block_until_ready(res.state.p.x)
    dt = (time.time() - t0) / reps

    solves_per_s = BATCH / dt

    # iteration stats describe the LAST TIMED batch (same solves as dt);
    # lockstep waste is computed over solved lanes only so early failures
    # cannot inflate it (n_failed reported alongside)
    solved_mask = np.asarray(res.state.solved)
    total_i = np.asarray(res.state.total_i)
    n_solved = int(solved_mask.sum())
    n_failed = int(BATCH - n_solved)
    iters = int(total_i.sum())
    iters_max = int(total_i[solved_mask].max()) if n_solved else 0
    iters_solved = int(total_i[solved_mask].sum()) if n_solved else 0

    # analytic KKT-factorization flop rate + MFU (lower bound: one
    # factorization per inner iteration; the inertia ladder re-factorizes
    # on regularization bumps, which are not counted)
    fact_flops_per_lane = sum((8.0 / 3.0) * d**3 for d in stage_dims)
    kkt_flops_per_s = iters / dt * fact_flops_per_lane
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    extra = {
        "solved": n_solved,
        "failed": n_failed,
        "batch": BATCH,
        "tolerance": TOL,
        "total_inner_iterations": iters,
        # lockstep occupancy: vmapped lanes run masked no-ops until the
        # slowest lane finishes; waste = 1 - mean/max iterations over the
        # solved lanes of the timed batch
        "iterations_max": iters_max,
        "lockstep_waste": round(1.0 - iters_solved / (n_solved * iters_max), 3)
        if iters_max and n_solved
        else 0.0,
        "kkt_factorizations_per_s_lower_bound": round(iters / dt, 1),
        "kkt_factorization_gflops_per_s": round(kkt_flops_per_s / 1e9, 3),
        "mfu_vs_bf16_peak": (
            round(kkt_flops_per_s / peak, 9) if peak else None
        ),
        "device_kind": kind,
        "compile_s": round(compile_s, 1),
        "trace_s": round(trace_s, 1),
        "compile_cache_dir": jax.config.jax_compilation_cache_dir,
        "per_batch_wall_s": round(dt, 3),
    }
    try:
        if os.environ.get("BENCH_SKIP_BASELINE", "0") != "1":
            extra.update(measure_cpu_baseline())
    except Exception as e:
        extra["cpu_baseline_error"] = repr(e)[:200]
    try:
        if os.environ.get("BENCH_SKIP_ROCKET", "0") != "1":
            extra.update(bench_rocket101())
    except Exception as e:  # keep the primary metric robust
        extra["rocket101_error"] = repr(e)[:200]
    try:
        if os.environ.get("BENCH_SKIP_CONTACT", "0") != "1":
            extra.update(bench_hopper_gait())
    except Exception as e:
        extra["hopper_gait_error"] = repr(e)[:200]

    base = extra.get("cpu_sequential_solves_per_s")
    print(
        json.dumps(
            {
                "metric": f"batched pendulum trajopt solves/s (T={HORIZON}, B={BATCH}, "
                f"tol={TOL:g}, {jax.devices()[0].platform})",
                "value": round(solves_per_s, 3),
                "unit": "solves/s",
                "vs_baseline": (
                    round(solves_per_s / base, 3) if base else None
                ),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
