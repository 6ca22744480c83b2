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

# B=8192 is the round-5 throughput knee on one v5e chip: the faster
# program pushed the flattening point out (34.2k solves/s at B=2048,
# 45.2k at 4096, 53.0k at 8192, 53.8k at 16384 -- r5-builder); the
# batch size is part of the metric label, so round-over-round numbers
# stay attributable
BATCH = int(os.environ.get("BENCH_BATCH", "8192"))
HORIZON = int(os.environ.get("BENCH_HORIZON", "11"))
TOL = float(os.environ.get("BENCH_TOL", "1e-4"))

# bf16 MXU peak per chip; MFU is conventionally stated against this
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}


def force(x):
    """Wait for x's device computation to REALLY finish by pulling a
    scalar reduction to the host. jax.block_until_ready is not a reliable
    completion barrier through the tunneled runtime (measured: a 256 MB
    x20 HBM-stream chain 'completed' at 96 TB/s under block_until_ready,
    159 GB/s under value forcing), and repeated IDENTICAL dispatches can
    be served from a result cache -- so every timed section here (a)
    forces values and (b) perturbs its inputs per rep."""
    return float(jnp.sum(x))


def dispatch_latency_s():
    """Measured tunnel round-trip for a trivial dispatch + scalar pull
    (tens of ms); reported so latency-dominated single-solve numbers can
    be interpreted."""
    f = jax.jit(lambda x: x + 1.0)
    force(f(jnp.float32(1.0)))
    t0 = time.time()
    force(f(jnp.float32(2.0)))
    return time.time() - t0


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
    return bts, stage_dims, ts


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
# median-of-K per-solve timing (round-4 verdict weak #3): the old
# total/k mean swung 2x with unrelated box load; the per-solve MEDIAN is
# robust to scheduler spikes, and the p10/p90 rate spread + 1-min load
# average are recorded so the headline ratio's denominator is auditable
solved, times = 0, []
for i in range(1, {k} + 1):
    t0 = time.time()
    r = ts.solve(parameters=jnp.asarray(x0s[i]))
    jax.block_until_ready(r.state.p.x)
    times.append(time.time() - t0)
    solved += int(r.solved)
med = float(np.median(times))
p10, p90 = float(np.percentile(times, 10)), float(np.percentile(times, 90))
print(json.dumps({{"cpu_sequential_solves_per_s": 1.0 / med,
                   "cpu_sequential_spread": [1.0 / p90, 1.0 / p10],
                   "cpu_load_avg_1m": os.getloadavg()[0],
                   "cpu_sequential_solved": solved, "cpu_k": {k}}}))
"""


def measure_cpu_baseline(k=64):
    """Sequential one-at-a-time CPU f64 solves of the same problem family
    in a subprocess (fresh measurement; see module docstring). The rate is
    1/median of the k per-solve times (robust to box-load spikes); the
    p10/p90 rate spread and load average ride along in the JSON."""
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


def measure_ceilings():
    """Measured practical ceilings on THIS chip, for honest roofline
    percentages (BASELINE.json north star; SURVEY.md section 6): HBM
    stream bandwidth, big-matmul f32 throughput at the solver's
    matmul_precision='highest' (the 6-pass bf16 path -- the relevant MXU
    ceiling, NOT the marketing bf16 peak), and VPU elementwise-FMA
    throughput (the unit that bounds batched small-matrix factorization:
    per-lane d x d blocks cannot tile onto the 128x128 MXU)."""
    import jax
    import functools

    from jax import lax

    out = {}

    def marginal(make_fn, x, K1, K2):
        """Marginal per-iteration time via two chain lengths inside one
        jit each: cancels BOTH the tunnel dispatch latency and any fixed
        per-call overhead. Inputs are perturbed per call (result-cache
        hazard; see `force`), the first timed round is discarded (the
        first post-compile dispatch has been observed to carry a >1 s
        one-time cost), and the diff uses medians over 3 rounds (tunnel
        round-trip jitter is tens of ms)."""
        import statistics

        f1, f2 = make_fn(K1), make_fn(K2)
        force(f1(x))
        force(f2(x))
        t1s, t2s = [], []
        for rep in range(4):
            t0 = time.time()
            force(f1(x + 1.0 + rep))
            t1 = time.time() - t0
            t0 = time.time()
            force(f2(x + 100.0 + rep))
            t2 = time.time() - t0
            if rep:  # discard round 0
                t1s.append(t1)
                t2s.append(t2)
        return max(
            (statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1), 1e-12
        )

    # HBM: dependent big copies (read + write each)
    x = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB

    def make_copies(K):
        # sqrt(v + c) with v >= 0 maintained: a NESTED radical, which no
        # algebraic rewrite collapses. The previous sqrt(v^2 + c) chain
        # folds pairwise under the sqrt(x)^2 -> x simplification
        # (observed: an "HBM rate" 2x the chip's physical bandwidth);
        # linear chains collapse entirely. ~2 flops/element, firmly
        # bandwidth-bound.
        return jax.jit(
            lambda a: lax.fori_loop(0, K, lambda i, v: jnp.sqrt(v + 1e-3), a)
        )

    dt = marginal(make_copies, x, 4, 44)
    out["hbm_gbps_measured"] = round(2 * x.size * 4 / dt / 1e9, 1)

    # MXU f32-highest matmul chain
    a = jnp.eye(4096, dtype=jnp.float32) + 1e-6

    def make_mms(K):
        def f(m):
            with jax.default_matmul_precision("highest"):
                return lax.fori_loop(0, K, lambda i, v: 0.99 * (v @ m), m)

        return jax.jit(f)

    dt = marginal(make_mms, a, 4, 24)
    out["mxu_f32_highest_gflops_measured"] = round(2 * 4096**3 / dt / 1e9, 0)

    # VPU: compute-bound FMA chain on a VMEM-sized block (64 FMAs per
    # element per pass, one read+write per pass -> arithmetic-bound).
    # The multiplier is RUNTIME data, not a constant: a constant-
    # coefficient linear chain v*c+e folds algebraically (the whole
    # 64-FMA chain collapses to one), which made this ceiling swing
    # 4.3-10.9 TFLOP/s across rounds depending on what the simplifier
    # did; a data-dependent coefficient cannot fold.
    y = jnp.ones((512, 1024), jnp.float32)

    def make_fmas(K):
        def f(v):
            w = v * 1e-9 + 1.0000001  # runtime coefficient ~1

            def body(i, v):
                for _ in range(64):
                    v = v * w + 1e-7
                return v

            return lax.fori_loop(0, 64 * K, body, v)

        return jax.jit(f)

    # K spread sized so the marginal diff is ~40 ms >> tunnel jitter
    dt = marginal(make_fmas, y, 10, 60)
    out["vpu_fma_gflops_measured"] = round(64 * 64 * 2 * y.size / dt / 1e9, 0)
    return out


# analytic per-stage factorization work for the block-tridiagonal
# Cholesky (ops/riccati.py): chol(S_t) d^3/3 + M_t = L^-1 O' d^3 +
# M'M update 2 d^3 multiply-add-counted flops
FACTOR_FLOPS_PER_STAGE = lambda d: (1.0 / 3.0 + 1.0 + 2.0) * d**3
# HBM bytes per factorization: read D (T blocks) + O (T-1), write
# L (T) + M (T-1), f32 -- at T=1 only D and L exist (the round-5 T=1
# kernels no longer move a discarded zero M block)
FACTOR_BYTES_TOTAL = lambda d, T: (2 * T + 2 * max(T - 1, 0)) * d * d * 4
FACTOR_BYTES_PER_STAGE = lambda d: 4 * d * d * 4  # T>1 per-stage form


def bench_kernel_roofline(ceil):
    """Isolated KKT-factorization kernel rates vs the measured ceilings
    (SURVEY.md section 6 'KKT factorizations/s/chip vs roofline'):
    the contact-problem shape (B=256 lanes of T=8, d=54 -- the batched
    quadruped drop) and the flagship dense-schur shape (B=2048, n=32,
    T=1). Reports achieved GFLOP/s and GB/s plus the percentage of the
    binding ceiling: these lanes kernels are VPU-bound by design (batched
    per-lane small-matrix algebra cannot tile onto the 128x128 MXU; the
    masked-update formulation does ~2x redundant element work on top of
    the flop count), so the binding roofline is min(VPU, HBM)."""
    from jax import lax

    from calipso_tpu.ops import riccati as rc

    rng = np.random.default_rng(0)
    out = {}
    # K spreads sized so the marginal diff is ~120 ms >> the tunnel's
    # timing jitter: the d=54 stream call is ~0.6 ms after the round-5
    # register-tiled kernels (K 8->208; the old 4->68 spread left a
    # ~38 ms diff that swung the measured rate +-15% run to run), the
    # n=32 resident call ~0.08 ms (K 50->1250; fori_loop trip count does
    # not affect compile time)
    for tag, B, T, d, K1, K2 in (
        ("quadruped_d54", 256, 8, 54, 8, 208),
        ("flagship_n32", 2048, 1, 32, 50, 1250),
    ):
        D = rng.normal(size=(B, T, d, d)).astype(np.float32)
        D = jnp.asarray(D @ np.transpose(D, (0, 1, 3, 2)) + 8 * d * np.eye(d, dtype=np.float32))
        O = jnp.asarray(0.1 * rng.normal(size=(B, max(T - 1, 0), d, d)).astype(np.float32))

        def make_chain(K):
            # K chained factorizations inside one jit (the +1e-12*L
            # perturbation keeps the loop-carried dependency real while
            # leaving the blocks SPD); marginal two-K timing cancels the
            # dispatch latency (see `force`)
            def f(D, O):
                def body(i, c):
                    Dc, _ = c
                    L, _M = jax.vmap(rc.factor_cv)(Dc, O)
                    # 1-element loop-carried perturbation: keeps the
                    # chain serialized and inputs distinct per iteration
                    # WITHOUT the full-array read-modify-write whose 3
                    # extra HBM passes polluted the kernel rate ~25%
                    Dc = Dc.at[0, 0, 0, 0].add(1e-12 * L[0, 0, 0, 0])
                    return (Dc, L)

                return lax.fori_loop(0, K, body, (D, jnp.zeros_like(D)))[1]

            return jax.jit(f)

        import statistics

        with jax.default_matmul_precision("highest"):
            f1, f2 = make_chain(K1), make_chain(K2)
            force(f1(D, O))
            force(f2(D, O))
            t1s, t2s = [], []
            for rep in range(4):
                t0 = time.time()
                force(f1(D + 0.5 * (rep + 1), O))
                t1 = time.time() - t0
                t0 = time.time()
                force(f2(D + 0.7 * (rep + 1), O))
                t2 = time.time() - t0
                if rep:  # discard the first timed round (see marginal)
                    t1s.append(t1)
                    t2s.append(t2)
            dt = max(
                (statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1),
                1e-12,
            )
        flops = B * T * FACTOR_FLOPS_PER_STAGE(d)
        bts = B * FACTOR_BYTES_TOTAL(d, T)
        gflops = flops / dt / 1e9
        gbps = bts / dt / 1e9
        vpu, hbm = ceil["vpu_fma_gflops_measured"], ceil["hbm_gbps_measured"]
        out[f"kernel_{tag}"] = {
            "factorizations_per_s": round(B / dt, 0),
            "gflops": round(gflops, 1),
            "gbps": round(gbps, 1),
            "pct_vpu_ceiling": round(100 * gflops / vpu, 1),
            "pct_hbm_ceiling": round(100 * gbps / hbm, 1),
            "pct_mxu_f32_ceiling": round(
                100 * gflops / ceil["mxu_f32_highest_gflops_measured"], 1
            ),
        }
    return out


def bench_quadruped_batch():
    """Batched large-d contact workload (the MXU/VPU-regime flagship the
    round-2 verdict asked for): B parameterized quadruped drops (stage
    blocks d=54 after the equality_general rework -- 11-DOF planar
    quadruped, 4 friction-SOC contacts, reference quadruped_drop.jl
    class) solved in lockstep on the riccati backend, with analytic
    factorization flops AND bytes per iteration and achieved rates vs the
    measured ceilings. The manual-DMA T-streaming Pallas kernels are the
    DEFAULT factorization route for this shape (round 4 made
    CALIPSO_PALLAS_STREAM default to on after the while_loop-composition
    rewrite passed the full solver nest; ops/riccati.py:_use_pallas), so
    the quadruped numbers are measured on the stream route unless
    BENCH_QUAD_PALLAS=0 flips this run to the XLA-scan A/B path."""
    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import quadruped

    B = int(os.environ.get("BENCH_QUAD_BATCH", "128"))  # measured best solves/s (post ladder-carry fix the batch scales ~linearly; 128: 6.3/s vs 256: 5.8/s)
    H = 8
    if os.environ.get("BENCH_QUAD_PALLAS", "1") == "0":
        # A/B switch: disable the (default-on) stream kernels for this run
        os.environ["CALIPSO_PALLAS_STREAM"] = "0"
    prob = quadruped.mpc_problem(horizon=H)
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "state_goal", "action_guess")
    }
    ts = TrajOptSolver(options=_tol_options(max_iterative_refinement=2), **kw)
    ts.initialize_states([np.asarray(s, np.float32) for s in prob["state_guess"]])
    ts.initialize_actions([np.asarray(a, np.float32) for a in prob["action_guess"]])
    bts = ts.batched()

    # scenario: per-lane initial state = nominal stance dropped from a
    # per-lane height in [0.02, 0.10]
    rng = np.random.default_rng(0)
    heights = rng.uniform(0.02, 0.10, size=(B,))
    q0 = quadruped._nominal_q()
    x0 = np.tile(np.concatenate([q0, q0])[None], (B, 1))
    x0[:, 1] += heights
    x0[:, 11 + 1] += heights
    th = jnp.asarray(x0, jnp.float32)

    # ahead-of-time traced-program cache (utils/aot.py): the cold start
    # is dominated by Python tracing, which the persistent XLA cache
    # cannot absorb -- the keyed AOT cache (package-source + problem
    # fingerprint) skips tracing entirely on a warm run, so compile_s
    # then reflects deserialize + XLA-cache-hit + first dispatch
    from calipso_tpu.utils import aot as _aot

    # compile_s spans the WHOLE cold start: trace+export on an AOT miss
    # (or deserialize on a hit), XLA compile, and the first dispatch --
    # timing only the first solve would hide the trace wall outside the
    # reported number
    t0 = time.time()
    fp = f"quadruped-B{B}-H{H}-tol{TOL}-refine2-p{th.shape[1]}"
    fn, aot_cached = _aot.cached_batched(
        bts._batched, "quad", fp, *bts._example_args(B, th.shape[1])
    )
    bts._batched = fn
    res = bts.solve(parameters=th)
    force(res.state.p.x)
    compile_s = time.time() - t0
    # fresh scenario heights each rep: repeated identical dispatches can
    # be served from the tunneled runtime's result cache (observed: a
    # repeat of an IDENTICAL d=54 batch returned in 4 ms where the honest
    # time is ~100x that), exactly like the flagship bench's per-rep x0s
    reps = 2
    t0 = time.time()
    for r in range(reps):
        h_r = rng.uniform(0.02, 0.10, size=(B,))
        x0r = np.tile(np.concatenate([q0, q0])[None], (B, 1))
        x0r[:, 1] += h_r
        x0r[:, 11 + 1] += h_r
        res = bts.solve(parameters=jnp.asarray(x0r, jnp.float32))
        force(res.state.p.x)
    dt = (time.time() - t0) / reps

    solved_mask = np.asarray(res.state.solved)
    total_i = np.asarray(res.state.total_i)
    iters = int(total_i.sum())
    dmax = max(nx + nu for nx, nu in zip(ts.num_states, ts.num_actions))
    fact_flops = iters * H * FACTOR_FLOPS_PER_STAGE(dmax)
    fact_bytes = iters * H * FACTOR_BYTES_PER_STAGE(dmax)
    # lockstep trips >= per-lane max iterations; the cost-accounting
    # counters are per-LANE totals whose lane-MAX bounds what the
    # lockstep batch actually executed (vmapped while loops run until
    # every lane is done) -- these are the multiplicities that close the
    # docs/performance.md iteration budget
    lockstep = int(total_i.max())
    ladder = np.asarray(res.state.num_ladder)
    refine = np.asarray(res.state.num_refine)
    chunks = np.asarray(res.state.num_ls_chunks)
    return {
        "quadruped_batch": B,
        "quadruped_solved": int(solved_mask.sum()),
        "quadruped_solves_per_s": round(B / dt, 1),
        "quadruped_stage_block_d": dmax,
        "quadruped_total_inner_iterations": iters,
        "quadruped_lockstep_iterations": lockstep,
        "quadruped_ladder_refactorizations_max": int(ladder.max()),
        "quadruped_refine_trips_max": int(refine.max()),
        "quadruped_ls_chunks_max": int(chunks.max()),
        "quadruped_per_batch_wall_s": round(dt, 3),
        "quadruped_compile_s": round(compile_s, 1),
        "quadruped_aot_cached": bool(aot_cached),
        "quadruped_fact_gflops_per_s_lower_bound": round(fact_flops / dt / 1e9, 1),
        "quadruped_fact_gbps_lower_bound": round(fact_bytes / dt / 1e9, 2),
    }


def bench_quadruped_subprocess(timeout_s=1500):
    """Run the quadruped section in a SUBPROCESS, before the parent
    process has initialized the TPU backend: a TPU kernel fault leaves
    the faulting process's device handle unusable (BENCH_r03 lost the
    whole section this way), so the big contact program gets its own
    process and the parent merges its one-line JSON result (round-3
    verdict next-round #1b)."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--quadruped-child"],
        capture_output=True,
        text=True,
        timeout=timeout_s,
        env=dict(os.environ),
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"quadruped child produced no JSON (rc={out.returncode}): "
        f"{(out.stderr or out.stdout)[-300:]}"
    )


def bench_rocket_batch_pallas():
    """Batched rocket SOC landing T=31, B=128 (d=9 stage blocks): the
    Riccati-lanes Pallas regime (VMEM-resident route, ops/riccati.py
    factor_cv/solve_cv) measured end-to-end against the same solve with
    the kernels disabled -- the driver-captured version of the +8-10%
    claim (round-3 verdict next-round #8)."""
    from calipso_tpu import TrajOptSolver
    from calipso_tpu.models import rocket

    B = 128
    out = {}
    for tag, env in (("pallas", "1"), ("xla", "0")):
        prev = os.environ.get("CALIPSO_PALLAS_RICCATI")
        os.environ["CALIPSO_PALLAS_RICCATI"] = env
        try:
            prob = rocket.landing_problem(horizon=31)
            kw = {
                k: v
                for k, v in prob.items()
                if k not in ("state_guess", "state_initial", "state_goal")
            }
            opts = _tol_options(max_iterative_refinement=2, linear_solver="riccati")
            ts = TrajOptSolver(options=opts, **kw)
            ts.initialize_states([np.asarray(s, np.float32) for s in prob["state_guess"]])
            bts = ts.batched()
            rng = np.random.default_rng(0)
            # scenario variation enters through the per-lane GUESS: the
            # rocket landing problem has no stage parameters (its x0 is a
            # constraint constant), so the earlier parameters=...
            # perturbations were silently unused and every lane solved
            # the identical program -- perturbing the warm-start guess
            # makes the lanes genuinely distinct solves
            g0 = np.asarray(ts._guess, np.float32)
            guess_b = jnp.asarray(
                g0[None] + 0.01 * rng.normal(size=(B, g0.size)).astype(np.float32)
            )
            res = bts.solve(guess=guess_b)
            force(res.state.p.x)
            # fresh scenarios per rep (result-cache hazard; see
            # bench_quadruped_batch)
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                g_r = jnp.asarray(
                    g0[None] + 0.01 * rng.normal(size=(B, g0.size)).astype(np.float32)
                )
                res = bts.solve(guess=g_r)
                force(res.state.p.x)
            dt = (time.time() - t0) / reps
            out[f"rocket_batch_{tag}_solves_per_s"] = round(B / dt, 1)
            out[f"rocket_batch_{tag}_solved"] = int(np.asarray(res.state.solved).sum())
            out[f"rocket_batch_{tag}_iterations"] = int(
                np.asarray(res.state.total_i).sum()
            )
        finally:
            if prev is None:
                os.environ.pop("CALIPSO_PALLAS_RICCATI", None)
            else:
                os.environ["CALIPSO_PALLAS_RICCATI"] = prev
    if out.get("rocket_batch_xla_solves_per_s"):
        out["rocket_batch_pallas_speedup"] = round(
            out["rocket_batch_pallas_solves_per_s"]
            / out["rocket_batch_xla_solves_per_s"],
            3,
        )
    return out


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
    force(r.state.p.x)
    compile_s = time.time() - t0
    # perturb the guess each rep (identical dispatches can be served from
    # the tunneled runtime's result cache; see bench_quadruped_batch)
    reps = 2
    t0 = time.time()
    for rep in range(reps):
        g = jnp.asarray(guess, jnp.float32) + 1e-5 * (rep + 1)
        r = ts.solver.solve(x0=g)
        force(r.state.p.x)
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
    force(r.state.p.x)
    # perturbed guess for the timed rep (result-cache hazard; see
    # bench_quadruped_batch)
    g = jnp.asarray(ts._guess, jnp.float32) + 1e-5
    t0 = time.time()
    r = ts.solver.solve(x0=g)
    force(r.state.p.x)
    dt = time.time() - t0
    return {
        "hopper_gait_solved": bool(r.solved),
        "hopper_gait_iterations": int(r.iterations),
        "hopper_gait_solve_s": round(dt, 3),
        "hopper_gait_backend": ts.solver.options.linear_solver,
    }


def main():
    # FIRST, before this process initializes the TPU backend: the
    # quadruped contact section runs in a subprocess so a TPU kernel
    # fault there can neither void this process's device handle nor be
    # voided by it (the two processes never hold the chip concurrently)
    quad = {}
    try:
        if os.environ.get("BENCH_SKIP_QUAD", "0") != "1":
            quad = bench_quadruped_subprocess()
    except Exception as e:
        quad = {"quadruped_error": repr(e)[:300]}

    bts, stage_dims, ts = build()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.2 * rng.normal(size=(BATCH, 2)), jnp.float32)

    # warmup / compile (compile_s includes tracing; trace_s isolates the
    # Python/jaxpr part, measured COLD on a freshly built solver so the
    # jaxpr cache from the warmup call cannot hide it -- the rest is the
    # XLA TPU compiler, which the on-by-default persistent compilation
    # cache absorbs across processes)
    t0 = time.time()
    res = bts.solve(parameters=x0s)
    force(res.state.p.x)
    compile_s = time.time() - t0
    bts_cold, _, _ = build()
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
        force(res.state.p.x)
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
    # on regularization bumps, which are not counted). The flagship's
    # resolved backend is schur (dense Cholesky of the n x n primal Schur
    # complement -- n <= 96 crossover, solve.py resolve_options), so the
    # per-iteration factorization is one n^3/3 Cholesky.
    backend = ts.solver.options.linear_solver
    n_schur = ts.num_variables
    if backend == "schur":
        fact_flops_per_lane = n_schur**3 / 3.0
        fact_bytes_per_lane = 2 * n_schur * n_schur * 4  # read S, write L
    else:
        fact_flops_per_lane = sum(FACTOR_FLOPS_PER_STAGE(d) for d in stage_dims)
        fact_bytes_per_lane = sum(FACTOR_BYTES_PER_STAGE(d) for d in stage_dims)
    kkt_flops_per_s = iters / dt * fact_flops_per_lane
    kkt_bytes_per_s = iters / dt * fact_bytes_per_lane
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
        # cost-accounting counters (lane-max; see bench_quadruped_batch)
        "ladder_refactorizations_max": int(np.asarray(res.state.num_ladder).max()),
        "refine_trips_max": int(np.asarray(res.state.num_refine).max()),
        "ls_chunks_max": int(np.asarray(res.state.num_ls_chunks).max()),
        "kkt_backend": backend,
        "kkt_factorization_gflops_per_s": round(kkt_flops_per_s / 1e9, 3),
        "kkt_factorization_gbps": round(kkt_bytes_per_s / 1e9, 3),
        "mfu_vs_bf16_peak": (
            round(kkt_flops_per_s / peak, 9) if peak else None
        ),
        "device_kind": kind,
        "dispatch_latency_s": round(dispatch_latency_s(), 3),
        "compile_s": round(compile_s, 1),
        "trace_s": round(trace_s, 1),
        "compile_cache_dir": jax.config.jax_compilation_cache_dir,
        "per_batch_wall_s": round(dt, 3),
    }
    try:
        if os.environ.get("BENCH_SKIP_ROOFLINE", "0") != "1":
            ceil = measure_ceilings()
            extra.update(ceil)
            extra.update(bench_kernel_roofline(ceil))
            # flagship workload vs measured ceilings (end-to-end, so every
            # non-factorization op of the solve counts against it)
            if ceil.get("vpu_fma_gflops_measured"):
                extra["kkt_pct_vpu_ceiling_end_to_end"] = round(
                    100 * kkt_flops_per_s / 1e9 / ceil["vpu_fma_gflops_measured"], 2
                )
    except Exception as e:
        extra["roofline_error"] = repr(e)[:200]
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
    try:
        if os.environ.get("BENCH_SKIP_ROCKET_BATCH", "0") != "1":
            extra.update(bench_rocket_batch_pallas())
    except Exception as e:
        extra["rocket_batch_error"] = repr(e)[:200]
    extra.update(quad)  # measured first, in its own process (see main top)

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
    if "--quadruped-child" in sys.argv:
        # child mode: run only the quadruped section and print its JSON
        try:
            print(json.dumps(bench_quadruped_batch()))
        except Exception as e:
            print(json.dumps({"quadruped_error": repr(e)[:300]}))
    else:
        main()
