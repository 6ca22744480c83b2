"""Op-level attribution of the batched-quadruped iteration cost
(docs/performance.md "Batched quadruped"): runs a SHORT batched solve
(few lockstep iterations, so the whole run fits under the profiler's
~1M-event cap that defeated the round-4 full-run trace), captures a
jax.profiler trace, and prints the top ops by self time via xprof's
op-profile converter. Run on the TPU:

    python docs/scripts/quadruped_profile.py [iters]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from calipso_tpu import TrajOptSolver
from calipso_tpu.models import quadruped


def build(B, inner):
    prob = quadruped.mpc_problem(horizon=8)
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "state_goal", "action_guess")
    }
    opts = bench._tol_options(
        max_iterative_refinement=2,
        max_outer_iterations=1,
        max_residual_iterations=inner,
    )
    ts = TrajOptSolver(options=opts, **kw)
    ts.initialize_states([np.asarray(s, np.float32) for s in prob["state_guess"]])
    ts.initialize_actions([np.asarray(a, np.float32) for a in prob["action_guess"]])
    bts = ts.batched()
    rng = np.random.default_rng(0)
    heights = rng.uniform(0.02, 0.10, size=(B,))
    q0 = quadruped._nominal_q()
    x0 = np.tile(np.concatenate([q0, q0])[None], (B, 1))
    x0[:, 1] += heights
    x0[:, 11 + 1] += heights
    return bts, jnp.asarray(x0, jnp.float32), rng, q0


def top_ops(log_dir, n=40):
    from xprof.convert import raw_to_tool_data

    runs = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*")))
    run = runs[-1]
    data, _ = raw_to_tool_data.xspace_to_tool_data([run], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.strip().startswith("[") else None
    return rows


def main():
    B = int(os.environ.get("QP_BATCH", "128"))
    inner = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bts, th, rng, q0 = build(B, inner)
    r = bts.solve(parameters=th)
    bench.force(r.state.p.x)
    print("warm: lockstep iters", int(np.asarray(r.state.total_i).max()))

    # fresh parameters for the traced run (result-cache hazard)
    h2 = rng.uniform(0.02, 0.10, size=(B,))
    x2 = np.tile(np.concatenate([q0, q0])[None], (B, 1))
    x2[:, 1] += h2
    x2[:, 11 + 1] += h2
    log_dir = "/tmp/calipso-quad-trace"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    r = bts.solve(parameters=jnp.asarray(x2, jnp.float32))
    bench.force(r.state.p.x)
    jax.profiler.stop_trace()

    rows = top_ops(log_dir)
    if rows is None:
        print("could not parse op stats; raw trace at", log_dir)
        return
    print(json.dumps(rows[:3], indent=1)[:2000])


if __name__ == "__main__":
    main()
