"""Measured decomposition of the d=54 T-streaming factor kernel's time
(docs/performance.md "Kernel roofline account"): runs the full kernel and
each phase-ablated variant (ablate hook, ops/pallas_riccati.py
_factor_stream_kernel) at the quadruped bench shape with the marginal-K
methodology, so the roofline gap is a table of measured terms instead of
an estimate. Run on the TPU:

    python docs/scripts/stream_kernel_gap.py
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

from calipso_tpu.ops import pallas_riccati as pr
import bench


def marginal_chain(make_fn, args, K1, K2, reps=4):
    f1, f2 = make_fn(K1), make_fn(K2)
    bench.force(f1(*args))
    bench.force(f2(*args))
    t1s, t2s = [], []
    for rep in range(reps):
        D, O = args
        t0 = time.time()
        bench.force(f1(D + 0.5 * (rep + 1), O))
        t1 = time.time() - t0
        t0 = time.time()
        bench.force(f2(D + 0.7 * (rep + 1), O))
        t2 = time.time() - t0
        if rep:
            t1s.append(t1)
            t2s.append(t2)
    return max((statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1), 1e-12)


def main():
    B, T, d, tile = 256, 8, 54, 256
    rng = np.random.default_rng(0)
    D = rng.normal(size=(B, T, d, d)).astype(np.float32)
    D = jnp.asarray(
        D @ np.transpose(D, (0, 1, 3, 2)) + 8 * d * np.eye(d, dtype=np.float32)
    )
    O = jnp.asarray(0.1 * rng.normal(size=(B, T - 1, d, d)).astype(np.float32))

    def make(ablate):
        def mk(K):
            def f(D, O):
                def body(i, c):
                    Dc, _ = c
                    L, _M = pr.factor_lanes_stream(Dc, O, batch_tile=tile, ablate=ablate)
                    # 1-element perturbation (see bench.bench_kernel_roofline)
                    Dc = Dc.at[0, 0, 0, 0].add(1e-12 * L[0, 0, 0, 0])
                    return (Dc, L)

                return lax.fori_loop(0, K, body, (D, jnp.zeros_like(D)))[1]

            return jax.jit(f)

        return mk

    out = {}
    K1, K2 = 4, 68
    with jax.default_matmul_precision("highest"):
        for tag, ablate in (
            ("full", ()),
            ("no_mtm", ("mtm",)),
            ("no_chol", ("chol",)),
            ("no_fwd", ("fwd",)),
            ("dma_only", ("mtm", "chol", "fwd")),
        ):
            dt = marginal_chain(make(ablate), (D, O), K1, K2)
            out[tag + "_us_per_call"] = round(dt * 1e6, 1)

    full = out["full_us_per_call"]
    out["mtm_share"] = round((full - out["no_mtm_us_per_call"]) / full, 3)
    out["chol_share"] = round((full - out["no_chol_us_per_call"]) / full, 3)
    out["fwd_share"] = round((full - out["no_fwd_us_per_call"]) / full, 3)
    out["dma_floor_share"] = round(out["dma_only_us_per_call"] / full, 3)
    flops = B * T * bench.FACTOR_FLOPS_PER_STAGE(d)
    out["full_gflops"] = round(flops / (full * 1e-6) / 1e9, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
