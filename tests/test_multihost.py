"""Two-process DCN-axis simulation (slow tier): the scenario-batch data
parallelism of SURVEY.md section 2.4 item 2 run across a PROCESS boundary
(2 simulated hosts x 4 virtual CPU devices each), per the BASELINE.json
north star (">= 2 hosts, near-linear scenario-batch scaling").

jax.distributed stitches the two processes into one 8-device mesh; the
shard_map psum loss/gradient reduction of the auto-tuning pattern then
crosses processes over the distributed CPU backend -- the stand-in for
DCN. Asserts: both processes converge every lane, agree bit-for-bit on
the psum'd loss/gradient, and report the 2-process/8-device topology.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum_batch_axis():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PLATFORM_NAME")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        assert lines, f"no result line in:\n{out[-3000:]}"
        results.append(json.loads(lines[-1].split(" ", 1)[1]))
    r0, r1 = sorted(results, key=lambda r: r["pid"])
    assert r0["n_processes"] == 2 and r0["n_global_devices"] == 8
    assert r0["solved"] == r0["batch"] == 16
    assert r1["solved"] == 16
    # the psum'd scalars are replicated across processes: must agree exactly
    assert r0["loss"] == r1["loss"]
    np.testing.assert_allclose(r0["grad_norm"], r1["grad_norm"], rtol=0)
    assert np.isfinite(r0["loss"]) and np.isfinite(r0["grad_norm"])
