"""Worker for the two-process DCN-axis simulation test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device global mesh, so the `batch` axis spans a process
boundary -- the multi-slice/DCN analogue of SURVEY.md section 2.4 item 2
(scenario-batch data parallelism with psum loss/gradient reductions,
BASELINE.json north star ">= 2 hosts"). Collectives between the two
processes ride the distributed CPU backend (gloo), standing in for DCN;
on real hardware the same program spans slices unchanged.
"""

import json
import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calipso_tpu import Options, TrajOptSolver
from calipso_tpu.solver.api import solve_fn

assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

def pend_c(x, u):
    return jnp.array(
        [x[1], u[0] / 0.25 - 9.81 * jnp.sin(x[0]) / 0.5 - 0.1 * x[1] / 0.25]
    )


def pend_d(y, x, u):
    return y - (x + 0.05 * pend_c(0.5 * (x + y), u))


H, nx = 5, 2
ts = TrajOptSolver(
    [lambda x, u, w: 0.1 * x @ x + 0.1 * u @ u] * (H - 1)
    + [lambda x, u, w: 10.0 * x @ x],
    [pend_d] * (H - 1),
    [nx] * H,
    [1] * (H - 1),
    equality=[lambda x, u, w: x - w] + [None] * (H - 1),
    parameters=[np.zeros(nx)] + [np.zeros(0)] * (H - 1),
    options=Options(differentiate=True),
)
run = solve_fn(ts.solver.fns, ts.solver.layout, ts.solver.options)
nvar = ts.num_variables

from jax import shard_map

mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
B = 2 * len(jax.devices())  # two scenarios per device, 8 per process


def local_step(x0_shard, guess):
    res = jax.vmap(lambda th: run(guess, th))(x0_shard)
    xs = res.state.p.x
    dxdth = res.sensitivity[:, :nvar, :]
    loss_loc = jnp.sum(xs**2)
    grad_loc = jnp.einsum("bi,bip->p", 2.0 * xs, dxdth)
    # psum crosses the process boundary: devices 0-3 live in process 0,
    # 4-7 in process 1
    loss = jax.lax.psum(loss_loc, "batch") / B
    grad = jax.lax.psum(grad_loc, "batch") / B
    ok = jax.lax.psum(jnp.sum(res.state.solved), "batch")
    return loss, grad, ok


step = jax.jit(
    shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("batch"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
)

# identical global scenario set in both processes; each process feeds its
# local shard of the global array
rng = np.random.default_rng(0)
x0_global = 0.2 * rng.normal(size=(B, nx))
sharding = NamedSharding(mesh, P("batch"))
lo = pid * (B // 2)
x0 = jax.make_array_from_process_local_data(
    sharding, x0_global[lo : lo + B // 2]
)
loss, grad, ok = step(x0, jnp.zeros((nvar,)))
jax.block_until_ready(loss)

print(
    "MULTIHOST_RESULT "
    + json.dumps(
        dict(
            pid=pid,
            loss=float(loss),
            grad_norm=float(jnp.linalg.norm(grad)),
            solved=int(ok),
            batch=B,
            n_global_devices=len(jax.devices()),
            n_processes=jax.process_count(),
        )
    ),
    flush=True,
)
jax.distributed.shutdown()
