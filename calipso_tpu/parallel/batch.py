"""Scenario/batch data parallelism: vmap whole solves, shard over meshes.

The reference is single-process/single-threaded (SURVEY.md section 2.4);
batched and sharded solving is new TPU-native capability:
  * vmap: one XLA program runs B independent solves in lockstep; finished
    lanes are masked no-ops inside the while_loops.
  * shard_map/pjit over a Mesh axis: the batch axis spreads across chips,
    collectives ride ICI (nothing to communicate during independent solves;
    reductions appear in autotuning losses downstream).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calipso_tpu.options import Options
from calipso_tpu.solver.api import solve_fn, SolveResult
from calipso_tpu.solver.problem import ProblemFunctions
from calipso_tpu.ops.cones import ConeLayout


class BatchedSolver:
    """vmap/shard a whole conic solve over a leading batch axis of
    (x0, theta).

    Example:
        bs = BatchedSolver(objective, equality, cone, n, num_parameters=p)
        results = bs.solve(x0_batch, theta_batch)      # single device
        results = bs.solve(x0_batch, theta_batch, mesh=mesh, axis="batch")
    """

    def __init__(
        self,
        objective,
        equality,
        cone,
        num_variables: int,
        *,
        num_parameters: int = 0,
        nonnegative_indices=None,
        second_order_indices=None,
        options: Options = Options(),
    ):
        self.fns = ProblemFunctions(objective, equality, cone, num_variables, num_parameters)
        self.layout = ConeLayout(self.fns.dims.cone, nonnegative_indices, second_order_indices)
        self.options = options
        run = solve_fn(self.fns, self.layout, options)
        self._batched = jax.jit(jax.vmap(lambda x0, th: run(x0, th)))

    def solve(
        self,
        x0_batch,
        theta_batch=None,
        mesh: Optional[Mesh] = None,
        axis: str = "batch",
    ) -> SolveResult:
        x0_batch = jnp.asarray(x0_batch)
        if theta_batch is None:
            theta_batch = jnp.zeros(
                (x0_batch.shape[0], self.fns.dims.parameters), x0_batch.dtype
            )
        theta_batch = jnp.asarray(theta_batch, x0_batch.dtype)
        if mesh is not None:
            sharding = NamedSharding(mesh, P(axis))
            x0_batch = jax.device_put(x0_batch, sharding)
            theta_batch = jax.device_put(theta_batch, sharding)
        return self._batched(x0_batch, theta_batch)
