"""Model zoo: the reference's example systems rebuilt as JAX callables
(reference test/examples/*.jl, examples/).

Each module exposes a `*_problem(...)` builder returning a dict of
TrajOptSolver kwargs plus initialization trajectories, so tests, benchmarks
and applications share one definition.
"""

from calipso_tpu.models import (
    pendulum,
    cartpole,
    acrobot,
    double_integrator,
    rocket,
)

__all__ = ["pendulum", "cartpole", "acrobot", "double_integrator", "rocket"]
