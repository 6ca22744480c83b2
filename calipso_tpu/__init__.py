"""CALIPSO-TPU: a TPU-native conic augmented-Lagrangian interior-point solver.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CALIPSO.jl
(reference: /root/reference, thowell/CALIPSO.jl). Solves

    minimize_x   c(x; theta)
    subject to   g(x; theta) = 0
                 h(x; theta) in K = R+^q x Q_l1 x ... x Q_lj

with differentiable solutions dw*/dtheta, plus a stagewise
trajectory-optimization front-end (reference README.md:13-57).

Design stance (TPU-first, not a port):
  * dense, block-structured linear algebra with static shapes instead of the
    reference's sparse Symbolics/QDLDL machinery,
  * jax.grad/jacfwd/hessian instead of symbolic codegen,
  * the whole solve is one XLA program (lax.while_loop nests),
  * whole solves vmap over problem batches and shard over device meshes.
"""

from calipso_tpu.options import Options
from calipso_tpu.ops.cones import ConeLayout
from calipso_tpu.solver.problem import ProblemFunctions, empty_constraint
from calipso_tpu.solver.api import Solver, SolveResult
from calipso_tpu.trajopt.api import (
    TrajOptSolver,
    Cost,
    Dynamics,
    Constraint,
    linear_interpolation,
)
from calipso_tpu.parallel.batch import BatchedSolver, BatchedTrajOptSolver

__all__ = [
    "Options",
    "ConeLayout",
    "ProblemFunctions",
    "empty_constraint",
    "Solver",
    "SolveResult",
    "TrajOptSolver",
    "Cost",
    "Dynamics",
    "Constraint",
    "linear_interpolation",
    "BatchedSolver",
    "BatchedTrajOptSolver",
]

__version__ = "0.1.0"
