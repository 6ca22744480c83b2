"""Trajectory-optimization front-end namespace: re-exports the public
surface of calipso_tpu.trajopt.transcription (reference
src/trajectory_optimization/solver.jl exports)."""

from calipso_tpu.trajopt.transcription import (
    TrajOptSolver,
    Cost,
    Dynamics,
    Constraint,
    linear_interpolation,
)

__all__ = ["TrajOptSolver", "Cost", "Dynamics", "Constraint", "linear_interpolation"]
