"""Trajectory-optimization front-end (stagewise transcription).

Placeholder module: populated by the trajopt milestone (see
calipso_tpu.trajopt.transcription). Public names re-exported here.
"""

from calipso_tpu.trajopt.transcription import (
    TrajOptSolver,
    Cost,
    Dynamics,
    Constraint,
    linear_interpolation,
)

__all__ = ["TrajOptSolver", "Cost", "Dynamics", "Constraint", "linear_interpolation"]
