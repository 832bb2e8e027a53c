from pulser_diff_tpu.solvers.mcwf import McwfResult, mcsolve
from pulser_diff_tpu.solvers.solver import (
    SolverType,
    TimeGrid,
    mesolve,
    sesolve,
)

__all__ = [
    "SolverType",
    "TimeGrid",
    "sesolve",
    "mesolve",
    "mcsolve",
    "McwfResult",
]
