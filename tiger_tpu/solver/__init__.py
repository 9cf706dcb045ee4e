"""Solver layer: adaptive RK45 + Radau IIA, step control, dense output."""

from tiger_tpu.solver.config import SolverConfig
from tiger_tpu.solver.api import solve, SolveResult
from tiger_tpu.solver.rk45 import rk45_solve, RK45Result, RKStats
from tiger_tpu.solver.radau import radau_solve, RadauResult, RadauStats
from tiger_tpu.solver.controller import initial_step

__all__ = [
    "SolverConfig",
    "solve",
    "SolveResult",
    "rk45_solve",
    "RK45Result",
    "RKStats",
    "radau_solve",
    "RadauResult",
    "RadauStats",
    "initial_step",
]
