"""MPC controllers (Carrot / Rail / Weighted) + closed-loop harness."""

from .base import MPC_TYPES, SOLVER_TYPES, MpcAbstract
from .carrot import CarrotMpc
from .loop import ClosedLoopResult, run_closed_loop
from .rail import RailMpc
from .weighted import WeightedMpc

__all__ = ["MpcAbstract", "CarrotMpc", "RailMpc", "WeightedMpc",
           "run_closed_loop", "ClosedLoopResult", "MPC_TYPES", "SOLVER_TYPES"]
