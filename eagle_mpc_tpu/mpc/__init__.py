"""MPC controllers (Carrot / Rail / Weighted) + closed-loop harness."""

from .base import MPC_TYPES, SOLVER_TYPES, MpcAbstract
from .carrot import CarrotMpc
from .loop import ClosedLoopResult, run_closed_loop
from .rail import RailMpc
from .task_mpc import TaskActivatedCarrotMpc
from .weighted import WeightedMpc

__all__ = ["MpcAbstract", "CarrotMpc", "RailMpc", "WeightedMpc",
           "TaskActivatedCarrotMpc", "run_closed_loop", "ClosedLoopResult",
           "MPC_TYPES", "SOLVER_TYPES"]
