"""ctypes binding for the native real-time executor (csrc/rt_executor.cpp).

Builds the shared library on first use (g++, cached under csrc/build/) and
wraps it in a context-manager class. This is the serving-loop runtime: the
compiled XLA MPC step runs inside precisely scheduled periodic ticks with
deadline-miss accounting and a telemetry ring.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "librt_executor.so")
_lib = None


def _build_library() -> str:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    src = os.path.join(_CSRC, "rt_executor.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_library())
        lib.rte_create.restype = ctypes.c_void_p
        lib.rte_create.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_int]
        lib.rte_destroy.argtypes = [ctypes.c_void_p]
        lib.rte_start.argtypes = [ctypes.c_void_p]
        lib.rte_wait_next.restype = ctypes.c_double
        lib.rte_wait_next.argtypes = [ctypes.c_void_p]
        lib.rte_record.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_double, ctypes.c_int]
        lib.rte_stats.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double)]
        lib.rte_history.restype = ctypes.c_int
        lib.rte_history.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.rte_now.restype = ctypes.c_double
        _lib = lib
    return _lib


class ExecutorStats(NamedTuple):
    n: int
    update_avg: float
    update_std: float
    update_max: float
    update_min: float
    solve_avg: float
    solve_std: float
    solve_max: float
    solve_min: float
    total_avg: float
    total_max: float
    lateness_avg: float
    lateness_max: float
    deadline_misses: int
    period_s: float
    budget_s: float

    def __str__(self):
        ms = 1e3
        return (f"ticks={self.n} update {self.update_avg*ms:.3f}±"
                f"{self.update_std*ms:.3f} ms | solve {self.solve_avg*ms:.3f}±"
                f"{self.solve_std*ms:.3f} ms (max {self.solve_max*ms:.3f}) | "
                f"total avg {self.total_avg*ms:.3f} ms vs budget "
                f"{self.budget_s*ms:.1f} ms | misses {self.deadline_misses} | "
                f"sched lateness max {self.lateness_max*ms:.3f} ms")


class RealTimeExecutor:
    """Drift-free periodic tick scheduler with telemetry.

    Usage::

        with RealTimeExecutor(period_s=0.02) as ex:
            for _ in range(n):
                ex.wait_next()
                t0 = ex.now(); params = update(...); t1 = ex.now()
                res = solve(...); t2 = ex.now()
                ex.record(t1 - t0, t2 - t1, cost, iters)
            print(ex.stats())
    """

    def __init__(self, period_s: float, budget_s: Optional[float] = None,
                 ring: int = 4096):
        self._lib = _load()
        self._h = self._lib.rte_create(period_s, budget_s or period_s, ring)
        if not self._h:
            raise ValueError("invalid executor parameters")

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.close()

    def start(self):
        self._lib.rte_start(self._h)

    def now(self) -> float:
        return self._lib.rte_now()

    def wait_next(self) -> float:
        """Block until the next tick deadline; returns lateness [s]."""
        return self._lib.rte_wait_next(self._h)

    def record(self, update_s: float, solve_s: float, cost: float = 0.0,
               iters: int = 0):
        self._lib.rte_record(self._h, update_s, solve_s, cost, iters)

    def stats(self) -> ExecutorStats:
        buf = (ctypes.c_double * 16)()
        self._lib.rte_stats(self._h, buf)
        v = list(buf)
        return ExecutorStats(int(v[0]), *v[1:13], int(v[13]), v[14], v[15])

    def history(self, max_n: int = 4096) -> np.ndarray:
        """(n, 5) array of recent [tick, update_s, solve_s, cost, iters]."""
        buf = (ctypes.c_double * (5 * max_n))()
        n = self._lib.rte_history(self._h, buf, max_n)
        return np.frombuffer(buf, dtype=np.float64, count=5 * n).reshape(n, 5).copy()

    def close(self):
        if self._h:
            self._lib.rte_destroy(self._h)
            self._h = None
