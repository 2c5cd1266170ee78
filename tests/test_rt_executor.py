"""Native real-time executor tests: build, scheduling accuracy, telemetry."""

import time

import numpy as np
import pytest

from eagle_mpc_tpu.utils.rt_executor import RealTimeExecutor


class TestRealTimeExecutor:
    def test_builds_and_runs(self):
        with RealTimeExecutor(period_s=0.002, ring=64) as ex:
            for i in range(20):
                ex.wait_next()
                t0 = ex.now()
                time.sleep(0.0002)
                t1 = ex.now()
                ex.record(1e-5, t1 - t0, cost=float(i), iters=2)
            s = ex.stats()
        assert s.n == 20
        assert s.deadline_misses == 0
        assert 0.0001 < s.solve_avg < 0.002
        assert s.period_s == pytest.approx(0.002)

    def test_period_is_held(self):
        """Consecutive wait_next returns are one period apart (drift-free)."""
        times = []
        with RealTimeExecutor(period_s=0.005) as ex:
            for _ in range(10):
                ex.wait_next()
                times.append(ex.now())
        gaps = np.diff(times)
        # a loaded CI box can preempt individual ticks (observed under
        # pytest-xdist on the 2-core runner) — the drift-free property is
        # about the TYPICAL gap and the absolute schedule, not every tick
        assert abs(float(np.median(gaps)) - 0.005) < 0.002, gaps
        assert np.sum(np.abs(gaps - 0.005) < 0.002) >= 6, gaps
        # absolute schedule: total elapsed ~ n * period (no cumulative drift)
        assert abs((times[-1] - times[0]) - 9 * 0.005) < 0.010

    def test_deadline_misses_counted(self):
        with RealTimeExecutor(period_s=0.002, budget_s=0.001) as ex:
            for _ in range(5):
                ex.wait_next()
                ex.record(0.0, 0.005, 0.0, 1)   # 5 ms >> 1 ms budget
            s = ex.stats()
        assert s.deadline_misses == 5

    def test_overrun_skips_to_future_slot(self):
        """After an overrun the schedule resumes on a future slot instead of
        bursting catch-up ticks."""
        with RealTimeExecutor(period_s=0.003) as ex:
            ex.wait_next()
            time.sleep(0.010)             # overrun ~3 periods
            late = ex.wait_next()
            assert late > 0.005
            t0 = ex.now()
            late2 = ex.wait_next()        # should wait a full period again
            assert late2 == 0.0
            assert ex.now() - t0 > 0.002

    def test_history_ring(self):
        with RealTimeExecutor(period_s=0.001, ring=8) as ex:
            for i in range(12):
                ex.wait_next()
                ex.record(0.0, 1e-4, float(i), i)
            h = ex.history()
        assert h.shape == (8, 5)
        np.testing.assert_array_equal(h[:, 0], np.arange(4, 12))  # newest 8
        np.testing.assert_array_equal(h[:, 4], np.arange(4, 12))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
