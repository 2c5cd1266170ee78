"""CI for the examples/ quickstart scripts (VERDICT r3 weak #8): every
example has a --smoke mode (tiny mission, CPU, few steps, asserts) and is
executed here as a real subprocess — exactly what a user runs first.

Subprocesses share the session's persistent compile cache (JAX_CACHE_DIR),
so warm re-runs of the suite do not re-pay XLA compilation.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXAMPLES = os.path.join(ROOT, "examples")


def _run_smoke(script, timeout=560):
    env = dict(os.environ)
    env.setdefault("JAX_CACHE_DIR",
                   os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    # keep the subprocess off any TPU plugin and off the forced-device flags
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--smoke"],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "SMOKE OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])


@pytest.mark.parametrize("script", [
    "trajectory.py",
    "batch_scenarios.py",
    "mpc_realtime.py",
    "mpc.py",
])
def test_example_smoke(script):
    _run_smoke(script)
