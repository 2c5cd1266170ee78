"""Compile-latency budget: where the time before the first tick goes.

VERDICT r2 flagged a 185 s tick compile + 720 s warmup before bench.py's
first timed tick. This harness splits that cost into its stages using the
AOT API (jit(f).trace -> .lower -> .compile) for the two programs bench.py
builds (the warm-start solve and the K-tick chunk), so regressions are
attributable:

- trace:   Python tracing (host single-thread; grows with program size)
- lower:   jaxpr -> StableHLO
- compile: XLA backend compilation (the part the persistent cache elides)

Prints one JSON line per program. Run with --cpu for the CPU backend.

Usage: python tools/compile_bench.py [--cpu] [--batch 512] [--ticks 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compile cache")
    args = ap.parse_args()

    import jax

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         os.path.expanduser("~/.cache/jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    t0 = time.time()
    platform = jax.devices()[0].platform
    init_s = time.time() - t0

    import bench as B

    setup = B.build_workload(batch=args.batch, ticks=args.ticks,
                             dtype_str="f32")

    def stage_times(name, fn, *fargs):
        t0 = time.time()
        traced = jax.jit(fn).trace(*fargs)
        t_trace = time.time() - t0
        t0 = time.time()
        lowered = traced.lower()
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        try:
            cm = compiled.cost_analysis() or {}
            flops = cm.get("flops", float("nan"))
        except Exception:
            flops = float("nan")
        row = {"program": name, "platform": platform,
               "trace_s": round(t_trace, 2), "lower_s": round(t_lower, 2),
               "compile_s": round(t_compile, 2),
               "flops_per_call": flops}
        print(json.dumps(row), flush=True)
        return compiled

    print(json.dumps({"program": "backend_init", "platform": platform,
                      "init_s": round(init_s, 2)}), flush=True)
    stage_times("mpc_chunk", setup.run_chunk_fn, *setup.chunk_args)
    if setup.warm_fn is not None:  # fixed path: separate warm-start program
        stage_times("warm_solve", setup.warm_fn, *setup.warm_args)


if __name__ == "__main__":
    main()
