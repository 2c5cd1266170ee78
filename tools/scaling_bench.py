"""Multi-host weak-scaling benchmark: solves/s at 1/2/4/8 emulated hosts.

Spawns N jax.distributed processes (1 CPU device each), each solving its
shard of a global batch that grows with N (weak scaling: per-host work is
constant). Reports solves/s per host count and the parallel efficiency
vs. 1 host — the BASELINE.md criterion is >= 80 % at N >= 2 hosts on real
pod hardware; on a shared-CPU CI box the numbers are mechanism-validating
(the processes contend for the same cores, so efficiency here is a lower
bound).

Usage: python tools/scaling_bench.py [--hosts 1 2 4 8] [--per-host 32]
"""

import argparse
import json
import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "..", "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_job(n_hosts: int, per_host: int, reps: int = 5, solver: str = "fixed"):
    port = _free_port()
    procs = []
    for pid in range(n_hosts):
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)
        env.update({
            "EAGLE_MPC_COORDINATOR": f"127.0.0.1:{port}",
            "EAGLE_MPC_NUM_PROCS": str(n_hosts),
            "EAGLE_MPC_PROC_ID": str(pid),
            "EAGLE_MPC_LOCAL_DEVICES": "1",
            "EAGLE_MPC_GLOBAL_BATCH": str(per_host * n_hosts),
            "EAGLE_MPC_TIME_REPS": str(reps),
            "EAGLE_MPC_SOLVER": solver,
            "JAX_CACHE_DIR": env.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")),
        })
        ncores = os.cpu_count() or 1
        env["EAGLE_MPC_CPU_AFFINITY"] = str(pid % ncores)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{err[-2000:]}")
        line = [l for l in out.splitlines() if l.startswith("WORKER_RESULT ")]
        results.append(json.loads(line[-1][len("WORKER_RESULT "):]))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-host", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--solver", choices=["fixed", "while"], default="fixed",
                    help="fixed: deterministic per-element work (weak "
                         "scaling measures coordination, not lockstep "
                         "imbalance); while: round-3 comparison path")
    args = ap.parse_args()

    rows = []
    for n in args.hosts:
        res = run_job(n, args.per_host, args.reps, args.solver)
        sps = res[0]["solves_per_s"]
        rows.append((n, args.per_host * n, sps))
        print(f"hosts={n:2d} global_batch={args.per_host * n:4d} "
              f"solves/s={sps:9.1f}", flush=True)

    base = rows[0][2] / rows[0][0]
    print("\nhosts  batch  solves/s  efficiency")
    effs = {}
    for n, b, sps in rows:
        eff = sps / (base * n)
        effs[n] = round(eff, 3)
        print(f"{n:5d} {b:6d} {sps:9.1f} {eff:10.1%}")
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "per_host_batch": args.per_host,
                      "solves_per_s": {n: round(s, 1) for n, _, s in rows},
                      "efficiency": effs}))


if __name__ == "__main__":
    main()
