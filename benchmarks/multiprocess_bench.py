"""Multi-process scaling-efficiency table (VERDICT round-2 item 2).

Runs the SAME sharded-chain workload (8-device mesh, identical global chain
count) in two process topologies:

- 1 process x 8 virtual CPU devices (all collectives in-process), and
- 2 processes x 4 virtual CPU devices (jax.distributed + Gloo across a real
  OS process boundary — the DCN analog).

Efficiency = t_single / t_dist. NOTE on interpretation: this container has
2 physical cores, so the virtual devices oversubscribe either way; the table
demonstrates that the multi-process communication backend runs the exact
workload with bounded overhead, not hardware scaling (which needs real
multi-host TPU). Writes benchmarks/MULTIPROCESS_RESULTS.json.
"""

import json
import socket
import subprocess
import sys

from pathlib import Path

HERE = Path(__file__).parent
WORKER = HERE / "multiproc_bench_worker.py"
OUT = HERE / "MULTIPROCESS_RESULTS.json"

CHAINS, ITERS = 4096, 400


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_single():
    out = subprocess.run(
        [sys.executable, str(WORKER), "single", "0", "0", str(CHAINS), str(ITERS)],
        capture_output=True, text=True, timeout=600, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_dist():
    port = free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "dist", str(port), str(i), str(CHAINS), str(ITERS)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"dist worker failed:\n{out[-3000:]}")
        results.append(json.loads(out.strip().splitlines()[-1]))
    return results


def main():
    single = run_single()
    dist = run_dist()
    t_dist = max(r["elapsed_s"] for r in dist)
    table = {
        "workload": {"chains": CHAINS, "iters": ITERS,
                     "kernel": "MALA bvn (sample_chains_sharded)"},
        "single_process_8dev": single,
        "two_process_4dev_each": dist,
        "efficiency_vs_single": round(single["elapsed_s"] / t_dist, 3),
        "note": "2 physical cores; mechanism demonstration, not hardware scaling",
    }
    print(json.dumps(table, indent=2))
    OUT.write_text(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
