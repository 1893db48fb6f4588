"""Real multi-process communication-backend test (VERDICT round-2 item 2).

Spawns TWO OS processes that each own 4 virtual CPU devices and join one
jax.distributed process group (Gloo collectives across the process boundary
— the CPU analog of the multi-host DCN path). The worker
(tests/multiproc_worker.py) asserts global device assembly, cross-process
psum / all_gather / ppermute, and that ``sample_chains_sharded`` over the
2-process mesh reproduces the single-process run exactly.

This exercises ``initialize_distributed`` (parallel/mesh.py) end to end —
previously a never-called single-process no-op wrapper.
"""

import socket
import subprocess
import sys

from pathlib import Path

WORKER = Path(__file__).parent / "multiproc_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_npz(tmp_path):
    """Single-process 8-device reference outputs for the cross-process
    tempering/SMC comparisons (tests/multiproc_cases.py configs)."""
    import numpy as np

    from eeyore_tpu.parallel.mesh import chain_mesh
    from tests import multiproc_cases as cases

    mesh = chain_mesh(axis_name="chains")
    pp_sample = np.asarray(cases.run_pp(mesh))
    particles, log_w, log_z = cases.run_smc(mesh)
    path = tmp_path / "multiproc_ref.npz"
    np.savez(path, pp_sample=pp_sample,
             smc_particles=np.asarray(particles),
             smc_log_w=np.asarray(log_w), smc_log_z=log_z)
    return path


def test_two_process_distributed_chains(tmp_path):
    ref_path = _reference_npz(tmp_path)
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(port), str(i),
                          str(ref_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"[p{i}] PASS" in out, f"worker {i} no PASS:\n{out[-4000:]}"
