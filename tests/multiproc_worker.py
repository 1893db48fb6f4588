"""Worker process for the 2-process jax.distributed test (NOT a pytest
module — launched as a subprocess by tests/test_multiprocess.py).

Each of the 2 processes owns 4 virtual CPU devices; together they form the
8-device global mesh. Verifies, across a REAL process boundary (Gloo
collectives on CPU — the DCN analog of the TPU deployment):

1. the distributed runtime assembles the global device view,
2. psum / all_gather / ppermute cross the process boundary correctly,
3. ``sample_chains_sharded`` over the 2-process mesh reproduces the
   single-process vmap run exactly (each process checks its local shards
   against a locally-computed full reference — chains are keyed by
   fold_in(key, chain_index), so the reference is deterministic).

Round-4 addition (VERDICT item 6): the two hot-loop-collective paths —
``run_power_posterior_sharded`` (ppermute ghost-rung swaps) and
``run_smc_sharded`` (psum-logsumexp weights + global resample) — also run
over the 2-process mesh and are compared against reference outputs the
single-process pytest side computed on its 8-device mesh (same keys ⇒ same
draws; tests/multiproc_cases.py holds the shared configs).

Usage: python multiproc_worker.py <port> <process_id> [ref_npz_path]
"""

import os
import sys

# force exactly 4 local devices, replacing any inherited count (pytest's
# conftest exports 8 for the single-process virtual mesh)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])

import jax

jax.config.update("jax_platforms", "cpu")
# match the pytest side's x64 (tests/conftest.py): the reference .npz for
# the tempering/SMC comparisons is computed under f64
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    from eeyore_tpu.parallel.mesh import chain_mesh, initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = chain_mesh()
    sharding = NamedSharding(mesh, P("chains"))

    # --- collectives across the process boundary ---
    x = np.arange(8.0)
    xs = jax.device_put(x, sharding)
    total = shard_map(lambda v: jax.lax.psum(v, "chains"), mesh=mesh,
                      in_specs=P("chains"), out_specs=P())(xs)
    got = np.asarray(total.addressable_shards[0].data)
    assert np.allclose(got, x.sum()), (got, x.sum())

    gathered = shard_map(lambda v: jax.lax.all_gather(v, "chains"), mesh=mesh,
                         in_specs=P("chains"), out_specs=P(None, "chains"))(xs)
    g0 = np.asarray(gathered.addressable_shards[0].data).reshape(-1)
    assert np.allclose(np.sort(g0), x), g0

    shifted = shard_map(
        lambda v: jax.lax.ppermute(v, "chains", [(i, (i + 1) % 8) for i in range(8)]),
        mesh=mesh, in_specs=P("chains"), out_specs=P("chains"))(xs)
    for s in shifted.addressable_shards:
        dev_idx = list(mesh.devices.flat).index(s.device)
        assert np.asarray(s.data)[0] == (dev_idx - 1) % 8, (dev_idx, np.asarray(s.data))

    # --- sharded chains match the single-process reference ---
    from eeyore_tpu.models import DistributionModel
    from eeyore_tpu.parallel.sharded import sample_chains_sharded
    from eeyore_tpu.samplers import MALA
    from eeyore_tpu.samplers.runner import sample_chains

    prec = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.5], [0.5, 1.0]])))
    model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    key = jax.random.PRNGKey(3)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (64, 2))

    recorded, _ = sample_chains_sharded(
        MALA(model, step=0.4), key, theta0s, data, num_iters=200,
        num_burnin_iters=50, mesh=mesh)
    # full single-process reference, computed locally by each process
    ref = sample_chains(MALA(model, step=0.4), key, theta0s, data,
                        num_iters=200, num_burnin_iters=50, return_arrays=True)
    ref_samples = np.asarray(ref["sample"])  # [64, 150, 2]

    checked = 0
    for s in recorded["sample"].addressable_shards:
        lo = s.index[0].start or 0
        local = np.asarray(s.data)
        np.testing.assert_allclose(local, ref_samples[lo:lo + local.shape[0]],
                                   rtol=1e-12, atol=1e-12)
        checked += local.shape[0]
    assert checked == 32, checked  # 4 of 8 shards live here

    # --- hot-loop collectives across the process boundary (round 4) ---
    # run_power_posterior_sharded (ppermute ladder swaps) and
    # run_smc_sharded (psum-logsumexp + global resample) against the
    # single-process 8-device reference the pytest side precomputed
    if len(sys.argv) > 3:
        import multiproc_cases as cases

        ref = np.load(sys.argv[3])

        pp_sample = cases.run_pp(mesh)
        checked = 0
        for s in pp_sample.addressable_shards:
            lo = s.index[0].start or 0
            local = np.asarray(s.data)
            # ppermute-only path: bit-exact across process layouts
            np.testing.assert_array_equal(
                local, ref["pp_sample"][lo:lo + local.shape[0]])
            checked += local.shape[0]
        assert checked == 4, checked  # 4 of the 8 rungs live here

        particles, log_w, log_z = cases.run_smc(mesh)
        assert abs(log_z - float(ref["smc_log_z"])) < 1e-9, (
            log_z, float(ref["smc_log_z"]))
        checked = 0
        for arr, key in ((particles, "smc_particles"), (log_w, "smc_log_w")):
            for s in arr.addressable_shards:
                lo = s.index[0].start or 0
                local = np.asarray(s.data)
                # psum reduction order may differ across layouts: 1e-9 on f64
                np.testing.assert_allclose(local,
                                           ref[key][lo:lo + local.shape[0]],
                                           rtol=0, atol=1e-9)
                checked += local.shape[0]
        # half of each of the two arrays lives here
        assert checked == cases.SMC_PARTICLES, checked

        # --- dispatch x distributed interaction (round 5) ---
        # a kernel-eligible MLP config under this CPU multiprocess backend
        # must quietly resolve backend="auto" to scan, not error
        assert cases.run_mlp_dispatch_refusal()

    print(f"[p{pid}] PASS", flush=True)


if __name__ == "__main__":
    main()
