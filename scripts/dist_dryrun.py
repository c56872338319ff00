"""Two-process `jax.distributed` dry run of the multi-host code path.

The reference's operating point is 27-64 MPI ranks across nodes
(`/root/reference/parameters.sunnyvale:14-31`, `mpi_initialization.f90`);
this harness exercises the same MULTI-PROCESS topology without cluster
hardware: two OS processes, each with 4 virtual CPU devices, join one
`jax.distributed` runtime and jit the full PM sweep over the combined
2x2x2 global mesh.  Every collective in the sweep (ppermute halo
exchange, all_gather coarse solve, psum/pmax reductions) then crosses a
PROCESS boundary for at least one device pair — the part of the
multi-host path a single-process 8-device run never touches.

State creation uses `jax.make_array_from_callback` over the global
sharding — the multi-host analog of `shard_state`'s device_put, where
each process materializes only its addressable shards (the reference's
per-rank file-read role, `particle_initialization.f90:297-332`).

Run (spawns both workers):      python scripts/dist_dryrun.py
Run as one worker (internal):   python scripts/dist_dryrun.py --proc-id K
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_PROCS = 2
LOCAL_DEVICES = 4
COORD = "127.0.0.1:9911"


def worker(proc_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=NUM_PROCS,
                               process_id=proc_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu import kernels as kernels_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh
    from cubep3m_tpu.config import SimConfig

    assert len(jax.devices()) == NUM_PROCS * LOCAL_DEVICES, jax.devices()
    cfg = SimConfig(nodes_dim=2, tiles_node_dim=2, nf_tile=40,
                    nf_cutoff=8, buf_extra=4, box=20.0, shake=True,
                    pid=False, z_i=100.0)
    cfg.validate()
    mesh = make_sim_mesh(2)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)

    # identical global ICs on every process; each materializes only its
    # addressable shards
    rng = np.random.default_rng(0)
    n = 512 * 8
    x = rng.uniform(0, cfg.nf_physical_dim, (n, 3)).astype(np.float32)
    v = (0.1 * rng.normal(size=(n, 3))).astype(np.float32)
    st_host = state_mod.distribute_global(cfg, x, v)
    st_host = jax.tree.map(np.asarray, st_host)
    specs = step_mod.state_specs(mhd=False)

    def put(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    from jax.sharding import PartitionSpec as P
    st = jax.tree.map(put, st_host, specs,
                      is_leaf=lambda t: isinstance(t, P))

    sweep = step_mod.make_sweep(cfg, mesh)
    out = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c),
                jnp.float32(cfg.a_i), jnp.float32(0.1),
                jnp.float32(cfg.a_i * 1.01), jnp.float32(0.1),
                jnp.float32(0.1))
    jax.block_until_ready(out.x)
    # np_local is device-sharded; allgather the per-device counts so every
    # process checks the GLOBAL invariant (mpi_reduce role)
    from jax.experimental import multihost_utils
    counts = multihost_utils.process_allgather(out.np_local, tiled=True)
    total = int(np.asarray(counts).sum())
    assert total == n, f"particle count changed: {total} != {n}"
    # replicated scalars are addressable everywhere
    assert abs(float(out.a) - cfg.a_i * 1.01) < 1e-6
    assert np.isfinite(np.asarray(
        out.x.addressable_data(0))).all()
    if proc_id == 0:
        print(f"dist_dryrun OK: {NUM_PROCS} processes x {LOCAL_DEVICES} "
              f"devices, 2^3 global mesh, {n} particles conserved "
              f"through one fused sweep (cross-process ppermute + "
              f"all_gather + psum)", flush=True)
    jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc-id", type=int, default=None)
    args = ap.parse_args()
    if args.proc_id is not None:
        worker(args.proc_id)
        return
    procs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for i in range(NUM_PROCS):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc-id", str(i)],
            env=env, stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL))
    deadline = time.time() + 600
    rcs = []
    for p in procs:
        rcs.append(p.wait(timeout=max(10, deadline - time.time())))
    if any(rcs):
        raise SystemExit(f"dist_dryrun worker failures: rcs={rcs}")


if __name__ == "__main__":
    main()
