"""512^3 north-star smoke: the FULL-SCALE production configuration on an
8-virtual-device CPU mesh.

ROADMAP's sizing note argues the 512^3 / 2x2x2-mesh deployment is the
proven 256^3 single-chip configuration per device (same 288^3 fine-FFT
tiles, 256^3-per-device coarse grid, ~19.3M particle slots).  The driver's
`dryrun_multichip` proves the sharded program at TINY shapes; this script
proves it at the REAL ones: 134,217,728 particles through complete sweeps
(exchange, deposits, tile FFT solve, coarse solve + halo, PP, kick, drift)
with conservation checks.  CPU-only and slow (~tens of minutes) — a
hardware-independent compile-and-execute proof of the north-star shapes.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/smoke512.py [--np-dim 512] [--steps 2]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np-dim", type=int, default=512)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--nodes-dim", type=int, default=2)
    ap.add_argument("--seed", type=int, default=12)
    args = ap.parse_args()

    nd = args.nodes_dim
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={nd ** 3}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.core.driver import Simulation

    nf = 2 * args.np_dim
    # the bench-proven per-device geometry (288^3 tiles, nf_buf=16)
    cfg = SimConfig(nodes_dim=nd, tiles_node_dim=2,
                    nf_tile=nf // (2 * nd) + 32, nf_cutoff=16, buf_extra=0,
                    density_buffer=1.15, shake=True, pid=True,
                    fine_fft_tiles=max(1, nf // (256 * nd)),
                    coarse_sort=True)
    cfg.validate()
    print(f"# {cfg.summary()}", flush=True)

    t0 = time.time()
    rng = np.random.default_rng(args.seed)
    npd = args.np_dim
    lat = np.stack(np.meshgrid(*([np.arange(npd, dtype=np.float32)] * 3),
                               indexing="ij"), axis=-1).reshape(-1, 3)
    x = (lat * (nf / npd) + rng.uniform(0.2, 1.8, lat.shape)
         .astype(np.float32)) % nf
    v = rng.normal(scale=0.05, size=lat.shape).astype(np.float32)
    del lat
    print(f"# ICs built on host in {time.time() - t0:.1f}s "
          f"({x.shape[0]:,} particles)", flush=True)

    t0 = time.time()
    sim = Simulation(cfg)
    print(f"# kernels + mesh in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    st = state_mod.distribute_global(cfg, x, v)
    del x, v
    st = step_mod.shard_state(st, sim.mesh)
    n0 = int(np.asarray(jax.device_get(st.np_local)).sum())
    print(f"# distributed in {time.time() - t0:.1f}s; np_total={n0:,}",
          flush=True)

    for i in range(args.steps):
        t0 = time.time()
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.5, 1.0,
                       0.5 * (i + 1), 0.5 * (i + 1))
        nloc = np.asarray(jax.device_get(st.np_local))  # fences the step
        dt_wall = time.time() - t0
        rate = n0 / dt_wall
        print(f"# sweep {i}: wall={dt_wall:.1f}s ({rate / 1e6:.2f}M "
              f"p-steps/s on the CPU mesh) np={nloc.sum():,} "
              f"pp_ovfl={int(st.pp_overflow)} "
              f"ex_ovfl={int(st.exchange_overflow)} "
              f"clamp={int(st.clamp_count)}", flush=True)
        assert int(nloc.sum()) == n0, "particle count not conserved"

    vrms = float(np.asarray(jax.device_get(
        (st.v ** 2).sum(axis=1).mean())) ** 0.5)
    assert np.isfinite(vrms)
    print(f"# OK: {args.steps} full sweeps at {args.np_dim}^3 on the "
          f"{nd}^3 virtual mesh; v_rms={vrms:.4f}", flush=True)


if __name__ == "__main__":
    main()
