"""On-hardware MHD bench: cell-updates/sec for the TVD+CT gas step.

Times `mhd.tvd.gas_step` (the reference's forward+backward dimensional
sweep pair, mpi_tvd_mhd.f90:851-990 / cubepm.f90:113-131) on a 3-D
Orszag-Tang-like magnetized state — non-trivial fluxes in every cell, so
XLA cannot fold anything away.  Prints ONE JSON line:
  {"metric": "mhd cell-updates/sec at <nf>^3", "value": N, ...}

The reference has no logged MHD timing (BASELINE.md: the only measured
baseline is the 2007 pure-N-body paper run), so vs_baseline reports
cells/s against the same 1.86e5 particle-steps/s/node figure — the two
are not the same work unit, but it anchors the order of magnitude.

Run: python scripts/mhd_bench.py [--nf 128] [--reps 3] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def orszag_tang_3d(nf):
    """3-D extension of the Orszag-Tang vortex (z-perturbed so all three
    sweep axes carry flux), gamma=5/3 convention."""
    gamma = 5.0 / 3.0
    i = np.arange(nf, dtype=np.float32)
    x, y, z = np.meshgrid(*(2 * np.pi * (i + 0.5) / nf,) * 3,
                          indexing="ij")
    rho = np.full(x.shape, gamma ** 2 / (4 * np.pi), np.float32)
    p = np.full(x.shape, gamma / (4 * np.pi), np.float32)
    vx = -np.sin(y) * (1 + 0.1 * np.cos(z))
    vy = np.sin(x) * (1 + 0.1 * np.cos(z))
    vz = 0.1 * np.sin(z)
    b0 = 1.0 / np.sqrt(4 * np.pi)
    bx = -b0 * np.sin(y)
    by = b0 * np.sin(2 * x)
    bz = np.zeros_like(bx)
    u = np.stack([rho, rho * vx, rho * vy, rho * vz,
                  p / (gamma - 1) + 0.5 * rho * (vx ** 2 + vy ** 2
                                                 + vz ** 2)
                  + 0.5 * (bx ** 2 + by ** 2 + bz ** 2)])
    b = np.stack([bx, by, bz])
    return u.astype(np.float32), b.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cubep3m_tpu.mhd import tvd

    u, b = orszag_tang_3d(args.nf)
    u, b = jnp.asarray(u), jnp.asarray(b)
    gamma = 5.0 / 3.0

    @jax.jit
    def one(u, b):
        dt = tvd.calcfl(u, b, gamma=gamma)
        u, b = tvd.gas_step(u, b, dt, gamma=gamma)
        return u, b

    t0 = time.time()
    u1, b1 = one(u, b)
    # axon's block_until_ready returns early: fence via device_get
    np.asarray(jax.device_get(u1[0, 0, 0, :2]))
    print(f"# compile+first step: {time.time() - t0:.1f}s on "
          f"{jax.devices()[0].platform}", file=sys.stderr, flush=True)

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        u1, b1 = one(u1, b1)
        np.asarray(jax.device_get(u1[0, 0, 0, :2]))
        best = min(best, time.time() - t0)
    assert bool(np.isfinite(np.asarray(jax.device_get(u1)).sum()))
    cells = args.nf ** 3
    # gas_step advances 6 dimensional sweeps (fwd x,y,z + bwd z,y,x)
    rate = cells / best
    print(f"# {args.nf}^3 gas step: {best * 1e3:.1f} ms "
          f"({rate / 1e6:.2f}M cell-updates/s)", file=sys.stderr,
          flush=True)
    print(json.dumps({
        "metric": f"mhd cell-updates/sec at {args.nf}^3",
        "value": round(rate, 1), "unit": "cells/s",
        "vs_baseline": round(rate / 1.86e5, 2),
        "step_ms": round(best * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
