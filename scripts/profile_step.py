"""Per-phase timing of the sweep (timers.f90 / mpi_time_analyze role).

Runs each phase as its own jitted function with host-fenced timing:
sort, packed reorder, NGP deposit, fine FFT force (tiled beyond nf=512),
NGP gather+kick, PPINT band, coarse CIC variants + FFT + gather, particle
exchange.  Phases overlap work that the fused sweep amortizes, so the sum
exceeds the fused step time — use for relative weights.

Run: python scripts/profile_step.py [--np-dim 128] [--cpu] [--bench]
`--bench` mirrors bench.py's exact config (tight buffers, tiled fine FFTs)
so the weights map one-to-one onto the headline step.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np-dim", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bench", action="store_true",
                    help="mirror bench.py's config (nf_buf=16, buffer 1.05, "
                         "tiled fine FFTs) instead of the validation config")
    ap.add_argument("--skip", default="",
                    help="comma-separated phase substrings to skip")
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu import kernels as km
    from cubep3m_tpu.ops import binning, deposit, fftconv, pp
    from cubep3m_tpu.core.step import fold_pads

    nf_dim = 2 * args.np_dim
    if args.bench:
        fft_tiles = max(1, nf_dim // 256)
        cfg = SimConfig(nodes_dim=1, tiles_node_dim=2,
                        nf_tile=nf_dim // 2 + 2 * 16, nf_cutoff=16,
                        buf_extra=0, density_buffer=1.05, shake=False,
                        pid=False, fine_fft_tiles=fft_tiles)
    else:
        fft_tiles = max(1, nf_dim // 256)
        cfg = SimConfig(nodes_dim=1, tiles_node_dim=2,
                        nf_tile=nf_dim // 2 + 2 * 32, nf_cutoff=16,
                        buf_extra=16, density_buffer=1.3, shake=False,
                        pid=False, fine_fft_tiles=fft_tiles)
    cfg.validate()
    nf = cfg.nf_physical_node_dim
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    print(f"# {cfg.summary()}", file=sys.stderr, flush=True)

    kern_f, kern_c = km.build_kernels(cfg)
    kern_f = jnp.asarray(kern_f)
    kern_c = jnp.asarray(kern_c)

    rng = np.random.default_rng(0)
    n = cfg.np_total
    cap = cfg.max_np
    x_h = np.zeros((cap, 3), np.float32)
    x_h[:n] = rng.uniform(0, nf, (n, 3))
    x = jnp.asarray(x_h)
    valid = jnp.arange(cap) < n
    w = jnp.where(valid, jnp.float32(cfg.mass_p), 0.0)
    skip = [s for s in args.skip.split(",") if s]

    def sync(out):
        # axon's block_until_ready returns early; materializing bytes to
        # host is the only reliable fence
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *a):
        if any(s in name for s in skip):
            print(f"{name:>24}:   skipped", flush=True)
            return None
        t0 = time.time()
        out = fn(*a)           # compile
        sync(out)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*a)
            sync(out)
        dt = (time.time() - t0) / args.reps
        print(f"{name:>24}: {dt * 1e3:9.2f} ms   (compile {tc:.1f}s)",
              flush=True)
        return out

    sort_fn = jax.jit(lambda xx: binning.sort_by_cell(xx, valid, nf))
    sp = timeit("sort_by_cell", sort_fn, x)

    # packed reorder: x/v/pid travel as ONE (N,7) row gather in the sweep
    packed = jnp.concatenate([x, x, x[:, :1]], axis=1)
    reord = jax.jit(lambda p, o: p[o])
    timeit("packed (N,7) reorder", reord, packed, sp.order)
    xs = x[sp.order]

    dep = jax.jit(lambda xx: deposit.ngp_deposit(
        xx, w, (nf, nf, nf), sorted_cells=True))
    rho = timeit("ngp_deposit(sorted)", dep, xs)

    if cfg.fine_fft_tiles > 1:
        t = cfg.fine_fft_tiles
        ff = jax.jit(lambda r, kf: fftconv.fine_force_tiled(
            jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf, nf, t))
        f_fine = timeit(f"fine FFT force ({t}^3 tiles)", ff, rho, kern_f)
    else:
        ff = jax.jit(lambda r, kf: fftconv.fine_force(
            jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf, nf))
        f_fine = timeit("fine pad+FFT force", ff, rho, kern_f)

    gath = jax.jit(lambda f, xx: deposit.ngp_gather(f, xx))
    timeit("ngp_gather", gath, f_fine, xs)
    del f_fine

    ppf = jax.jit(lambda xx: pp.ppint_band_force(
        xx, sp.cell, sp.rank, nf ** 3, 32, cfg.mass_p, cfg.rsoft,
        cfg.pp_bias).force)
    timeit("ppint_band(32) xla", ppf, xs)

    if jax.default_backend() != "cpu":
        from cubep3m_tpu.ops import pp_pallas
        ppp = jax.jit(lambda xx: pp_pallas.ppint_band_force_pallas(
            xx, sp.cell, 32, cfg.mass_p, cfg.rsoft, cfg.pp_bias))
        timeit("ppint_band(32) pallas", ppp, xs)

    # coarse mesh section, both deposit strategies
    ncp = nc + 2

    def coarse_plain_dep(xx):
        return fold_pads(deposit.cic_deposit(
            xx, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1)

    rc = timeit("coarse cic_deposit (8-scatter)", jax.jit(coarse_plain_dep),
                xs)

    def coarse_corner_dep(xx):
        return fold_pads(deposit.cic_deposit_corner(
            xx, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1)

    timeit("coarse cic_deposit (corner)", jax.jit(coarse_corner_dep), xs)

    fc = timeit("coarse FFT force", jax.jit(
        lambda r, kc: fftconv.coarse_force(r, kc)), rc, kern_c)

    def coarse_gather(f, xx):
        fcp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap")
        return deposit.cic_gather_corner(fcp, xx, scale=ms, offset=-0.5,
                                         pad=1)

    timeit("coarse corner gather", jax.jit(coarse_gather), fc, xs)

    from cubep3m_tpu.parallel import exchange as ex_mod
    pid0 = jnp.zeros((cap,), jnp.int32)

    def exch(xx):
        return ex_mod.exchange_particles(xx, xx, pid0, valid, nf,
                                         max(256, cap // 16),
                                         compact=False)

    timeit("exchange(no-compact)", jax.jit(exch), x)


if __name__ == "__main__":
    main()
