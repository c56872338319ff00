"""Per-phase timing of the sweep (timers.f90 / mpi_time_analyze role).

Runs each phase as its own jitted function with host-fenced timing:
sort, packed reorder, NGP deposit, fine FFT force (tiled beyond nf=512),
NGP gather+kick, PPINT band, coarse CIC variants + FFT + gather, particle
exchange.  Phases overlap work that the fused sweep amortizes, so the sum
exceeds the fused step time — use for relative weights.

Device memory hygiene matters at 256^3 (17.6M particles on a 16 GB chip):
sorted inputs are prepared on the HOST (numpy argsort) so no phase depends
on another phase's device outputs, every (N,3) array reaches the device as
a compact jit input, and each phase's outputs are dropped before the next.
`--only sort,fine,...` times a subset in a fresh process (the tunnel's
remote compiler has no persistent cache, ~3-7 min per phase compile).

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
    ap.add_argument("--only", default="",
                    help="comma-separated phase keys to run (default all): "
                         "sort,reorder,deposit,depositrk,fine,gather,"
                         "gatherrk,pp,ppallas,coarse8,coarsecorner,"
                         "coarsefft,coarsegather,exchange")
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
    fft_tiles = max(1, nf_dim // 256)
    if args.bench:
        cfg = SimConfig(nodes_dim=1, tiles_node_dim=2,
                        nf_tile=nf_dim // 2 + 2 * 16, nf_cutoff=16,
                        buf_extra=0, density_buffer=1.05, shake=False,
                        pid=False, fine_fft_tiles=fft_tiles)
    else:
        cfg = SimConfig(nodes_dim=1, tiles_node_dim=2,
                        nf_tile=nf_dim // 2 + 2 * 32, nf_cutoff=16,
                        buf_extra=16, density_buffer=1.3, shake=False,
                        pid=False, fine_fft_tiles=fft_tiles)
    cfg.validate()
    nf = cfg.nf_physical_node_dim
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    print(f"# {cfg.summary()}", file=sys.stderr, flush=True)

    only = [s for s in args.only.split(",") if s]

    def want(key):
        return not only or key in only

    rng = np.random.default_rng(0)
    n = cfg.np_total
    cap = cfg.max_np

    # ---- host-side prep: sorted positions + cell keys + ranks ----
    x_h = np.zeros((cap, 3), np.float32)
    x_h[:n] = rng.uniform(0, nf, (n, 3))
    key_h = np.full(cap, nf ** 3, np.int64)
    c = np.floor(x_h[:n]).astype(np.int64)
    key_h[:n] = (c[:, 0] * nf + c[:, 1]) * nf + c[:, 2]
    order_h = np.argsort(key_h, kind="stable").astype(np.int32)
    skey_h = key_h[order_h].astype(np.int32)
    xs_h = x_h[order_h]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(skey_h)) + 1])
    rank_h = (np.arange(cap) - np.repeat(
        starts, np.diff(np.concatenate([starts, [cap]])))).astype(np.int32)

    import jax
    import jax.numpy as jnp
    valid = jnp.arange(cap) < n
    w = jnp.where(valid, jnp.float32(cfg.mass_p), 0.0)

    def sync(out):
        # axon's block_until_ready returns early; materializing bytes to
        # host is the only reliable fence
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *a):
        # a failed phase must not kill the whole profile (r4d: the seg
        # kernel's remote-compile HTTP 500 aborted profile256 after only
        # half the phases); note that on axon a failed COMPILE can poison
        # later compiles in-process, so phases known to fail on real TPU
        # are additionally gated at their call sites
        try:
            t0 = time.time()
            out = fn(*a)           # compile
            sync(out)
            tc = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                out = fn(*a)
                sync(out)
            dt = (time.time() - t0) / args.reps
            print(f"{name:>28}: {dt * 1e3:9.2f} ms   (compile {tc:.1f}s)",
                  flush=True)
            del out
        except Exception as e:
            print(f"{name:>28}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    if want("sort"):
        x = jnp.asarray(x_h)
        sort_fn = jax.jit(lambda xx: binning.sort_by_cell(xx, valid, nf))
        timeit("sort_by_cell", sort_fn, x)
        del x

    if want("reorder"):
        # packed reorder: x/v/pid travel as ONE (N,7) row gather
        packed = jnp.asarray(np.concatenate(
            [x_h, x_h, x_h[:, :1]], axis=1))
        order = jnp.asarray(order_h)
        timeit("packed (N,7) reorder", jax.jit(lambda p, o: p[o]),
               packed, order)
        del packed, order

    xs = jnp.asarray(xs_h)

    if want("deposit"):
        dep = jax.jit(lambda xx: deposit.ngp_deposit(
            xx, w, (nf, nf, nf), sorted_cells=True))
        timeit("ngp_deposit(sorted)", dep, xs)

    if want("depositrk") or want("gatherrk"):
        # ranked streaming-window Pallas kernels (ops/fine_pallas.py);
        # lowering failures must not kill the rest of the table
        from cubep3m_tpu.experiments import fine_pallas
        skey = jnp.asarray(skey_h)
        if want("depositrk"):
            try:
                deprk = jax.jit(lambda k, ww: fine_pallas.ngp_deposit_ranked(
                    k, ww, (nf, nf, nf), interpret=args.cpu))
                timeit("ngp_deposit (RANKED)", deprk, skey, w)
            except Exception as e:  # noqa: BLE001
                print(f"       ngp_deposit (RANKED): FAILED {e!r}",
                      flush=True)
        if want("gatherrk"):
            try:
                fld = jnp.asarray(rng.normal(
                    size=(3, nf, nf, nf)).astype(np.float32))
                gatrk = jax.jit(lambda f, k, ww:
                                fine_pallas.ngp_gather_ranked(
                                    f, k, ww, interpret=args.cpu))
                timeit("ngp_gather (RANKED)", gatrk, fld, skey, w)
                del fld
            except Exception as e:  # noqa: BLE001
                print(f"        ngp_gather (RANKED): FAILED {e!r}",
                      flush=True)
        del skey

    if want("fine") or want("gather"):
        kern_f, _ = km.build_kernels(cfg)
        kern_f = jnp.asarray(kern_f)
        rho = jax.jit(lambda xx: deposit.ngp_deposit(
            xx, w, (nf, nf, nf), sorted_cells=True))(xs)
        if cfg.fine_fft_tiles > 1:
            t = cfg.fine_fft_tiles
            ff = jax.jit(lambda r, kf: fftconv.fine_force_tiled(
                jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf, nf, t))
            name = f"fine FFT force ({t}^3 tiles)"
        else:
            ff = jax.jit(lambda r, kf: fftconv.fine_force(
                jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf, nf))
            name = "fine pad+FFT force"
        if want("fine"):
            timeit(name, ff, rho, kern_f)
        if want("finemm"):
            t = cfg.fine_fft_tiles
            if t > 1:
                fmm = jax.jit(lambda r, kf: fftconv.fine_force_tiled(
                    jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf,
                    nf, t, use_mm=True))
            else:
                fmm = jax.jit(lambda r, kf: fftconv.fine_force(
                    jnp.pad(r, cfg.nf_buf, mode="wrap"), kf, cfg.nf_buf,
                    nf, use_mm=True))
            timeit("fine force (matmul DFT)", fmm, rho, kern_f)
        if want("gather"):
            f_fine = ff(rho, kern_f)
            del rho
            gath = jax.jit(lambda f, xx: deposit.ngp_gather(f, xx))
            timeit("ngp_gather", gath, f_fine, xs)
            del f_fine
        else:
            del rho
        del kern_f

    cell = jnp.asarray(skey_h)
    rank = jnp.asarray(rank_h)

    if want("pp"):
        ppf = jax.jit(lambda xx: pp.ppint_band_force(
            xx, cell, rank, nf ** 3, 32, cfg.mass_p, cfg.rsoft,
            cfg.pp_bias).force)
        timeit("ppint_band(32) xla", ppf, xs)

    if want("ppallas") and jax.default_backend() != "cpu":
        from cubep3m_tpu.ops import pp_pallas
        ppp = jax.jit(lambda xx: pp_pallas.ppint_band_force_pallas(
            xx, cell, 32, cfg.mass_p, cfg.rsoft, cfg.pp_bias))
        timeit("ppint_band(32) pallas", ppp, xs)

    del cell, rank

    # coarse mesh section, both deposit strategies
    ncp = nc + 2

    if want("coarse8"):
        dep8 = jax.jit(lambda xx: fold_pads(deposit.cic_deposit(
            xx, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1))
        timeit("coarse cic_deposit (8-scatter)", dep8, xs)

    if want("coarsecorner"):
        depc = jax.jit(lambda xx: fold_pads(deposit.cic_deposit_corner(
            xx, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1))
        timeit("coarse cic_deposit (corner)", depc, xs)

    if (want("coarsekeysort") or want("coarsesorteddep")
            or want("coarsesortedgath") or want("coarseseg")):
        # host-prep a COARSE-key-sorted copy (cfg.coarse_sort pipeline)
        ckey_h = np.full(cap, ncp ** 3, np.int64)
        b = np.clip(np.floor(x_h[:n] / ms - 0.5).astype(np.int64) + 1, 0,
                    ncp - 2)
        ckey_h[:n] = (b[:, 0] * ncp + b[:, 1]) * ncp + b[:, 2]
        cord_h = np.argsort(ckey_h, kind="stable")
        xc = jnp.asarray(x_h[cord_h])
        vc = jnp.asarray(ckey_h[cord_h] < ncp ** 3)
        wc = jnp.where(vc, jnp.float32(cfg.mass_p), 0.0)

        if want("coarsekeysort"):
            ks = jax.jit(lambda xx: jnp.argsort(deposit.cic_base_key(
                xx, (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
                valid=valid)))
            timeit("coarse key+argsort", ks, jnp.asarray(x_h))

        if want("coarsecsum"):
            # production cfg.coarse_sort deposit: segmented csum with run
            # boundaries pooled from the fine NGP histogram (which the
            # sweep already computed for the fine deposit — free here)
            hist_d = jax.jit(lambda xx: deposit.ngp_deposit(
                xx, jnp.where(valid, 1.0, 0.0), (nf, nf, nf),
                sorted_cells=True))(xs)

            def depcs(xx, h):
                counts = deposit.coarse_counts_from_fine_hist(
                    h, ms, 1).reshape(-1)
                return fold_pads(deposit.cic_deposit_corner_csum_t(
                    xx.T, wc, (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
                    counts=counts), 1)

            timeit("coarse deposit (csum+pool)", jax.jit(depcs), xc,
                   hist_d)
            del hist_d

        # the seg kernel's dynamic lane-dim column RMW fails Mosaic
        # lowering on real TPUs (config.coarse_pallas doc) and the HTTP
        # 500 from the remote compile helper can wedge the tunneled
        # worker (campaign_r4d.log 14:52) — run it only when explicitly
        # requested or on CPU (interpret-capable) backends
        if want("coarseseg") and ("coarseseg" in only
                                  or jax.default_backend() == "cpu"):
            from cubep3m_tpu.experiments import deposit_pallas as dpp
            segd = jax.jit(lambda xx: fold_pads(dpp.cic_deposit_corner_seg(
                xx.T, wc, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1))
            timeit("coarse deposit (PALLAS seg)", segd, xc)

        if want("coarsesorteddep"):
            deps = jax.jit(lambda xx: fold_pads(deposit.cic_deposit_corner(
                xx, wc, (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
                valid=vc, sorted_cells=True), 1))
            timeit("coarse cic_deposit (SORTED)", deps, xc)

        if want("coarsesortedgath"):
            _, kern_c2 = km.build_kernels(cfg)
            rc2 = jax.jit(lambda xx: fold_pads(deposit.cic_deposit(
                xx, wc, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1))(xc)
            fc2 = jax.jit(fftconv.coarse_force)(rc2, jnp.asarray(kern_c2))
            del rc2

            def gat(f, xx):
                fcp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (1, 1)),
                              mode="wrap")
                return deposit.cic_gather_corner(fcp, xx, scale=ms,
                                                 offset=-0.5, pad=1,
                                                 valid=vc,
                                                 sorted_cells=True)

            timeit("coarse gather (SORTED)", jax.jit(gat), fc2, xc)
            del fc2
        del xc, vc, wc

    if want("coarsefft") or want("coarsegather"):
        _, kern_c = km.build_kernels(cfg)
        kern_c = jnp.asarray(kern_c)
        rc = jax.jit(lambda xx: fold_pads(deposit.cic_deposit(
            xx, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1), 1))(xs)
        cf = jax.jit(lambda r, kc: fftconv.coarse_force(r, kc))
        if want("coarsefft"):
            timeit("coarse FFT force", cf, rc, kern_c)
        if want("coarsegather"):
            fc = cf(rc, kern_c)

            def coarse_gather(f, xx):
                fcp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (1, 1)),
                              mode="wrap")
                return deposit.cic_gather_corner(fcp, xx, scale=ms,
                                                 offset=-0.5, pad=1)

            timeit("coarse corner gather", jax.jit(coarse_gather), fc, xs)
            del fc
        del rc, kern_c

    if want("exchange"):
        from cubep3m_tpu.parallel import exchange as ex_mod
        pid0 = jnp.zeros((cap,), jnp.int32)
        x = jnp.asarray(x_h)

        def exch(xx):
            return ex_mod.exchange_particles(xx, xx, pid0, valid, nf,
                                             max(256, cap // 16),
                                             compact=False)

        timeit("exchange(no-compact)", jax.jit(exch), x)


if __name__ == "__main__":
    main()
