"""Force-accuracy measurement: the north-star 'RMS force error vs direct
summation' metric (BASELINE.json; reference harnesses report_pair.f90 +
report_force.f90).

Runs two harnesses on a production-geometry config (nf_cutoff=16) and
prints one JSON line:

* pair sweep (report_pair role): fractional error of the two-particle
  force against exact -mass_p/r^2 over separations/orientations;
* superposition (report_force role): remove one particle from a clustered
  realization; the force difference on every other particle must equal the
  removed particle's direct softened 1/r^2 contribution.  RMS is quoted
  over particles within nf/4 of the removed one (beyond that the direct
  term vanishes against the periodic mesh force and the ratio is
  ill-conditioned, as in the reference's pair_F.dat usage).

Usage: python scripts/force_accuracy.py [--cpu] [--pp-ext] [--np 4000]
Results are recorded in VALIDATION.md.
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pp-ext", action="store_true")
    ap.add_argument("--np", type=int, default=4000)
    ap.add_argument("--cap", type=int, default=512,
                    help="pp_ext coarse bucket capacity")
    ap.add_argument("--clump-scale", type=float, default=2.0)
    ap.add_argument("--skip-pair-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu import kernels as kernels_mod
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.analysis import forcetest as ft

    cfg = SimConfig(nodes_dim=1, tiles_node_dim=2, nf_tile=96, nf_cutoff=16,
                    buf_extra=16, box=50.0, shake=False, pid=False,
                    cosmo_expansion=False, pp=True, pp_ext=args.pp_ext,
                    # the clustered superposition realization packs
                    # hundreds of particles per coarse cell; undersized
                    # buckets would silently drop pp_ext pairs
                    pp_coarse_capacity=args.cap)
    cfg.validate()
    kf, kc = kernels_mod.build_kernels(cfg)
    kf, kc = jnp.asarray(kf), jnp.asarray(kc)
    nf = cfg.nf_physical_node_dim

    # --- pair sweep ---------------------------------------------------
    pair, bins = None, None
    if not args.skip_pair_sweep:
        res = ft.pairwise_force_sweep(cfg, kf, kc, min_sep=0.3,
                                      max_sep=16.0, n_sep=24, n_orient=6)
        e = res.frac_err
        pair = {"rms": float(np.sqrt((e ** 2).mean())),
                "median": float(np.median(e)),
                "p95": float(np.percentile(e, 95))}
        bins = {}
        for lo, hi in ((0.3, 1), (1, 2), (2, 4), (4, 8), (8, 16)):
            m = (res.sep >= lo) & (res.sep < hi)
            bins[f"[{lo},{hi})"] = {
                "rms": float(np.sqrt((e[m] ** 2).mean())),
                "median": float(np.median(e[m]))}

    # --- superposition vs direct sum -----------------------------------
    rng = np.random.default_rng(17)
    n_cl = args.np // 2
    n_bg = args.np - n_cl
    center = np.full(3, nf / 2.0) + 0.25
    x = np.vstack([
        center + rng.normal(scale=args.clump_scale, size=(n_cl, 3)),
        rng.uniform(0, nf, (n_bg, 3))]).astype(np.float32) % nf
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    sp = ft.superposition_test(cfg, st, kf, kc)
    i = sp.removed_index
    sep = x - x[i]
    sep -= nf * np.round(sep / nf)
    r = np.linalg.norm(sep, axis=1)
    near = (r > cfg.rsoft) & (r < nf / 4.0)
    en = sp.frac_err[near]
    sup = {"rms": float(np.sqrt((en ** 2).mean())),
           "median": float(np.median(en)),
           "p95": float(np.percentile(en, 95)),
           "n": int(near.sum())}

    print(json.dumps({
        "metric": "rms-force-error-vs-direct",
        "value": sup["rms"],
        "unit": "fractional",
        "pp_ext": args.pp_ext,
        "pair_sweep": pair, "pair_sweep_bins": bins,
        "superposition": sup}))


if __name__ == "__main__":
    main()
