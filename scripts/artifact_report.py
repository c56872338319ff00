"""Acceptance-artifact report: turn a validate_lcdm npz into the tables
VALIDATION.md publishes (reference methodology: utils/cic_power for P(k),
utils/PSvsSim/PS_ST_sim.f90 for the mass-function comparison).

Prints:
  * P(k) rows (log-spaced over populated bins): sim vs linear theory vs
    HALOFIT (Takahashi 2012) with ratios and mode counts;
  * mode-weighted band ratios (sim/lin at k<0.3; sim/halofit over
    0.3-1, 1-3, 3-8 h/Mpc);
  * halo mass function vs Sheth-Tormen at the artifact's a_final.

Run: python scripts/artifact_report.py bench_logs/validate_lcdm_256_z1_r4.npz \
        --np-dim 256 [--box 100]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--np-dim", type=int, required=True)
    ap.add_argument("--box", type=float, default=100.0)
    ap.add_argument("--min-particles", type=float, default=100.0,
                    help="mass-function completeness cut (the reference's "
                         "PSvsSim plots use >=100-particle halos)")
    ap.add_argument("--rows", type=int, default=10)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu.ic import transfer as tr
    from cubep3m_tpu.analysis import halofit as hft
    from cubep3m_tpu.analysis import massfunc as mf

    d = np.load(args.npz)
    a = float(d["a_final"])
    k, d2, nm = d["k"], d["delta2"], d["nmodes"]
    # older artifacts predate the stored theory columns — recompute
    cosmo = SimConfig(nodes_dim=1, tiles_node_dim=2, nf_tile=96,
                      nf_cutoff=16, buf_extra=0, box=args.box).cosmo
    lin = tr.linear_power(cosmo, min(a, 1.0))
    lin2 = d["lin_delta2"] if "lin_delta2" in d else lin.delta2(k)
    nl2 = (d["nl_delta2"] if "nl_delta2" in d
           else hft.nonlinear_delta2(lin, k))
    print(f"# {args.npz}: n_steps={int(d['n_steps'])} a_final={a:.4f} "
          f"z={1 / a - 1:.3f} halos={d['halo_mass'].size}")

    ok = (d2 > 0) & (nm > 0) & (lin2 > 0)
    idx = np.where(ok)[0]
    print(f"\n# P(k): sim vs linear vs HALOFIT "
          f"({idx.size} populated bins)")
    print(f"{'k':>7} {'D2_sim':>9} {'D2_lin':>9} {'sim/lin':>8} "
          f"{'D2_hfit':>9} {'sim/hfit':>8} {'modes':>8}")
    if idx.size:
        for i in idx[np.unique(
                np.geomspace(1, idx.size, args.rows).astype(int) - 1)]:
            print(f"{k[i]:7.3f} {d2[i]:9.4g} {lin2[i]:9.4g} "
                  f"{d2[i] / lin2[i]:8.3f} {nl2[i]:9.4g} "
                  f"{d2[i] / nl2[i]:8.3f} {int(nm[i]):8d}")
    for lo, hi, theory, name in [(0.0, 0.3, lin2, "sim/lin k<0.3"),
                                 (0.0, 0.3, nl2, "sim/halofit k<0.3"),
                                 (0.3, 1.0, nl2, "sim/halofit 0.3-1"),
                                 (1.0, 3.0, nl2, "sim/halofit 1-3"),
                                 (3.0, 8.0, nl2, "sim/halofit 3-8")]:
        s = ok & (k >= lo) & (k < hi)
        if not s.any():
            print(f"# weighted {name}: no bins")
            continue
        r = np.average(d2[s] / theory[s], weights=nm[s])
        print(f"# weighted {name}: {r:.4f}")

    # --- halo mass function vs Sheth-Tormen at a_final ------------------
    nf = 2 * args.np_dim
    cfg = SimConfig(nodes_dim=1, tiles_node_dim=2, nf_tile=nf // 2 + 32,
                    nf_cutoff=16, buf_extra=0, box=args.box)
    meas = mf.measured_dndlnm(cfg, d["halo_mass"], nbins=12,
                              min_particles=args.min_particles)
    st = mf.theory_dndlnm(meas.m, cfg.cosmo, a=a, kind="st")
    print(f"\n# mass function vs Sheth-Tormen at a={a:.4f} "
          f"(>={args.min_particles:.0f}-particle halos, "
          f"m_unit={mf.m_grid_to_msun(cfg):.3g} Msun/h)")
    print(f"{'M [Msun/h]':>11} {'N':>6} {'dn/dlnM':>10} {'ST':>10} "
          f"{'sim/ST':>7}")
    for i in range(meas.m.size):
        if meas.counts[i] < 3:
            continue
        print(f"{meas.m[i]:11.3g} {int(meas.counts[i]):6d} "
              f"{meas.dndlnm[i]:10.3g} {st[i]:10.3g} "
              f"{meas.dndlnm[i] / st[i]:7.2f}")


if __name__ == "__main__":
    main()
