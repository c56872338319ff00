"""Compare two validate_lcdm.py output files (P(k) + halo mass function).

Use case: the BASELINE config-3 acceptance check — the pp_ext build vs the
default PPINT build on the same box/seed.  The reference's own methodology
(utils/cic_power + PSvsSim, SURVEY.md §4.4): the two force stacks must agree
on quasi-linear scales and differ only by the expected small-scale power
boost from the tighter sub-cutoff force (pp_ext closes the NGP-quantized
short range pair-by-pair; VALIDATION.md force-error tables).

Run: python scripts/compare_validations.py A.npz B.npz [--label-a ...]
"""
import argparse

import numpy as np


def shared_edges(mass_a, mass_b, nbins=8):
    """Shared log-mass edges over the combined range of both catalogs, so
    side-by-side rows compare counts over the SAME mass bins."""
    m = np.concatenate([np.asarray(mass_a, dtype=np.float64).ravel(),
                        np.asarray(mass_b, dtype=np.float64).ravel()])
    m = m[m > 0]
    if m.size == 0:
        return np.zeros(0)
    lo, hi = np.log10(m.min()), np.log10(m.max()) + 1e-6
    return np.logspace(lo, hi, nbins + 1)


def mass_function(mass, edges):
    """Log-binned halo counts (grid mass units) on the given shared edges."""
    m = np.asarray(mass, dtype=np.float64)
    m = m[m > 0]
    if edges.size == 0:
        return np.zeros(0), np.zeros(0, dtype=int)
    counts, _ = np.histogram(m, bins=edges)
    centers = np.sqrt(edges[:-1] * edges[1:])
    return centers, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    args = ap.parse_args()

    da = np.load(args.a, allow_pickle=True)
    db = np.load(args.b, allow_pickle=True)
    la, lb = args.label_a, args.label_b

    print(f"# {la}: {args.a}  steps={int(da['n_steps'])} "
          f"a_final={float(da['a_final']):.4f} halos={da['halo_mass'].size}")
    print(f"# {lb}: {args.b}  steps={int(db['n_steps'])} "
          f"a_final={float(db['a_final']):.4f} halos={db['halo_mass'].size}")

    # --- P(k) ratio on the common k grid -------------------------------
    ka, kb = da["k"], db["k"]
    if ka.shape == kb.shape and np.allclose(ka, kb):
        d2a, d2b, nm = da["delta2"], db["delta2"], da["nmodes"]
        ok = (d2a > 0) & (d2b > 0) & (nm > 0)
        print(f"\n# Delta^2_{lb} / Delta^2_{la} (same k grid; "
              "ratio >1 = more power in B)")
        print(f"{'k':>8} {'D2_' + la:>10} {'D2_' + lb:>10} {'ratio':>7} "
              f"{'nmodes':>7}")
        # ~10 representative rows, log-spaced over the populated bins
        idx = np.where(ok)[0]
        if idx.size:
            for i in idx[np.unique(
                    np.geomspace(1, idx.size, 12).astype(int) - 1)]:
                print(f"{ka[i]:8.3f} {d2a[i]:10.4g} {d2b[i]:10.4g} "
                      f"{d2b[i] / d2a[i]:7.3f} {int(nm[i]):7d}")
        else:
            print("# (no common populated bins)")
        for kmax, name in [(0.3, "quasi-linear k<0.3"),
                           (1.0, "k<1"), (np.inf, "all k")]:
            s = ok & (ka < kmax)
            if not s.any():
                print(f"# weighted mean ratio ({name}): no bins")
                continue
            r = np.average(d2b[s] / d2a[s], weights=da["nmodes"][s])
            print(f"# weighted mean ratio ({name}): {r:.4f}")
    else:
        print("# k grids differ; skipping P(k) ratio")

    # --- halo mass function (shared bins — counts are comparable) ------
    edges = shared_edges(da["halo_mass"], db["halo_mass"])
    ca, na = mass_function(da["halo_mass"], edges)
    cb, nb_ = mass_function(db["halo_mass"], edges)
    print(f"\n# halo mass function (shared grid-mass log bins, counts)")
    print(f"{'M_' + la:>10} {'N_' + la:>6}    {'M_' + lb:>10} {'N_' + lb:>6}")
    for i in range(max(len(na), len(nb_))):
        sa = f"{ca[i]:10.3g} {na[i]:6d}" if i < len(na) else " " * 17
        sb = f"{cb[i]:10.3g} {nb_[i]:6d}" if i < len(nb_) else ""
        print(f"{sa}    {sb}")


if __name__ == "__main__":
    main()
