"""Cross-code comparison harness: Fortran cubep3m snapshots vs ours.

BASELINE.md's north star asks for "P(k) within 1% of the Fortran
reference".  The Fortran build cannot run in this environment, so this
harness makes the claim FALSIFIABLE the day a reference snapshot exists:
point it at a directory of Fortran-produced `{z}xv{rank}.dat` stream
binaries (checkpoint.f90:73-95 -DBINARY layout; the `utils/cic_power`
family consumes the same files, cic_power.f90:151-240) and it

1. ingests them with `io.checkpoint.read_reference_checkpoint`
   (header + shake-subtracted xv; no aux sidecar expected from Fortran),
2. measures P(k) with the reference's estimator conventions
   (CIC deposit, window deconvolution, shot-noise subtraction —
   cic_power.f90:655-738 darkmatter()/powerspectrum() roles) and the
   FoF-equivalent spherical-overdensity halo mass function,
3. compares against OUR artifact — a validate_lcdm.py npz, another
   snapshot directory, or a native .npz checkpoint — on the common k
   grid, and emits the pass/fail ratio table for the <1% contract.

Run:
  python scripts/crosscode_compare.py --fortran-dir /path/to/snaps \
      --z 0.0 --np-dim 256 --box 100 \
      --ours bench_logs/validate_lcdm_256_r4.npz \
      [--kmax 0.3] [--tolerance 0.01] [--ngrid 256] [--halos]

Exit status 0 when the quasi-linear weighted-mean ratio is within
--tolerance, 2 when it is not, 1 on ingestion errors.
"""
import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def infer_ranks(dirname: str, z: float) -> int:
    """Count `{z}xv{rank}.dat` files to infer the writing run's topology."""
    prefix = f"{z:.3f}xv"
    pat = re.compile(re.escape(prefix) + r"(\d+)\.dat$")
    ranks = sorted(int(m.group(1)) for f in os.listdir(dirname)
                   if (m := pat.match(os.path.basename(f))))
    if not ranks:
        raise FileNotFoundError(
            f"no {prefix}*.dat files in {dirname} (found: "
            f"{sorted(os.listdir(dirname))[:8]}...)")
    n = len(ranks)
    if ranks != list(range(n)):
        raise ValueError(f"rank files not contiguous: {ranks}")
    nd = round(n ** (1 / 3))
    if nd ** 3 != n:
        raise ValueError(f"{n} ranks is not a cubic nodes_dim^3 topology")
    return nd


def load_fortran_snapshot(args):
    """Build a matching SimConfig and ingest the per-rank xv files."""
    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu.io import checkpoint as ck
    from cubep3m_tpu import state as sm

    nd = infer_ranks(args.fortran_dir, args.z)
    nf = 2 * args.np_dim
    # geometry only affects slot capacity here, not the measurement; use
    # roomy buffers so any rank's np_local fits
    cfg = SimConfig(nodes_dim=nd, tiles_node_dim=2,
                    nf_tile=nf // (2 * nd) + 2 * 16, nf_cutoff=16,
                    buf_extra=0, box=args.box, density_buffer=args.buffer,
                    pid=False, shake=False)
    cfg.validate()
    st, cur = ck.read_reference_checkpoint(args.fortran_dir, cfg, args.z)
    x, v, pid = sm.gather_global(cfg, st)
    return cfg, st, x, v


def measure(cfg, x, a, args):
    from cubep3m_tpu.analysis import power as pw
    ps = pw.power_of_particles(cfg, x, ngrid=args.ngrid, assignment="cic",
                               subtract_shot=True)
    return ps


def load_ours(args, cfg):
    """Our side: a validate_lcdm npz (k/delta2 precomputed), a native
    checkpoint (re-measured), or another reference-format directory."""
    from cubep3m_tpu.io import checkpoint as ck
    from cubep3m_tpu import state as sm

    if os.path.isdir(args.ours):
        st, _ = ck.read_reference_checkpoint(args.ours, cfg, args.z)
        x, _, _ = sm.gather_global(cfg, st)
        ps = measure(cfg, x, float(st.a), args)
        return ps.k, ps.delta2, float(st.a)
    data = np.load(args.ours, allow_pickle=False)
    if "delta2" in data:           # validate_lcdm.py artifact
        return data["k"], data["delta2"], float(data["a_final"])
    st, _ = ck.load_native(args.ours, cfg)   # native checkpoint
    x, _, _ = sm.gather_global(cfg, st)
    x = np.mod(x - np.asarray(st.shake_offset)[None, :],
               cfg.nf_physical_dim)
    ps = measure(cfg, x, float(st.a), args)
    return ps.k, ps.delta2, float(st.a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fortran-dir", required=True,
                    help="directory of Fortran-produced {z}xv{rank}.dat")
    ap.add_argument("--z", type=float, required=True)
    ap.add_argument("--np-dim", type=int, required=True,
                    help="particles per dimension of the writing run")
    ap.add_argument("--box", type=float, required=True, help="Mpc/h")
    ap.add_argument("--ours", required=True,
                    help="our artifact: validate_lcdm npz, native .npz "
                         "checkpoint, or a second snapshot directory")
    ap.add_argument("--ngrid", type=int, default=None,
                    help="measurement grid (default: the fine mesh)")
    ap.add_argument("--kmax", type=float, default=0.3,
                    help="quasi-linear cut for the pass/fail mean [h/Mpc]")
    ap.add_argument("--tolerance", type=float, default=0.01,
                    help="north-star contract: |ratio-1| below this")
    ap.add_argument("--buffer", type=float, default=1.6,
                    help="slot headroom for uneven Fortran rank loads")
    ap.add_argument("--halos", action="store_true",
                    help="also compare halo mass functions")
    ap.add_argument("--out", default=None, help="write the table here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg, st, x, v = load_fortran_snapshot(args)
    a_f = float(st.a)
    print(f"# ingested {args.fortran_dir}: {x.shape[0]} particles, "
          f"a={a_f:.5f} (z={1 / a_f - 1:.3f}), "
          f"{cfg.nodes} rank(s)", flush=True)
    ps_f = measure(cfg, x, a_f, args)
    k_o, d2_o, a_o = load_ours(args, cfg)

    if ps_f.k.shape != np.shape(k_o) or not np.allclose(ps_f.k, k_o):
        # different measurement grids: interpolate ours onto theirs over
        # the overlapping range
        sel = (ps_f.k >= np.min(k_o)) & (ps_f.k <= np.max(k_o))
        d2_o = np.interp(ps_f.k, np.asarray(k_o), np.asarray(d2_o))
        d2_o[~sel] = 0.0

    ok = (ps_f.delta2 > 0) & (d2_o > 0) & (ps_f.nmodes > 0)
    lines = [f"# P(k) cross-code table: ours / fortran "
             f"(a_fortran={a_f:.5f}, a_ours={a_o:.5f})",
             f"{'k[h/Mpc]':>10} {'D2_fortran':>12} {'D2_ours':>12} "
             f"{'ratio':>8} {'nmodes':>8}"]
    idx = np.where(ok)[0]
    show = idx if idx.size <= 24 else idx[np.unique(
        np.geomspace(1, idx.size, 24).astype(int) - 1)]
    for i in show:
        lines.append(f"{ps_f.k[i]:10.4f} {ps_f.delta2[i]:12.5g} "
                     f"{d2_o[i]:12.5g} {d2_o[i] / ps_f.delta2[i]:8.4f} "
                     f"{int(ps_f.nmodes[i]):8d}")
    verdict = {}
    for kmax, name in [(args.kmax, "quasi_linear"), (1.0, "k_lt_1"),
                       (np.inf, "all_k")]:
        s = ok & (ps_f.k < kmax)
        if not s.any():
            lines.append(f"# mean ratio ({name}): no common bins")
            continue
        r = float(np.average(d2_o[s] / ps_f.delta2[s],
                             weights=ps_f.nmodes[s]))
        lines.append(f"# nmode-weighted mean ratio ({name}): {r:.4f}")
        verdict[name] = round(r, 4)

    if args.halos:
        from cubep3m_tpu.analysis import halofind as hf
        from cubep3m_tpu.analysis import massfunc as mf
        cat = hf.find_halos(cfg, st)
        mea = mf.measured_dndlnm(cfg, cat["halo_mass"])
        lines.append(f"# fortran-snapshot halos: {cat.size} "
                     f"(mass function bins: {mea.m.size})")
        verdict["n_halos_fortran"] = int(cat.size)

    table = "\n".join(lines)
    print(table, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    ql = verdict.get("quasi_linear")
    passed = ql is not None and abs(ql - 1.0) <= args.tolerance
    print(json.dumps({"pass": bool(passed), "tolerance": args.tolerance,
                      **verdict}), flush=True)
    raise SystemExit(0 if passed else 2)


if __name__ == "__main__":
    main()
