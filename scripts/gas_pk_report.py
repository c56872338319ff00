"""Gas vs matter P(k) from a cosmological-MHD native checkpoint.

The reference's gas acceptance method (`utils/gas_power` + `cic_power`,
SURVEY.md U9/U2): measure the gas density spectrum and compare it to the
dark-matter spectrum of the same snapshot.  Above the Jeans scale the
pressure-less-limit gas traces the DM (ratio ~ 1 on large scales,
falling below 1 toward the grid scale where the TVD solver's numerical
pressure/diffusion smooths the gas field).

Run (CPU, offline — works on any `--mhd` rung or kill checkpoint):
    python scripts/gas_pk_report.py bench_logs/vck128mhd/ckpt_10.000.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--ngrid", type=int, default=None)
    ap.add_argument("--rows", type=int, default=12)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from cubep3m_tpu.config import SimConfig, Cosmology
    from cubep3m_tpu.io import checkpoint as ck
    from cubep3m_tpu.analysis import power as pw

    with np.load(args.ckpt, allow_pickle=False) as data:
        if "__config" not in data:
            raise SystemExit("format-1 checkpoint (no embedded config); "
                             "re-save with a round>=3 build")
        rep = str(data["__config"])
        if "gas_u" not in data.files:
            raise SystemExit("checkpoint has no gas state (not an --mhd "
                             "run)")
    # repr(cfg) of our own frozen dataclass — evaluated in a namespace
    # that only exposes the two config types
    cfg = eval(rep, {"__builtins__": {}},
               {"SimConfig": SimConfig, "Cosmology": Cosmology})
    st, _ = ck.load_native(args.ckpt, cfg)
    a = float(st.a)
    print(f"# {args.ckpt}: a={a:.5f} z={1.0 / a - 1.0:.3f} "
          f"nts={int(st.nts)} box={cfg.box} Mpc/h "
          f"nf={cfg.nf_physical_dim}")

    dm = pw.power_of_state(cfg, st, ngrid=args.ngrid, assignment="cic",
                           subtract_shot=True)
    gas_u = np.asarray(st.gas_u)
    if gas_u.ndim == 5:          # (dev, 5, nx, ny, nz) single-device axis
        gas_u = gas_u[0] if gas_u.shape[0] == 1 else gas_u
    gas = pw.gas_power(cfg, gas_u)

    ok = (dm.delta2 > 0) & (gas.delta2 > 0) & (dm.nmodes > 0)
    if not ok.any():
        # early-z snapshot where shot noise exceeds Delta^2: fall back to
        # the raw (no shot subtraction) matter spectrum and say so
        dm = pw.power_of_state(cfg, st, ngrid=args.ngrid,
                               assignment="cic", subtract_shot=False)
        ok = (dm.delta2 > 0) & (gas.delta2 > 0) & (dm.nmodes > 0)
        print("# note: matter Delta^2 below shot noise everywhere; "
              "ratios use the UNsubtracted matter spectrum")
    idx = np.where(ok)[0]
    print(f"\n# gas vs matter Delta^2 ({idx.size} populated bins)")
    print(f"{'k':>8} {'D2_dm':>10} {'D2_gas':>10} {'gas/dm':>8} "
          f"{'modes':>8}")
    if idx.size:
        for i in idx[np.unique(
                np.geomspace(1, idx.size, args.rows).astype(int) - 1)]:
            print(f"{dm.k[i]:8.3f} {dm.delta2[i]:10.4g} "
                  f"{gas.delta2[i]:10.4g} "
                  f"{gas.delta2[i] / dm.delta2[i]:8.3f} "
                  f"{int(dm.nmodes[i]):8d}")
    for kmax, name in [(0.3, "k<0.3"), (1.0, "k<1"), (3.0, "k<3")]:
        s = ok & (dm.k < kmax)
        if s.any():
            r = np.average(gas.delta2[s] / dm.delta2[s],
                           weights=dm.nmodes[s])
            print(f"# weighted gas/dm ({name}): {r:.4f}")
    # bulk diagnostics the reference prints from its gas state
    rho = np.asarray(gas_u[0], dtype=np.float64)
    print(f"# gas density: mean={rho.mean():.4f} min={rho.min():.3e} "
          f"max={rho.max():.3e} (mean-normalized units)")


if __name__ == "__main__":
    main()
