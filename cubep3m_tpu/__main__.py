"""Command-line pipeline: `python -m cubep3m_tpu <command>`.

Replaces the reference's per-tool MPI binaries and PBS batch chain
(`batch/EXAMPLES/cubep3m.pbs.example`: dist_init -> cubep3m -> halo_merge):

  ic        Zel'dovich initial conditions          (utils/dist_init)
  run       evolve the box                          (source_threads/cubepm)
  power     matter power spectrum of a checkpoint   (utils/cic_power)
  velpower  velocity power spectrum                 (utils/cic_velpower)
  halofind  halo catalog of a checkpoint            (utils/halofinder)
  massfunc  halo mass function vs PS/ST/Tinker      (utils/PSvsSim)
  project   density projections (+PGM images)       (projections, pgm_proj)
  recompose merge a checkpoint into one global file (utils/recompose)
  mem       sizing calculator                       (utils/mem_usage)

Configuration comes from a JSON file of SimConfig fields (the runtime
replacement for the compile-time `parameters` file), e.g.:

  {"nodes_dim": 1, "tiles_node_dim": 2, "nf_tile": 112, "box": 100.0,
   "z_i": 100.0, "cosmo": {"omega_m": 0.27, "omega_l": 0.73},
   "checkpoints": [10.0, 1.0, 0.0], "halofinds": [1.0, 0.0]}
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def load_config(path):
    from .config import SimConfig, Cosmology
    with open(path) as f:
        raw = json.load(f)
    # "_"-prefixed keys are comments, at any nesting level
    raw = {k: ({kk: vv for kk, vv in v.items() if not kk.startswith("_")}
               if isinstance(v, dict) else v)
           for k, v in raw.items() if not k.startswith("_")}
    schedule = {k: raw.pop(k, []) for k in
                ("checkpoints", "projections", "halofinds")}
    cosmo = Cosmology(**raw.pop("cosmo", {}))
    cfg = SimConfig(cosmo=cosmo, **raw)
    cfg.validate()
    return cfg, schedule


def cmd_ic(args):
    from .ic import zeldovich as zl
    from .io import checkpoint as ck
    from .core.timestep import Cursors
    cfg, _ = load_config(args.config)
    print(cfg.summary())
    t0 = time.time()
    if cfg.nodes_dim > 1:
        # never build a global field on one device (dist_init role)
        from .parallel.mesh import make_sim_mesh
        st = zl.zeldovich_ic_distributed(
            cfg, make_sim_mesh(cfg.nodes_dim), seed=args.seed,
            transfer_file=args.transfer_file)
    else:
        st = zl.zeldovich_ic(cfg, seed=args.seed,
                             transfer_file=args.transfer_file)
    print(f"ICs generated in {time.time() - t0:.1f}s "
          f"({int(np.asarray(st.np_local).sum())} particles)")
    ck.save_native(os.path.join(args.outdir, "ic.npz"), cfg, st, Cursors())
    print(f"wrote {args.outdir}/ic.npz")


def cmd_run(args):
    import jax
    from . import state as sm
    from .core.driver import Simulation
    from .core import step as step_mod
    from .core.timestep import OutputSchedule
    from .io import checkpoint as ck
    cfg, sched_z = load_config(args.config)
    print(cfg.summary())
    schedule = OutputSchedule.from_redshifts(**sched_z)
    sim = Simulation(cfg, schedule=schedule,
                     kill_time_s=args.kill_time_s)
    sim.attach_outputs(args.outdir, reference_format=args.reference_format)
    if args.restart:
        st, cur = ck.load_native(args.restart, cfg)
        sim.cursors = cur
        print(f"restarting from {args.restart} at a={float(st.a):.5f}")
    else:
        st, _ = ck.load_native(os.path.join(args.outdir, "ic.npz"), cfg)
    st = step_mod.shard_state(st, sim.mesh)
    t0 = time.time()
    st = sim.run(st, max_steps=args.max_steps)
    n = int(st.nts)
    print(f"done: {n} sweeps to z={1 / float(st.a) - 1:.4f} "
          f"in {time.time() - t0:.1f}s "
          f"({float(st.np_local.sum()) * n / max(time.time() - t0, 1e-9):.3g}"
          f" particle-steps/s)")


def _load_snapshot(args):
    from .io import checkpoint as ck
    from . import state as sm
    cfg, _ = load_config(args.config)
    st, _ = ck.load_native(args.snapshot, cfg)
    x, v, pid = sm.gather_global(cfg, st)
    x = np.mod(x - np.asarray(st.shake_offset)[None, :],
               cfg.nf_physical_dim)
    return cfg, st, x, v, pid


def cmd_power(args):
    from .analysis import halofit as hft
    from .analysis import power as pw
    from .ic import transfer as tr
    cfg, st, x, v, _ = _load_snapshot(args)
    ps = pw.power_of_particles(cfg, x, assignment="cic",
                               subtract_shot=args.shot_noise)
    # theory columns at the snapshot epoch: linear + HALOFIT nonlinear
    # (the reference workflow diffs cic_power output against CAMB tables;
    # these two columns make the file self-contained)
    lin = tr.linear_power(cfg.cosmo, float(st.a))
    nl = hft.nonlinear_delta2(lin, ps.k)
    out = args.out or args.snapshot.replace(".npz", "_pk.txt")
    np.savetxt(out, np.column_stack([ps.k, ps.pk, ps.delta2, ps.nmodes,
                                     lin.delta2(ps.k), nl]),
               header="k[h/Mpc]  P(k)[(Mpc/h)^3]  Delta2  modes  "
                      "Delta2_linear  Delta2_halofit")
    print(f"wrote {out}")


def cmd_velpower(args):
    from .analysis import velpower as vp
    cfg, st, x, v, _ = _load_snapshot(args)
    ps = vp.velocity_power(cfg, x, v)
    out = args.out or args.snapshot.replace(".npz", "_vpk.txt")
    np.savetxt(out, np.column_stack([ps.k, ps.pk, ps.delta2, ps.nmodes]),
               header="k[h/Mpc]  Pv(k)  Delta2_v  modes")
    print(f"wrote {out}")


def cmd_halofind(args):
    from .analysis import halofind as hf
    from .io import checkpoint as ck
    cfg, _ = load_config(args.config)
    st, _ = ck.load_native(args.snapshot, cfg)
    cat = hf.find_halos(cfg, st)
    fn = hf.write_catalog(args.outdir or os.path.dirname(args.snapshot)
                          or ".", cfg, st, cat)
    print(f"{cat.size} halos -> {fn}")


def cmd_massfunc(args):
    from .analysis import halofind as hf
    from .analysis import massfunc as mf
    cfg, _ = load_config(args.config)
    cat = hf.read_catalog(args.catalog)
    mea = mf.measured_dndlnm(cfg, cat["halo_mass"])
    if mea.m.size == 0:
        print(f"no halos above the {20.0}-particle mass floor in "
              f"{args.catalog}")
        return
    rows = [mea.m, mea.dndlnm]
    hdr = "M[Msun/h]  measured"
    for kind in ("ps", "st", "tinker"):
        rows.append(mf.theory_dndlnm(mea.m, cfg.cosmo, a=args.a, kind=kind))
        hdr += f"  {kind}"
    out = args.out or args.catalog.replace(".dat", "_mf.txt")
    np.savetxt(out, np.column_stack(rows), header=hdr)
    print(f"wrote {out}")


def cmd_project(args):
    from .analysis import projection as proj
    from .io import checkpoint as ck
    cfg, _ = load_config(args.config)
    st, _ = ck.load_native(args.snapshot, cfg)
    files = proj.write_projections(args.outdir or ".", cfg, st)
    if args.pgm:
        planes = proj.project_density(cfg, st)
        for name, plane in planes.items():
            fn = os.path.join(args.outdir or ".", f"proj_{name}.pgm")
            proj.to_pgm(plane, fn)
            files.append(fn)
    print("wrote " + " ".join(files))


def cmd_recompose(args):
    cfg, st, x, v, pid = _load_snapshot(args)
    out = args.out or args.snapshot.replace(".npz", "_global.npz")
    np.savez(out, x=x, v=v, pid=pid, a=float(st.a))
    print(f"wrote {out}: {x.shape[0]} particles in global coordinates")


def cmd_mem(args):
    cfg, _ = load_config(args.config)
    print(cfg.summary())
    for k, vv in cfg.memory_estimate().items():
        print(f"  {k:>20}: {vv / 2 ** 20:10.1f} MiB")


def cmd_forcetest(args):
    """Pairwise force-accuracy sweep (report_pair.f90 harness as a CLI)."""
    from .core.driver import Simulation
    from .analysis import forcetest as ft
    cfg, _ = load_config(args.config)
    sim = Simulation(cfg)
    res = ft.pairwise_force_sweep(cfg, sim.kern_f, sim.kern_c,
                                  min_sep=args.min_sep,
                                  max_sep=args.max_sep,
                                  n_sep=args.n_sep)
    out = args.out or "pair_F.txt"
    np.savetxt(out, np.column_stack([res.sep, res.f_radial,
                                     res.f_tangential, res.f_exact,
                                     res.frac_err]),
               header="sep  F_radial  F_tangential  F_exact  frac_err")
    print(f"wrote {out}: median frac err "
          f"{float(np.median(res.frac_err)):.4f}")


def _apply_platform(cpu: bool) -> None:
    """Honor --cpu / JAX_PLATFORMS even under the axon sitecustomize.

    The TPU-tunnel environment pre-imports jax and pins the platform
    before user code runs, so the plain env var is read too late (same
    workaround as tests/conftest.py) — and with a dead tunnel relay the
    pinned backend blocks init FOREVER.  An explicit config update after
    import always wins."""
    plat = "cpu" if cpu else os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cubep3m_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **extra):
        p = sub.add_parser(name)
        p.add_argument("--config", required=True)
        p.add_argument("--cpu", action="store_true",
                       help="run on the CPU backend (overrides the "
                            "session's pinned TPU platform)")
        p.set_defaults(fn=fn)
        return p

    p = add("ic", cmd_ic)
    p.add_argument("--outdir", default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--transfer-file", default=None)

    p = add("run", cmd_run)
    p.add_argument("--outdir", default=".")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--restart", default=None)
    p.add_argument("--kill-time-s", type=float, default=None)
    p.add_argument("--reference-format", action="store_true")

    for name, fn in (("power", cmd_power), ("velpower", cmd_velpower),
                     ("recompose", cmd_recompose)):
        p = add(name, fn)
        p.add_argument("--snapshot", required=True)
        p.add_argument("--out", default=None)
        if name == "power":
            p.add_argument("--shot-noise", action="store_true")

    p = add("halofind", cmd_halofind)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--outdir", default=None)

    p = add("massfunc", cmd_massfunc)
    p.add_argument("--catalog", required=True)
    p.add_argument("--a", type=float, default=1.0)
    p.add_argument("--out", default=None)

    p = add("project", cmd_project)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--outdir", default=None)
    p.add_argument("--pgm", action="store_true")

    add("mem", cmd_mem)

    p = add("forcetest", cmd_forcetest)
    p.add_argument("--min-sep", type=float, default=1.0)
    p.add_argument("--max-sep", type=float, default=None)
    p.add_argument("--n-sep", type=int, default=24)
    p.add_argument("--out", default=None)

    args = ap.parse_args(argv)
    _apply_platform(getattr(args, "cpu", False))
    args.fn(args)


if __name__ == "__main__":
    main()
