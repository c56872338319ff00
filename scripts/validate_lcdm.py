"""Physics acceptance run: evolve an LCDM box to z=0 and validate P(k).

The reference's acceptance criteria (SURVEY.md §4.4): evolved P(k) vs linear
theory at large scales; halo mass function vs Press-Schechter/Sheth-Tormen.
Writes results to --out (npz) and prints a summary.

Run: python scripts/validate_lcdm.py [--np-dim 128] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np-dim", type=int, default=128)
    ap.add_argument("--box", type=float, default=100.0)
    ap.add_argument("--z-i", type=float, default=100.0)
    ap.add_argument("--z-final", type=float, default=0.0,
                    help="stop + measure at this redshift instead of z=0 "
                         "(P(k) is compared to linear theory at the same "
                         "a) — lets a 256^3 acceptance run COMPLETE "
                         "inside one bounded TPU window, e.g. z=1 in "
                         "~35 min vs z=0 in ~60")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/validate_lcdm.npz")
    ap.add_argument("--max-steps", type=int, default=1200)
    ap.add_argument("--chunks", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--ckpt-dir", default=None,
                    help="write native checkpoints at a few intermediate "
                         "redshifts (tunnel-hang insurance for hour-long "
                         "256^3 runs)")
    ap.add_argument("--resume-from", default=None,
                    help="native .npz checkpoint to resume from")
    ap.add_argument("--coarse-sort", action="store_true",
                    help="cfg.coarse_sort: segmented-sum coarse deposit "
                         "(fastest 256^3 config; identical physics)")
    ap.add_argument("--bench-geom", action="store_true",
                    help="use the bench's proven-compiling geometry "
                         "(288^3 tiles, nf_buf=16, density_buffer 1.15 — "
                         "single-node wrap conserves np_local exactly) "
                         "instead of the conservative 320^3/1.3 default")
    ap.add_argument("--pp-ext", action="store_true",
                    help="extended-range PP (BASELINE config 3 mode)")
    ap.add_argument("--mhd", action="store_true",
                    help="couple the TVD-CT gas solver: cosmological "
                         "DM+gas with particle-deposited gas ICs "
                         "(mhd_init.f90 GetU) and a gas P(k) "
                         "measurement at the end (utils/gas_power "
                         "role; reference coupling cubepm.f90:113-165)")
    ap.add_argument("--halo-refine", type=int, default=1,
                    help="halofinder density-mesh refinement "
                         "(halofind_finer_grid.f90 variant; BASELINE "
                         "config 3's 'finer halo grid')")
    ap.add_argument("--nodes-dim", type=int, default=1,
                    help="devices per mesh axis (2 = a 2x2x2 = 8-device "
                         "mesh; with --cpu, set "
                         "XLA_FLAGS=--xla_force_host_platform_device_"
                         "count=8 for a virtual mesh)")
    ap.add_argument("--staged", action="store_true",
                    help="cfg.staged_sweep: run the 10-module staged "
                         "sweep through the driver")
    ap.add_argument("--gather-pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="cfg.coarse_gather_pallas (None = auto; True on "
                         "CPU runs the interpreter — slow, validation "
                         "only)")
    ap.add_argument("--ic-host", action="store_true",
                    help="generate ICs with numpy host FFTs (insurance "
                         "for backends whose c2c limit is below nf^3)")
    ap.add_argument("--pk-grid", type=int, default=None,
                    help="measurement grid for the final P(k) (default "
                         "nf; use 256 on backends that cannot transform "
                         "512^3)")
    ap.add_argument("--kill-after", type=float, default=None,
                    help="wall-clock budget (s): past it the driver writes "
                         "a kill checkpoint (requires --ckpt-dir) and this "
                         "script exits CLEANLY without the z=0 "
                         "measurements — a timeout-killed TPU client "
                         "wedges the remote worker for minutes, a clean "
                         "exit does not; resume with --resume-from")
    ap.add_argument("--ckpt-every-s", type=float, default=None,
                    help="periodic rolling checkpoint cadence (s): write "
                         "ckpt_kill.npz every N seconds of stepping "
                         "(requires --ckpt-dir) so an external host/worker "
                         "death mid-leg loses at most N seconds — the "
                         "r8 leg at 10:48 lost 1400s of ratchet progress "
                         "because only the end-of-window kill checkpoint "
                         "was durable")
    ap.add_argument("--pp-cap-frac", type=float, default=0.25,
                    help="dense-tail buffer capacity as a fraction of "
                         "max_np: pre-size from run history to avoid the "
                         "~160 s mid-run pp_autosize recompile (the r3 "
                         "256^3 run grew 0.25 -> 0.5 at a=0.47; start "
                         "legs that pass a=0.47 at 0.5+)")
    ap.add_argument("--autosize-headroom", type=float, default=0.7,
                    help="pp_autosize growth trigger: grow when the "
                         "occupancy BOUND exceeds headroom*(band+1).  The "
                         "bound is a shake-invariant 2x2x2-block sum (an "
                         "over-estimate); r3's 256^3 run reached a=0.5 on "
                         "band 4096 with the bound at 2693-2892, so 0.9+ "
                         "avoids the band-doubling rebuild that crashed "
                         "the r4c TPU worker twice while staying safely "
                         "under the true window (reactive backstop "
                         "remains)")
    ap.add_argument("--pp-ext-band", type=int, default=0,
                    help="lattice PP_EXT same-super-cell window (0 = auto "
                         "4x mean occupancy).  The lattice growth path is "
                         "REACTIVE only — a resumed late-time leg should "
                         "pass the band its crashed predecessor grew to "
                         "(campaign log 'pp_ext_band 64 -> 128') so the "
                         "rebuild happens at t=0, not mid-run")
    ap.add_argument("--pp-ext-ghost-cap", type=int, default=0,
                    help="lattice PP_EXT per-face ghost buffer (0 = auto)")
    ap.add_argument("--pp-ext-dense-cap", type=int, default=0,
                    help="lattice PP_EXT tail compaction buffer (0 = "
                         "share the PPINT cap); the tail pass costs "
                         "O(tail_band * cap) per shift whether or not "
                         "the slots are used, and the presize probe "
                         "right-sizes it from the measured bound")
    ap.add_argument("--pp-ext-tail-chunk", type=int, default=524288,
                    help="staged lattice PP_EXT: bound every dense-tail "
                         "dispatch at this many left partners (plus the "
                         "tail-window overlap); 0 = single dispatch "
                         "(crashes the tunnel worker at 256^3 "
                         "production clustering — campaign_r9.log)")
    ap.add_argument("--pp-ext-tail-band", type=int, default=0,
                    help="lattice PP_EXT dense-tail window (max super-"
                         "cell occupancy; 0 = share pp_dense_band).  "
                         "Occupancy beyond pp_ext_band_cap spills here: "
                         "the tail only costs on dense-cell particles, "
                         "while the band costs on ALL particles (the "
                         "band-8192 single-dispatch wall time killed "
                         "the TPU worker, r8_ppext128_leg1.log)")
    ap.add_argument("--rebuild-policy", choices=("inplace", "exit"),
                    default="inplace",
                    help="what a pp_autosize growth does mid-run: "
                         "'inplace' recompiles the sweep in this process; "
                         "'exit' checkpoints + RE-EXECS this script fresh, "
                         "resuming from ckpt_prerebuild.npz with the grown "
                         "sizing (requires --ckpt-dir) — in-process "
                         "recompiles crashed the tunneled TPU worker 5/5 "
                         "times in round 4 (bench_logs/campaign_r4c.log)")
    ap.add_argument("--pp-dense-band", type=int, default=4096,
                    help="dense-tail pair window: must exceed the max "
                         "same-fine-cell occupancy at z=0 (cluster cores "
                         "pack >512 particles per fine cell at 128^3+ "
                         "resolution; the tail pass is lax.cond-skipped "
                         "until halos collapse, so early steps pay nothing)")
    args = ap.parse_args()
    t_proc = time.time()
    if args.rebuild_policy == "exit" and not args.ckpt_dir:
        ap.error("--rebuild-policy exit requires --ckpt-dir (the "
                 "pre-rebuild checkpoint is what the re-exec resumes from)")

    if args.cpu and args.nodes_dim > 1:
        # must precede CPU backend creation (conftest.py does the same)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.nodes_dim ** 3}").strip()
    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu import state as sm
    from cubep3m_tpu.core.driver import RebuildRequired, Simulation
    from cubep3m_tpu.core.timestep import OutputSchedule
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.ic import zeldovich as zl, transfer as tr
    from cubep3m_tpu.analysis import power as pw, halofind as hf

    if args.resume_from:
        # a resumed leg adopts any sizing its predecessor grew to
        # (max with the CLI knobs), so the one sweep compile happens at
        # the right windows — see driver.RebuildRequired
        from cubep3m_tpu.io import checkpoint as _ck
        stored = _ck.stored_sizing(args.resume_from)
        grown = {}
        for knob, cur in (("pp_dense_band", args.pp_dense_band),
                          ("pp_dense_cap_frac", args.pp_cap_frac),
                          ("pp_ext_band", args.pp_ext_band),
                          ("pp_ext_tail_band", args.pp_ext_tail_band),
                          ("pp_ext_dense_cap", args.pp_ext_dense_cap),
                          ("pp_ext_ghost_cap", args.pp_ext_ghost_cap)):
            if knob in stored and stored[knob] > cur:
                grown[knob] = stored[knob]
        if grown:
            print(f"# adopted stored sizing from {args.resume_from}: "
                  f"{grown}", flush=True)
            args.pp_dense_band = int(grown.get("pp_dense_band",
                                               args.pp_dense_band))
            args.pp_cap_frac = float(grown.get("pp_dense_cap_frac",
                                               args.pp_cap_frac))
            args.pp_ext_band = int(grown.get("pp_ext_band",
                                             args.pp_ext_band))
            args.pp_ext_tail_band = int(grown.get("pp_ext_tail_band",
                                                  args.pp_ext_tail_band))
            args.pp_ext_dense_cap = int(grown.get("pp_ext_dense_cap",
                                                  args.pp_ext_dense_cap))
            args.pp_ext_ghost_cap = int(grown.get("pp_ext_ghost_cap",
                                                  args.pp_ext_ghost_cap))
        # a pre-cap checkpoint may store a band beyond pp_ext_band_cap
        # (e.g. the r7 band-8192 ratchet leg); pp_ext_band_eff clamps it,
        # and the TAIL window must then cover the occupancy the oversized
        # band was absorbing
        if args.pp_ext and args.pp_ext_band:
            args.pp_ext_tail_band = max(args.pp_ext_tail_band,
                                        2 * args.pp_ext_band)

    nf = 2 * args.np_dim
    # beyond nf=512 padded the axon backend's c2c transform limit bites:
    # run the fine solve as tile FFTs of <=~320^3 (see bench.py)
    fft_tiles = max(1, nf // 256)
    buf_extra = 0 if args.bench_geom else 16
    cfg = SimConfig(nodes_dim=args.nodes_dim, tiles_node_dim=2,
                    nf_tile=nf // (2 * args.nodes_dim) + 2 * (16 + buf_extra),
                    nf_cutoff=16, buf_extra=buf_extra,
                    box=args.box, z_i=args.z_i,
                    density_buffer=1.15 if args.bench_geom else 1.3,
                    shake=True, pid=False,
                    pp_dense_band=args.pp_dense_band,
                    pp_dense_cap_frac=args.pp_cap_frac,
                    pp_autosize_headroom=args.autosize_headroom,
                    pp_ext_band=args.pp_ext_band,
                    pp_ext_tail_band=args.pp_ext_tail_band,
                    pp_ext_tail_chunk=(args.pp_ext_tail_chunk
                                       if args.staged else 0),
                    pp_ext_dense_cap=args.pp_ext_dense_cap,
                    pp_ext_ghost_cap=args.pp_ext_ghost_cap,
                    # realization-dependent cluster cores can exceed any
                    # static dense band (a 64^3/100Mpc box packs >4096
                    # particles into one fine cell by z=0); let the driver
                    # grow the window before any pair is dropped
                    pp_autosize=True,
                    fine_fft_tiles=fft_tiles,
                    coarse_sort=args.coarse_sort,
                    coarse_gather_pallas=args.gather_pallas,
                    staged_sweep=args.staged, pp_ext=args.pp_ext,
                    mhd=args.mhd,
                    rebuild_policy=args.rebuild_policy,
                    coarse_from_fine=args.fast, fine_potential=args.fast)
    cfg.validate()
    print(f"# {cfg.summary()}", flush=True)

    # z_final > 0 truncates the schedule so the driver's final_step fires
    # there (the last scheduled checkpoint, timestep.py:137) and the z=z_f
    # measurements below still complete inside a bounded TPU window.
    zf = args.z_final
    a_target = 1.0 / (1.0 + zf)
    ckpts = [zf]
    if args.ckpt_dir:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        # dense low-z rungs: the tunneled TPU worker can crash
        # spontaneously mid-leg (campaign_r4e.log 16:28 — no rebuild, no
        # OOM), and with rungs only at z=1/0.5 such a crash loses the
        # whole z=2->1 segment; ~45 s of extra async writes per rung is
        # cheap insurance
        ckpts = [z for z in (10.0, 5.0, 3.0, 2.0, 1.5, 1.25, 1.0,
                             0.75, 0.5, 0.3, 0.15)
                 if z > zf + 1e-9] + [zf]
    sched = OutputSchedule.from_redshifts(checkpoints=ckpts,
                                          halofinds=[zf])
    if args.kill_after is not None and not args.ckpt_dir:
        ap.error("--kill-after requires --ckpt-dir (the kill checkpoint "
                 "is what makes the early exit resumable)")
    sim = Simulation(cfg, schedule=sched, kill_time_s=args.kill_after)

    t0 = time.time()
    if args.resume_from:
        from cubep3m_tpu.io import checkpoint as ck
        from cubep3m_tpu.core.timestep import Cursors
        st, cur = ck.load_native(args.resume_from, cfg)
        # the saved cursors index the WRITING leg's schedule; this leg's
        # lists are truncated (z_final moved), so recompute them from the
        # resumed scale factor (ADVICE r3: a stale halofind cursor can
        # overflow a shorter list and silently skip the z_final trigger)
        sim.cursors = Cursors.for_resume(sched, float(st.a))
        print(f"# resumed from {args.resume_from}: a={float(st.a):.5f} "
              f"nts={int(st.nts)} saved cursors={cur} -> "
              f"{sim.cursors}", flush=True)
        # a late-time state can already outgrow the default dense-tail
        # sizing; grow it NOW, before the first sweep compile, instead of
        # paying a mid-run recompile (the r4c leg-1 TPU worker crashed in
        # exactly that rebuild at a=0.33)
        st = step_mod.shard_state(st, sim.mesh)
        sim.presize_from_state(st)
    elif args.nodes_dim > 1:
        st = zl.zeldovich_ic_distributed(cfg, sim.mesh, seed=42)
        print(f"# distributed ICs generated in {time.time() - t0:.1f}s",
              flush=True)
    else:
        st = zl.zeldovich_ic(cfg, seed=42, host_fft=args.ic_host)
        print(f"# ICs generated in {time.time() - t0:.1f}s "
              f"(host_fft={args.ic_host})", flush=True)
    st = step_mod.shard_state(st, sim.mesh)

    t0 = time.time()
    final = None

    def on_ck(s, state, dec):
        nonlocal final
        final = state

    sim.on_checkpoint.append(on_ck)
    if args.ckpt_dir:
        sim.attach_outputs(args.ckpt_dir, projections=False,
                           halofinds=False)

    # relay watchdog: a dead axon tunnel blocks the current dispatch
    # FOREVER (no exception reaches Python); turn that into a clean,
    # resumable exit — intermediate checkpoints + --resume-from recover
    if not args.cpu:
        import threading
        import cubep3m_tpu as _pkg

        def _watch():
            dead_since = None
            while True:
                time.sleep(60)
                if _pkg.relay_alive():
                    dead_since = None
                elif dead_since is None:
                    dead_since = time.time()
                elif time.time() - dead_since > 300:
                    print("# FATAL: TPU tunnel relay dead >5 min; "
                          "exiting (resume with --resume-from on the "
                          "latest checkpoint)", flush=True)
                    os._exit(3)

        threading.Thread(target=_watch, daemon=True).start()

    # host-stepped with a heartbeat (the tunneled TPU's remote compiler is
    # flaky with long scan programs, so chunked mode is opt-in)
    _orig_step = sim.step
    _hb = [0, time.time()]
    _pc = [time.time()]
    if args.ckpt_every_s is not None and not args.ckpt_dir:
        ap.error("--ckpt-every-s requires --ckpt-dir")

    def _step(stt):
        out = _orig_step(stt)
        _hb[0] += 1
        if time.time() - _hb[1] > 60:
            print(f"# step {_hb[0]}: a={float(out[0].a):.5f} "
                  f"wall={time.time() - t0:.0f}s", flush=True)
            _hb[1] = time.time()
        if (args.ckpt_every_s is not None
                and time.time() - _pc[0] > args.ckpt_every_s):
            from cubep3m_tpu.io import checkpoint as _ck
            _ck.save_native(f"{args.ckpt_dir}/ckpt_kill.npz", sim.cfg,
                            out[0], sim.cursors)
            print(f"# periodic ckpt at a={float(out[0].a):.5f} "
                  f"wall={time.time() - t0:.0f}s", flush=True)
            _pc[0] = time.time()
        return out

    sim.step = _step
    if args.resume_from and float(st.a) >= a_target - 1e-5:
        # resumed AT (or past) the target: Cursors.for_resume counts the
        # final trigger as already passed, so sim.run would never see
        # final_step and would burn max_steps — measure directly instead
        # (this is the cheap "z-artifact from an existing rung" path)
        print(f"# resumed at a={float(st.a):.5f} >= target "
              f"{a_target:.5f}; measuring directly", flush=True)
        args.kill_after = None
    else:
        try:
            st = sim.run(st, max_steps=args.max_steps,
                         use_chunks=args.chunks)
        except RebuildRequired as e:
            # the pre-rebuild checkpoint (grown config embedded) is on
            # disk; replace THIS process with a fresh one resuming from
            # it — the sizing-adoption block above picks the grown knobs
            # back up and the single fresh compile replaces the
            # worker-killing recompile
            ck = f"{args.ckpt_dir}/ckpt_prerebuild.npz"
            remaining = None
            if args.kill_after is not None:
                remaining = args.kill_after - (time.time() - t_proc)
                if remaining < 180:
                    print(f"# REBUILD-EXIT: {e} — but only "
                          f"{remaining:.0f}s of budget left; resume "
                          f"manually from {ck}", flush=True)
                    return
            print(f"# REBUILD-EXIT: {e}\n# re-exec resuming from {ck}"
                  + (f" (kill-after {remaining:.0f}s)" if remaining
                     else ""), flush=True)
            argv = [a for a in sys.argv
                    if not a.startswith(("--resume-from=",
                                         "--kill-after="))]

            def _set(argv, name, value):
                if name in argv:
                    argv[argv.index(name) + 1] = str(value)
                else:
                    argv += [name, str(value)]

            _set(argv, "--resume-from", ck)
            if remaining is not None:
                _set(argv, "--kill-after", int(remaining))
            os.execv(sys.executable, [sys.executable] + argv)
    n_steps = int(st.nts)
    if args.kill_after is not None and float(st.a) < a_target - 1e-3:
        print(f"# kill-after budget hit at a={float(st.a):.5f} "
              f"(nts={n_steps}, wall={time.time() - t0:.0f}s); kill "
              f"checkpoint in {args.ckpt_dir} — resume with "
              f"--resume-from {args.ckpt_dir}/ckpt_kill.npz", flush=True)
        return
    # cumulative over the whole run (the final-state field is the LAST
    # sweep's count and can hide transient late-time drops)
    cum_ovfl = sum(l.pp_overflow + l.bucket_overflow + l.exchange_overflow
                   for l in sim.logs)
    print(f"# evolved {n_steps} steps in {time.time() - t0:.1f}s "
          f"ppovfl={int(st.pp_overflow)} cum_ovfl={cum_ovfl}", flush=True)
    final = final if final is not None else st

    # measurements at z=0 (device-resident deposit: no particle pull;
    # layout-aware — sharded states fold per-device blocks over the mesh)
    ps = pw.power_of_state(cfg, final, mesh=sim.mesh, ngrid=args.pk_grid,
                           assignment="cic", subtract_shot=True)
    lin = tr.linear_power(cfg.cosmo, min(float(final.a), a_target))

    refine_used = args.halo_refine
    try:
        hp = (hf.HalofindParams(refine=args.halo_refine)
              if args.halo_refine != 1 else None)
        cat = hf.find_halos(cfg, final, params=hp, mesh=sim.mesh)
    except Exception as e:
        if args.halo_refine == 1:
            raise
        # a refine-r grid is r^3 x the fine mesh; on a 16 GiB chip the
        # 256^3 box at refine 2 sits near the OOM line — fall back rather
        # than lose the whole run's P(k)
        print(f"# halofind refine={args.halo_refine} failed ({e!r}); "
              "retrying at refine=1", flush=True)
        refine_used = 1
        cat = hf.find_halos(cfg, final, mesh=sim.mesh)
    print(f"# halos found: {cat.size}", flush=True)

    from cubep3m_tpu.analysis import halofit as hft
    nl_delta2 = hft.nonlinear_delta2(lin, ps.k)
    extra = {}
    if args.mhd:
        # gas P(k) + baryon/matter ratio (utils/gas_power role): the gas
        # spectrum tracks matter on large scales and is pressure/shock-
        # suppressed below the gas mesh scale
        gas_u = np.asarray(final.gas_u)
        gps = pw.gas_power(cfg, gas_u)
        gl = np.interp(gps.k, ps.k, ps.delta2)
        sel_g = (gps.k < 1.0) & (gl > 0) & (gps.nmodes > 0)
        gratio = (float(np.average(gps.delta2[sel_g] / gl[sel_g],
                                   weights=gps.nmodes[sel_g]))
                  if sel_g.any() else float("nan"))
        extra.update(gas_k=gps.k, gas_delta2=gps.delta2,
                     gas_nmodes=gps.nmodes,
                     gas_rho_max=float(gas_u[0].max()),
                     gas_mass_mean=float(gas_u[0].mean()))
        print(f"# gas/matter Delta^2 weighted ratio (k<1): "
              f"{gratio:.3f}; max gas overdensity "
              f"{gas_u[0].max():.1f}; mean gas density "
              f"{gas_u[0].mean():.6f}", flush=True)
    np.savez(args.out, k=ps.k, delta2=ps.delta2, pk=ps.pk,
             nmodes=ps.nmodes, lin_delta2=lin.delta2(ps.k),
             nl_delta2=nl_delta2,
             halo_mass=cat["halo_mass"], halo_imass=cat["imass"],
             n_steps=n_steps, a_final=float(final.a), **extra)

    sel = ps.k < 0.3
    ratio = np.average(ps.delta2[sel] / lin.delta2(ps.k[sel]),
                       weights=ps.nmodes[sel])
    print(json.dumps({
        "n_steps": n_steps, "a_final": float(final.a),
        "n_halos": int(cat.size),
        "pk_over_linear_largescale": round(float(ratio), 4),
        "halo_refine": refine_used,
    }), flush=True)


if __name__ == "__main__":
    main()
