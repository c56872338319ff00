"""Simulation driver: the main evolution loop.

Re-implements `program cubep3m` (`source_threads/cubepm.f90:103-236`): the
timestep/sweep loop with scheduled checkpoint / projection / halofind
triggers, wall-clock kill checkpoints (`cubepm_kill.f90:231-258`) and final
exit on `a > 1 | max_nts | final_step`.

The device never blocks on the host except for the four dt-limit scalars
read back each step (the reference pays an mpi_reduce+bcast for the same
quantities, `particle_mesh_threaded.f90:641-698`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import SimState
from .. import kernels as kernels_mod
from ..parallel import mesh as mesh_mod
from . import step as step_mod
from .timestep import Cursors, OutputSchedule, StepDecision, decide_timestep


class RebuildRequired(RuntimeError):
    """pp_autosize grew the sizing under cfg.rebuild_policy == "exit".

    The pre-rebuild checkpoint (ckpt_prerebuild.npz, written by
    attach_outputs' on_prerebuild hook with the GROWN config already in
    repr(cfg)) is on disk; the caller should exit and relaunch, resuming
    from it — io.checkpoint.stored_sizing(path) recovers the grown knobs
    so the fresh process compiles ONCE at the right sizing.  The
    reference instead aborts outright on list overflow
    (particle_mesh_threaded.f90:280-284) and is restarted by hand."""


@dataclasses.dataclass
class StepLog:
    """Per-sweep log record (rank-0 stdout analog, timestep.f90:170-192)."""
    nts: int
    a: float
    a_mid: float
    dt: float
    limits: tuple
    wall_s: float
    pp_overflow: int = 0
    exchange_overflow: int = 0
    bucket_overflow: int = 0
    clamp_count: int = 0


class Simulation:
    """Owns the compiled sweep, kernels, schedule and output hooks."""

    def __init__(self, cfg: SimConfig,
                 schedule: Optional[OutputSchedule] = None,
                 pp_band: Optional[int] = None,
                 kill_time_s: Optional[float] = None,
                 use_kernel_cache: bool = True,
                 devices=None):
        cfg.validate()
        self.cfg = cfg
        self.schedule = schedule or OutputSchedule()
        self.cursors = Cursors()
        self.mesh = mesh_mod.make_sim_mesh(cfg.nodes_dim, devices)
        kern_f, kern_c = kernels_mod.build_kernels(cfg,
                                                   use_cache=use_kernel_cache)
        self.kern_f = jnp.asarray(kern_f)
        self.kern_c = jnp.asarray(kern_c)
        self.pp_band = pp_band if pp_band is not None else cfg.pp_band
        if cfg.staged_sweep:
            self.sweep = step_mod.make_staged_sweep(cfg, self.mesh,
                                                    pp_band=self.pp_band)
        else:
            self.sweep = step_mod.make_sweep(cfg, self.mesh,
                                             pp_band=self.pp_band)
        self.kill_time_s = kill_time_s
        self._steps_since_occ_probe = 0
        self._sweep_executed = False
        self._start_wall = time.time()
        self.logs: List[StepLog] = []
        # per-step coarse P(k) records (coarse_power.f90 `ps_c` role):
        # [(nts, a, k[h/Mpc], P(k)[Mpc/h]^3), ...] when cfg.coarse_ps
        self.coarse_ps_log: List[tuple] = []
        # output hooks: fn(sim, state, decision) -> None
        self.on_checkpoint: List[Callable] = []
        self.on_projection: List[Callable] = []
        self.on_halofind: List[Callable] = []
        self.on_kill: List[Callable] = []
        # fired with the CURRENT state right before any pp_autosize sweep
        # recompile: three TPU worker crashes this round happened exactly
        # inside mid-run rebuilds (campaign_r4c.log), so the state is
        # checkpointed first and a crashed rebuild loses nothing
        self.on_prerebuild: List[Callable] = []

    # ------------------------------------------------------------------
    def attach_outputs(self, outdir: str, reference_format: bool = False,
                       native_checkpoints: bool = True,
                       projections: bool = True,
                       halofinds: bool = True,
                       async_checkpoints: bool = False) -> None:
        """Register the standard output writers (cubepm.f90:171-233 trigger
        path): checkpoints, projections, halo catalogs, kill checkpoint.

        `async_checkpoints` drains native checkpoint writes on a background
        thread (io.checkpoint.AsyncWriter) so sweeps continue during the
        state pull; call `finish()` (or let the final checkpoint's wait do
        it) before reading the files."""
        from ..io import checkpoint as ckpt_mod
        from ..analysis import projection as proj_mod
        from ..analysis import halofind as hf_mod

        writer = ckpt_mod.AsyncWriter() if async_checkpoints else None
        self._async_writer = writer

        def _sched_z(lst, cursor):
            # name outputs by the scheduled redshift, like the reference's
            # z_checkpoint lists (not the f32-achieved scale factor)
            if cursor < len(lst):
                return 1.0 / lst[cursor] - 1.0
            return None

        def _ckpt(sim, state, dec):
            from .timestep import Cursors
            z = _sched_z(sim.schedule.checkpoints, sim.cursors.checkpoint)
            zs = f"{z:.3f}" if z is not None else ckpt_mod.z_string(
                float(state.a))
            # save POST-trigger cursors so a resume continues past this
            # step's outputs (the reference increments cur_checkpoint
            # before writing, checkpoint.f90:68)
            cur = Cursors(
                checkpoint=sim.cursors.checkpoint + 1,
                projection=sim.cursors.projection
                + (1 if dec.projection_step else 0),
                halofind=sim.cursors.halofind
                + (1 if dec.halofind_step else 0))
            if native_checkpoints:
                if writer is not None:
                    writer.submit(ckpt_mod.save_native,
                                  f"{outdir}/ckpt_{zs}.npz",
                                  sim.cfg, state, cur)
                else:
                    ckpt_mod.save_native(f"{outdir}/ckpt_{zs}.npz",
                                         sim.cfg, state, cur)
            if reference_format:
                ckpt_mod.write_reference_checkpoint(outdir, sim.cfg, state,
                                                    cur, z=z)

        def _proj(sim, state, dec):
            z = _sched_z(sim.schedule.projections, sim.cursors.projection)
            proj_mod.write_projections(outdir, sim.cfg, state, z=z)

        def _halo(sim, state, dec):
            z = _sched_z(sim.schedule.halofinds, sim.cursors.halofind)
            cat = hf_mod.find_halos(sim.cfg, state)
            hf_mod.write_catalog(outdir, sim.cfg, state, cat, z=z)

        def _kill(sim, state, dec):
            ckpt_mod.save_native(f"{outdir}/ckpt_kill.npz", sim.cfg, state,
                                 sim.cursors)
            if reference_format:
                ckpt_mod.write_reference_checkpoint(outdir, sim.cfg, state,
                                                    sim.cursors, kill=True)

        def _prerebuild(sim, state, dec):
            ckpt_mod.save_native(f"{outdir}/ckpt_prerebuild.npz", sim.cfg,
                                 state, sim.cursors)

        self.on_checkpoint.append(_ckpt)
        if projections:
            self.on_projection.append(_proj)
        if halofinds:
            self.on_halofind.append(_halo)
        self.on_kill.append(_kill)
        self.on_prerebuild.append(_prerebuild)

    def finish(self) -> None:
        """Drain any in-flight async checkpoint write."""
        w = getattr(self, "_async_writer", None)
        if w is not None:
            w.wait()

    def write_log(self, path: str) -> None:
        """Dump the structured step log as JSON lines (the reference's
        machine-parseable stdout + utils/timestep_parse.py role)."""
        import json
        with open(path, "w") as f:
            for l in self.logs:
                f.write(json.dumps({
                    "nts": l.nts, "a": l.a, "a_mid": l.a_mid, "dt": l.dt,
                    "limits": list(l.limits), "wall_s": l.wall_s,
                    "pp_overflow": l.pp_overflow,
                    "exchange_overflow": l.exchange_overflow,
                    "bucket_overflow": l.bucket_overflow,
                    "clamp_count": l.clamp_count}) + "\n")

    def dt_limits(self, state: SimState) -> tuple:
        return (float(state.dt_f_acc), float(state.dt_pp_acc),
                float(state.dt_pp_ext_acc), float(state.dt_c_acc),
                float(state.dt_gas_acc))

    def step(self, state: SimState) -> tuple[SimState, StepDecision]:
        """One sweep: decide dt on host, run the jitted sweep on device."""
        cfg = self.cfg
        a = float(state.a)
        dec = decide_timestep(cfg, a, self.dt_limits(state), self.schedule,
                              self.cursors)
        t0 = time.time()
        tau_new = float(state.tau) + dec.dt
        t_new = float(state.t) + dec.dt
        state = self.sweep(state, self.kern_f, self.kern_c,
                           dec.a_mid, dec.dt, dec.a_new, tau_new, t_new)
        self._sweep_executed = True
        # the dt-limit scalars force one small device sync per step
        limits = self.dt_limits(state)
        wall = time.time() - t0
        self.logs.append(StepLog(
            nts=int(state.nts), a=dec.a_new, a_mid=dec.a_mid, dt=dec.dt,
            limits=dec.limits, wall_s=wall,
            pp_overflow=int(state.pp_overflow),
            exchange_overflow=int(state.exchange_overflow),
            bucket_overflow=int(state.bucket_overflow),
            clamp_count=int(state.clamp_count)))
        if self.cfg.verbosity >= 2:
            l = self.logs[-1]
            print(f"sweep {l.nts}: a={l.a:.6f} dt={l.dt:.4f} "
                  f"limits={tuple(round(x, 3) for x in l.limits)} "
                  f"wall={l.wall_s:.3f}s")
        l = self.logs[-1]
        if self.cfg.verbosity >= 1 and (l.pp_overflow or l.bucket_overflow
                                        or l.exchange_overflow
                                        or l.clamp_count):
            # the reference mpi_aborts on any such invariant break; we
            # count, surface loudly, and keep going
            print(f"WARNING sweep {l.nts}: pp_overflow={l.pp_overflow} "
                  f"exchange_overflow={l.exchange_overflow} "
                  f"bucket_overflow={l.bucket_overflow} "
                  f"clamp_count={l.clamp_count} — raise pp_dense_band / "
                  f"pp_coarse_capacity / buffers / check dt")

        if cfg.coarse_ps:
            self._record_coarse_ps(state)

        # output triggers
        if dec.checkpoint_step:
            for h in self.on_checkpoint:
                h(self, state, dec)
            self.cursors.checkpoint += 1
        if dec.projection_step:
            for h in self.on_projection:
                h(self, state, dec)
            self.cursors.projection += 1
        if dec.halofind_step:
            for h in self.on_halofind:
                h(self, state, dec)
            self.cursors.halofind += 1
        return state, dec

    def _record_coarse_ps(self, state: SimState) -> None:
        """Coarse-grid P(k) after a sweep (the reference's per-step
        `coarse_ps` diagnostic, coarse_power.f90): device-resident on one
        device, via a host gather on a multi-device mesh."""
        from ..analysis import power as pw
        cfg = self.cfg
        if cfg.nodes_dim == 1:
            ps = pw.power_on_device(cfg, state.x, int(state.np_local[0]),
                                    ngrid=cfg.nc_dim)
        else:
            # device-side deposit; only the small coarse grid moves to host
            grid = pw.coarse_grid_global(cfg, state, self.mesh)
            n_tot = int(np.sum(np.asarray(state.np_local)))
            delta = grid * (grid.size / n_tot) - 1.0
            ps = pw.measure_power(delta, cfg.box, assignment="cic",
                                  subtract_shot=None)
        self.coarse_ps_log.append((int(state.nts), float(state.a),
                                   ps.k, ps.pk))

    def write_coarse_ps(self, path: str) -> None:
        """Dump the per-step coarse spectra as JSON lines."""
        import json
        with open(path, "w") as f:
            for nts, a, k, pk in self.coarse_ps_log:
                f.write(json.dumps({"nts": nts, "a": a,
                                    "k": list(map(float, k)),
                                    "pk": list(map(float, pk))}) + "\n")

    def profile(self, state: SimState, trace_dir: str,
                steps: int = 3) -> SimState:
        """Capture a `jax.profiler` device trace of `steps` sweeps
        (the reference's -DMPI_TIME per-phase timing role, timers.f90:68-77,
        at full XLA-op granularity).  View with TensorBoard or Perfetto on
        the files written under `trace_dir`."""
        import jax.profiler
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                state, _ = self.step(state)
        return state

    def _rebuild_or_raise(self, state: SimState) -> None:
        """Pre-rebuild checkpoint, then either recompile in place or —
        under cfg.rebuild_policy == "exit", once a sweep has actually
        executed — raise RebuildRequired so the PROCESS can exit and a
        fresh one resume with the grown sizing.  Mid-run recompiles
        crashed the tunneled TPU worker 4/4 times this round
        (campaign_r4c.log); the safety checkpoint carries the GROWN
        config (save_native stores repr(cfg)), so the relaunch adopts it
        via io.checkpoint.stored_sizing."""
        self._fire_prerebuild(state)
        if self.cfg.rebuild_policy == "exit" and self._sweep_executed:
            raise RebuildRequired(
                f"pp_autosize grew the sizing (pp_dense_band="
                f"{self.cfg.pp_dense_band}, pp_dense_cap_frac="
                f"{self.cfg.pp_dense_cap_frac}, pp_ext_band="
                f"{self.cfg.pp_ext_band}, pp_ext_ghost_cap="
                f"{self.cfg.pp_ext_ghost_cap}, pp_coarse_capacity="
                f"{self.cfg.pp_coarse_capacity}); resume from the "
                f"pre-rebuild checkpoint in a fresh process")
        self._rebuild_sweep()

    def _fire_prerebuild(self, state: SimState) -> None:
        """Safety checkpoint before a sweep recompile (see on_prerebuild).
        Never raises: losing the safety net must not kill a healthy run."""
        for cb in self.on_prerebuild:
            try:
                cb(self, state, None)
            except Exception as e:  # noqa: BLE001
                print(f"# prerebuild checkpoint failed (continuing): "
                      f"{e!r}", flush=True)

    def _rebuild_sweep(self) -> None:
        """Recompile the sweep after a config change (pp_autosize); cached
        chunk programs and the staged stepper are invalidated with it."""
        if self.cfg.staged_sweep:
            self.sweep = step_mod.make_staged_sweep(self.cfg, self.mesh,
                                                    pp_band=self.pp_band)
        else:
            self.sweep = step_mod.make_sweep(self.cfg, self.mesh,
                                             pp_band=self.pp_band)
        self._chunks = {}
        if hasattr(self, "_staged_stepper"):
            del self._staged_stepper
        # the ext probe bakes in pp_ext_band_eff; rebuild it lazily
        if hasattr(self, "_ext_probe"):
            del self._ext_probe

    def pp_autosize_check(self, state: SimState, steps: int = 1,
                          overflowed: bool = False,
                          bucket_overflowed: bool = False,
                          allow_shrink: bool = False) -> None:
        """Adaptive dense-tail sizing (cfg.pp_autosize): every
        `pp_autosize_every` sweeps, probe (a) a shake-invariant bound on
        the max same-fine-cell occupancy and (b) a bound on the
        per-device dense-population, and PREEMPTIVELY rebuild the sweep
        with a doubled `pp_dense_band` / grown `pp_dense_cap_frac` once
        either nears its window, so no step ever drops pairs.  (b)
        matters on multi-device meshes: the dense buffer is sized per
        device from `max_np`, and the device holding the biggest halo
        can exhaust it long before occupancy outgrows the band.  The
        reference sizes its per-cell list statically and aborts on
        overflow (particle_mesh_threaded.f90:280-284).

        `overflowed=True` (reactive backstop, set by run() whenever a
        sweep actually reported pp_overflow > 0) forces an immediate
        probe; if the bounds say the current sizing already suffices —
        i.e. drift between probes outran the bound — both knobs are
        grown anyway.  Drops are then confined to the one sweep that
        surfaced them instead of persisting a whole probe period."""
        cfg = self.cfg
        if not (cfg.pp_autosize and cfg.pp):
            return
        if bucket_overflowed and cfg.pp_ext:
            # reactive PP_EXT growth (the reference aborts when a
            # coarse-cell list overflows; our builds drop and count
            # instead — double the binding capacity and rebuild)
            if cfg.pp_ext_impl == "lattice":
                # overflow mixes ghost-buffer drops and dense-tail
                # residuals; grow all three knobs (reactive = blind).
                # The band is CAPPED (pp_ext_band_cap): its cost is
                # O(band) on EVERY particle, so occupancy beyond the cap
                # spills to the tail window, which only dense-cell
                # particles pay for — an uncapped band doubling reached
                # 8192 in round 4, whose single-dispatch wall time
                # killed the TPU worker (r8_ppext128_leg1.log)
                newband = min(cfg.pp_ext_band_eff * 2,
                              cfg.pp_ext_band_cap)
                newtail = cfg.pp_ext_tail_band_eff * 2
                newghost = (cfg.pp_ext_ghost_cap
                            or cfg.pp_ext_ghost_cap_auto()) * 2
                newcap = min(cfg.pp_ext_dense_cap_eff * 2, cfg.max_np)
                if self.cfg.verbosity >= 1:
                    print(f"pp_autosize: lattice pp_ext overflow -> "
                          f"pp_ext_band {cfg.pp_ext_band_eff} -> {newband}, "
                          f"pp_ext_tail_band -> {newtail}, "
                          f"pp_ext_dense_cap -> {newcap}, "
                          f"pp_ext_ghost_cap -> {newghost} "
                          f"(recompiling sweep)", flush=True)
                self.cfg = cfg = dataclasses.replace(
                    cfg, pp_ext_band=newband, pp_ext_tail_band=newtail,
                    pp_ext_dense_cap=newcap, pp_ext_ghost_cap=newghost)
            else:
                newcap = cfg.pp_coarse_capacity * 2
                if self.cfg.verbosity >= 1:
                    print(f"pp_autosize: bucket overflow -> "
                          f"pp_coarse_capacity "
                          f"{cfg.pp_coarse_capacity} -> {newcap} "
                          f"(recompiling sweep)", flush=True)
                self.cfg = cfg = dataclasses.replace(
                    cfg, pp_coarse_capacity=newcap)
            self._rebuild_or_raise(state)
        self._steps_since_occ_probe += steps
        if (not overflowed
                and self._steps_since_occ_probe < cfg.pp_autosize_every):
            return
        self._steps_since_occ_probe = 0
        if not hasattr(self, "_occ_probe"):
            self._occ_probe = step_mod.make_occupancy_probe(
                cfg, self.mesh, band=self.pp_band)
        occ, n_dense = (int(v) for v in
                        self._occ_probe(state.x, state.np_local))
        head = cfg.pp_autosize_headroom
        new_band = cfg.pp_dense_band
        while occ > head * (new_band + 1):
            new_band *= 2
        new_frac = cfg.pp_dense_cap_frac
        while (n_dense > head * max(64, int(cfg.max_np * new_frac))
               and new_frac < 1.0):
            new_frac = min(1.0, new_frac * 2)

        # preemptive lattice PP_EXT sizing (same contract as the dense
        # probe: grow BEFORE any pair or ghost copy is dropped; the
        # reactive branch above becomes a pure backstop).  Policy: the
        # band grows only to pp_ext_band_cap (cost O(band) on every
        # particle), the TAIL window takes the rest (cost only on
        # dense-cell particles), the dense-cap fraction covers the tail
        # population and the ghost cap the face skin.
        new_ext_band = cfg.pp_ext_band_eff if cfg.pp_ext else 0
        new_ext_tail = cfg.pp_ext_tail_band_eff if cfg.pp_ext else 0
        new_ext_cap = cfg.pp_ext_dense_cap_eff if cfg.pp_ext else 0
        new_ghost = (cfg.pp_ext_ghost_cap or cfg.pp_ext_ghost_cap_auto()
                     ) if cfg.pp_ext else 0
        ext_msg = ""
        if cfg.pp_ext and cfg.pp_ext_impl == "lattice":
            if not hasattr(self, "_ext_probe"):
                self._ext_probe = step_mod.make_pp_ext_probe(cfg, self.mesh)
            if self._ext_probe is not None:
                ext_occ, ext_dense, skin = (int(v) for v in
                                            self._ext_probe(state.x,
                                                            state.np_local))
                while (ext_occ > head * (new_ext_band + 1)
                       and new_ext_band < cfg.pp_ext_band_cap):
                    new_ext_band = min(2 * new_ext_band,
                                       cfg.pp_ext_band_cap)
                while ext_occ > head * (new_ext_tail + 1):
                    new_ext_tail *= 2
                while skin > head * new_ghost:
                    new_ghost *= 2
                # the ext tail buffer must hold the dense population;
                # its size is pure per-sweep COST (O(tail*cap) per
                # shift, used or not), so the probe also RIGHT-SIZES it
                # downward at presize time, where nothing is compiled
                # yet and the rebuild is free
                while ext_dense > head * new_ext_cap:
                    new_ext_cap = min(new_ext_cap * 2, cfg.max_np)
                if allow_shrink:
                    # 2x the headroomed bound: enough slack that normal
                    # clustering growth between presizes doesn't force a
                    # rebuild-exit ladder, still ~2-4x cheaper than the
                    # shared cap at production resume points
                    tight = max(4096, 2 * (int(ext_dense / head) + 1))
                    if tight < new_ext_cap:
                        new_ext_cap = tight
                ext_msg = (f", ext occ/dense/skin bounds {ext_occ}/"
                           f"{ext_dense}/{skin} -> pp_ext_band "
                           f"{cfg.pp_ext_band_eff} -> {new_ext_band}, "
                           f"tail {cfg.pp_ext_tail_band_eff} -> "
                           f"{new_ext_tail}, dense_cap "
                           f"{cfg.pp_ext_dense_cap_eff} -> {new_ext_cap}, "
                           f"ghost_cap -> {new_ghost}")

        ext_changed = cfg.pp_ext and (
            new_ext_band > cfg.pp_ext_band_eff
            or new_ext_tail > cfg.pp_ext_tail_band_eff
            or new_ext_cap != cfg.pp_ext_dense_cap_eff
            or new_ghost > (cfg.pp_ext_ghost_cap
                            or cfg.pp_ext_ghost_cap_auto()))
        if (new_band == cfg.pp_dense_band
                and new_frac == cfg.pp_dense_cap_frac and not ext_changed):
            if not overflowed:
                return
            new_band = min(cfg.pp_dense_band * 2, cfg.max_np)
            new_frac = min(1.0, cfg.pp_dense_cap_frac * 2)
            if (new_band == cfg.pp_dense_band
                    and new_frac == cfg.pp_dense_cap_frac):
                return  # both already at their ceilings
        if self.cfg.verbosity >= 1:
            print(f"pp_autosize: occupancy bound {occ}, dense-pop bound "
                  f"{n_dense}/device{' (reactive)' if overflowed else ''}"
                  f" -> pp_dense_band "
                  f"{cfg.pp_dense_band} -> {new_band}, pp_dense_cap_frac "
                  f"{cfg.pp_dense_cap_frac} -> {new_frac}{ext_msg} "
                  f"(recompiling sweep)", flush=True)
        repl = dict(pp_dense_band=new_band, pp_dense_cap_frac=new_frac)
        if ext_changed:
            repl.update(pp_ext_band=new_ext_band,
                        pp_ext_tail_band=new_ext_tail,
                        pp_ext_dense_cap=new_ext_cap,
                        pp_ext_ghost_cap=new_ghost)
        self.cfg = dataclasses.replace(cfg, **repl)
        self._rebuild_or_raise(state)

    # chunk sizes compiled on demand (device-side dt control between
    # scheduled outputs; one host sync per chunk instead of per sweep)
    CHUNK_SIZES = (8, 4)  # tunneled executions beyond ~30s wall hang the worker

    def _get_chunk(self, size: int):
        if not hasattr(self, "_chunks"):
            self._chunks = {}
        if size not in self._chunks:
            self._chunks[size] = step_mod.make_chunked_sweep(
                self.cfg, self.mesh, self.sweep, size)
        return self._chunks[size]

    def _run_staged_chunk(self, state: SimState, size: int) -> SimState:
        """`size` staged steps with on-device dt decisions — the host
        dispatches blind and fences once (staged-mode chunking)."""
        if not hasattr(self, "_staged_stepper"):
            self._staged_stepper = step_mod.make_staged_stepper(
                self.cfg, self.sweep)
        for _ in range(size):
            state = self._staged_stepper(state, self.kern_f, self.kern_c)
        return state

    def _steps_to_next_event(self, a: float) -> int:
        """Safe number of sweeps before the next scheduled output could
        trigger: per-step growth is bounded by ra_max."""
        import math
        s = self.schedule
        targets = []
        for lst, cur in ((s.checkpoints, self.cursors.checkpoint),
                         (s.projections, self.cursors.projection),
                         (s.halofinds, self.cursors.halofind)):
            if cur < len(lst):
                targets.append(lst[cur])
        next_a = min(targets) if targets else 1.0
        if next_a <= a:
            return 0
        return max(0, int(math.log(next_a / a)
                          / -math.log(1.0 - self.cfg.ra_max)) - 2)

    def presize_from_state(self, state: SimState) -> None:
        """Probe `state`'s occupancy ONCE and apply the pp_autosize growth
        rule BEFORE the first sweep compile.

        Call after loading a mid-run checkpoint: a resumed late-time state
        can already exceed the default dense-tail sizing, and letting the
        reactive path discover that mid-run costs a ~160 s sweep recompile
        while ~GBs of state are resident (the r4 256^3 leg's TPU worker
        died exactly there, bench_logs/campaign_r4c.log).  Pre-sizing
        moves the rebuild to t=0 where the sweep has not been compiled
        yet, so growth is free.  No-op when pp_autosize is off or the
        probed bounds fit the current windows."""
        self._steps_since_occ_probe = 0
        self.pp_autosize_check(state, steps=self.cfg.pp_autosize_every,
                               allow_shrink=True)

    def run(self, state: SimState, max_steps: Optional[int] = None,
            use_chunks: bool = True) -> SimState:
        """Evolve until the final checkpoint, a > 1, or max_nts
        (cubepm.f90:235 exit condition).

        Far from scheduled outputs, steps run in on-device chunks (dt
        control in the compiled scan) to avoid per-step host round trips;
        output landing always happens through host-side single steps.
        """
        cfg = self.cfg
        max_steps = max_steps if max_steps is not None else cfg.max_nts
        # coarse_ps is a PER-STEP diagnostic: it forces host stepping so
        # no sweep is skipped inside a device-side chunk
        chunkable = (use_chunks and cfg.cosmo_expansion
                     and not cfg.coarse_ps)
        steps_done = 0
        while steps_done < max_steps:
            dec = None
            size = 0
            if chunkable:
                budget = min(self._steps_to_next_event(float(state.a)),
                             max_steps - steps_done)
                size = next((s for s in self.CHUNK_SIZES if s <= budget), 0)
            if size:
                t0 = time.time()
                if cfg.staged_sweep:
                    state = self._run_staged_chunk(state, size)
                else:
                    state = self._get_chunk(size)(state, self.kern_f,
                                                  self.kern_c)
                self._sweep_executed = True
                steps_done += size
                if cfg.verbosity >= 2:
                    print(f"chunk x{size}: a={float(state.a):.6f} "
                          f"wall={time.time() - t0:.3f}s "
                          f"({(time.time() - t0) / size * 1e3:.1f} "
                          f"ms/sweep)")
                # chunk counters are in-chunk high-water marks
                ovf = cfg.pp_autosize and int(state.pp_overflow) > 0
                bovf = (cfg.pp_autosize and cfg.pp_ext
                        and int(state.bucket_overflow) > 0)
            else:
                state, dec = self.step(state)
                steps_done += 1
                ovf = bool(self.logs and self.logs[-1].pp_overflow)
                bovf = bool(self.logs and self.logs[-1].bucket_overflow)
            self.pp_autosize_check(state, steps=size or 1, overflowed=ovf,
                                   bucket_overflowed=bovf)
            # wall-clock kill checkpoint applies to chunked stepping too
            # (cubepm_kill.f90:231-258; long runs spend most steps chunked)
            if self.kill_time_s is not None and self.on_kill and (
                    time.time() - self._start_wall > self.kill_time_s):
                for h in self.on_kill:
                    h(self, state, dec)
                break
            if (dec is not None and dec.final_step) or (
                    cfg.cosmo_expansion and float(state.a) >= 1.0):
                break
        self.finish()
        return state
