"""Host-side timestep control and output scheduling.

Re-implements `source_threads/timestep.f90:2-237`: pick dt as the minimum of
the expansion limit and the force limits accumulated during the previous
sweep, then shrink it to land exactly on the next scheduled output scale
factor (checkpoint > projection > halofind priority), broadcasting the
decision (here: passing scalars into the jitted sweep — the reference uses
eight rank-0 `mpi_bcast`s, `timestep.f90:228-235`).

This is O(1) scalar host work per step; keeping it off-device mirrors the
reference's rank-0 decision logic and avoids polluting the compiled sweep
with data-dependent control flow.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

from ..config import SimConfig, G
from .. import cosmology


@dataclasses.dataclass
class OutputSchedule:
    """Scheduled output scale factors (reference reads redshift lists from
    `input/checkpoints`, `input/projections`, `input/halofinds`;
    variable_initialization.f90:69-211)."""

    checkpoints: List[float] = dataclasses.field(default_factory=list)
    projections: List[float] = dataclasses.field(default_factory=list)
    halofinds: List[float] = dataclasses.field(default_factory=list)

    @classmethod
    def from_redshifts(cls, checkpoints: Sequence[float] = (),
                       projections: Sequence[float] = (),
                       halofinds: Sequence[float] = ()) -> "OutputSchedule":
        z2a = lambda zs: sorted(1.0 / (1.0 + z) for z in zs)
        return cls(checkpoints=z2a(checkpoints),
                   projections=z2a(projections),
                   halofinds=z2a(halofinds))

    @classmethod
    def from_input_dir(cls, path: str) -> "OutputSchedule":
        """Read the reference's `input/` redshift list files (one redshift
        per line: `checkpoints`, `projections`, `halofinds`;
        variable_initialization.f90:69-211).  Missing files = empty list."""
        import os

        def read(name):
            p = os.path.join(path, name)
            if not os.path.exists(p):
                return []
            with open(p) as f:
                return [float(line) for line in f
                        if line.strip() and not line.startswith("#")]

        return cls.from_redshifts(checkpoints=read("checkpoints"),
                                  projections=read("projections"),
                                  halofinds=read("halofinds"))


@dataclasses.dataclass
class Cursors:
    """Output cursors (cur_checkpoint etc., part of checkpoint headers)."""
    checkpoint: int = 0
    projection: int = 0
    halofind: int = 0

    @classmethod
    def for_resume(cls, schedule: "OutputSchedule", a: float,
                   eps: float = 1e-5) -> "Cursors":
        """Cursors consistent with `schedule` at scale factor `a`: each
        cursor counts the entries already passed.  Use when resuming a
        checkpoint under a DIFFERENT schedule than the one that wrote it
        (e.g. a two-leg campaign whose leg 2 truncates the lists) — the
        saved cursors index the old lists and can overflow or skip
        triggers in the new one.

        `eps` must swallow f32 landing error: the driver clamps dt to LAND
        on a trigger, but the landed `state.a` is f32 and can sit a few
        ulp BELOW the f64 schedule entry — with a too-tight eps the resume
        re-fires the trigger it resumed from (the r4 256^3 leg re-wrote
        its 470 MB z=10 checkpoint).  Schedule entries are >=0.07 apart in
        a, so 1e-5 cannot skip a genuinely-pending trigger."""
        done = lambda lst: sum(1 for x in lst if x <= a + eps)
        return cls(checkpoint=done(schedule.checkpoints),
                   projection=done(schedule.projections),
                   halofind=done(schedule.halofinds))


@dataclasses.dataclass
class StepDecision:
    dt: float
    a_mid: float
    da: float
    a_new: float
    checkpoint_step: bool = False
    projection_step: bool = False
    halofind_step: bool = False
    final_step: bool = False
    limits: Tuple[float, ...] = ()


_BIG = 1.0e9


def _next_a(schedule_list: List[float], cursor: int) -> float:
    return schedule_list[cursor] if cursor < len(schedule_list) else _BIG


def decide_timestep(cfg: SimConfig, a: float, dt_limits: Sequence[float],
                    schedule: OutputSchedule, cursors: Cursors
                    ) -> StepDecision:
    """One rank-0 timestep decision.

    dt_limits: (dt_f_acc, dt_pp_acc, dt_pp_ext_acc, dt_c_acc) from the
    previous sweep (primed to 1000 before the first).
    """
    c = cfg.cosmo
    if not cfg.cosmo_expansion:
        dt = min(1.0, *dt_limits) * cfg.dt_scale
        return StepDecision(dt=dt, a_mid=1.0, da=0.0, a_new=1.0,
                            limits=tuple(dt_limits))

    dt_e = cosmology.dt_expansion_limit(
        a, c, dt_max=cfg.dt_max, ra_max=cfg.ra_max,
        da_max=cfg.da_max if cfg.restrict_da else None)
    dt = min(dt_e, *dt_limits) * cfg.dt_scale

    da1, da2 = cosmology.expansion(a, dt, c)
    da = da1 + da2

    dec = StepDecision(dt=dt, a_mid=a + da / 2.0, da=da, a_new=a + da,
                       limits=(dt_e,) + tuple(dt_limits))

    # output triggers: shrink dt to land exactly on the next scheduled a
    # (timestep.f90:121-161); priority checkpoint > projection > halofind,
    # coincident outputs share the step.
    a_cp = _next_a(schedule.checkpoints, cursors.checkpoint)
    a_pp = _next_a(schedule.projections, cursors.projection)
    a_hf = _next_a(schedule.halofinds, cursors.halofind)
    am = min(a_cp, a_pp, a_hf)

    def _land(target: float) -> None:
        nonlocal da
        dec.dt = dt * (target - a) / da
        d1, d2 = cosmology.expansion(a, dec.dt, c)
        da = d1 + d2
        dec.da = da
        dec.a_mid = a + da / 2.0
        dec.a_new = a + da

    if a_cp == am and a + da > a_cp:
        dec.checkpoint_step = True
        _land(a_cp)
        if cursors.checkpoint + 1 >= len(schedule.checkpoints):
            dec.final_step = True
        if a_pp == am:
            dec.projection_step = True
        if a_hf == am:
            dec.halofind_step = True
    elif a_pp == am and a + da > a_pp:
        dec.projection_step = True
        _land(a_pp)
        if a_hf == am:
            dec.halofind_step = True
    elif a_hf == am and a + da > a_hf:
        dec.halofind_step = True
        _land(a_hf)

    return dec
