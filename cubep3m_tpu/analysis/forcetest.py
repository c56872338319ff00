"""Built-in force-accuracy harnesses.

Re-implements the reference's physics test modes (SURVEY.md §4.2):

* `pairwise_force_sweep` — `pairwise_ic` + `report_pair.f90:38-73` +
  `set_pair.f90`: two particles at controlled separations; compares the
  simulated force against exact -mass_p/r^2, logging radial/tangential
  components and fractional error over a separation sweep.

* `superposition_test` — `superposition_test` flag + `report_force.f90`:
  compute forces for a particle set, remove one particle, recompute; the
  force difference on every remaining particle must equal the removed
  particle's direct (softened) 1/r^2 contribution.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..config import SimConfig
from .. import state as state_mod
from ..core import step as step_mod


class PairSweepResult(NamedTuple):
    sep: np.ndarray          # separations
    f_radial: np.ndarray     # measured radial force (toward partner)
    f_tangential: np.ndarray  # magnitude of the tangential residual
    f_exact: np.ndarray      # exact mass_p/r^2
    frac_err: np.ndarray     # |F - F_exact| / |F_exact|


def pairwise_force_sweep(cfg: SimConfig, kern_f, kern_c,
                         min_sep: float = 1.0, max_sep: Optional[float] = None,
                         n_sep: int = 32, n_orient: int = 8,
                         seed: int = 0) -> PairSweepResult:
    """Force error vs separation over random orientations/placements."""
    import jax

    nf = cfg.nf_physical_node_dim
    max_sep = max_sep or nf / 4.0
    rng = np.random.default_rng(seed)
    # one compile for the whole sweep (pair states share shapes)
    forces = jax.jit(lambda st: step_mod.compute_forces(cfg, st, kern_f,
                                                        kern_c))
    seps, f_rad, f_tan, f_ex, errs = [], [], [], [], []
    for s in np.linspace(min_sep, max_sep, n_sep):
        for _ in range(n_orient):
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            center = nf / 2.0 + rng.uniform(-2, 2, 3)
            x1 = center + u * s / 2.0
            x2 = center - u * s / 2.0
            st = state_mod.pair_ic(cfg, x1, x2)
            f = np.asarray(forces(st))
            fe = cfg.mass_p / s ** 2
            fr = -np.dot(f[0], u)           # attraction toward partner
            ft = np.linalg.norm(f[0] + fr * u)
            seps.append(s)
            f_rad.append(fr)
            f_tan.append(ft)
            f_ex.append(fe)
            errs.append(np.linalg.norm(f[0] - (-fe * u)) / fe)
    return PairSweepResult(*(np.array(a) for a in
                             (seps, f_rad, f_tan, f_ex, errs)))


class SuperpositionResult(NamedTuple):
    frac_err: np.ndarray     # per-particle fractional force error
    removed_index: int


def superposition_test(cfg: SimConfig, state, kern_f, kern_c,
                       remove_index: Optional[int] = None
                       ) -> SuperpositionResult:
    """Hole-digging test: F_all - F_without_i == direct force from i."""
    n = int(state.np_local[0])
    x = np.asarray(state.x)[:n]
    if remove_index is None:
        # pick a particle in the densest fine cell (reference removes one
        # from the densest halo, report_force.f90:40-60)
        nf = cfg.nf_physical_node_dim
        cells = np.floor(x).astype(np.int64)
        flat = (cells[:, 0] * nf + cells[:, 1]) * nf + cells[:, 2]
        counts = np.bincount(flat)
        remove_index = int(np.argmax(counts[flat]))
    i = remove_index

    f_all = np.asarray(step_mod.compute_forces(cfg, state, kern_f,
                                               kern_c))[:n]

    x2 = np.delete(x, i, axis=0)
    st2 = state_mod.particles_ic(cfg, x2, np.zeros_like(x2))
    f_wo = np.asarray(step_mod.compute_forces(cfg, st2, kern_f, kern_c))
    f_wo_full = np.insert(f_wo[: n - 1], i, 0.0, axis=0)

    # direct softened contribution of particle i on everyone else
    nf = cfg.nf_physical_node_dim
    sep = x - x[i]
    sep -= nf * np.round(sep / nf)
    r = np.linalg.norm(sep, axis=1)
    ok = (np.arange(n) != i) & (r > cfg.rsoft)
    f_direct = np.zeros_like(x)
    f_direct[ok] = (-cfg.mass_p * sep[ok]
                    / (r[ok, None] * cfg.pp_bias) ** 3)

    diff = f_all - f_wo_full
    denom = np.maximum(np.linalg.norm(f_direct, axis=1), 1e-12)
    err = np.linalg.norm(diff - f_direct, axis=1) / denom
    err[i] = 0.0
    return SuperpositionResult(frac_err=err, removed_index=i)