"""Halo mass functions: measured vs Press-Schechter / Sheth-Tormen / Tinker.

Replaces `utils/PSvsSim/PS_ST_sim.f90` (+ the F77 helpers `deltac.f`,
`growth.f`, `sigma_cobe_CMBfast.f`): compares the simulated halo catalog's
mass function against analytic predictions.

All masses in M_sun/h; the catalog's grid masses convert via the particle
mass `m_p = rho_crit omega_m (box/nf)^3 * 8` (one particle per 8 cells).
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import numpy as np

from ..config import Cosmology, SimConfig
from ..ic import transfer as tr

RHO_CRIT = 2.7754e11  # M_sun/h / (Mpc/h)^3
DELTA_C = 1.686


class MassFunction(NamedTuple):
    m: np.ndarray        # bin centers [M_sun/h]
    dndlnm: np.ndarray   # comoving number density per ln mass [(Mpc/h)^-3]
    counts: np.ndarray


def m_grid_to_msun(cfg: SimConfig) -> float:
    """Mass of one grid unit (one mean-density fine cell) in M_sun/h."""
    cell_vol = (cfg.box / cfg.nf_physical_dim) ** 3
    return RHO_CRIT * cfg.cosmo.omega_m * cell_vol


def sigma_m(m: np.ndarray, c: Cosmology, lin: Optional[tr.LinearPower] = None
            ) -> np.ndarray:
    """RMS density fluctuation in tophat spheres enclosing mass m (z=0)."""
    lin = lin or tr.linear_power(c, a=1.0)
    rho_m = RHO_CRIT * c.omega_m
    r = (3.0 * np.asarray(m) / (4.0 * math.pi * rho_m)) ** (1.0 / 3.0)
    return np.array([lin.sigma_r(ri) for ri in np.atleast_1d(r)])


def _f_ps(nu: np.ndarray) -> np.ndarray:
    """Press-Schechter multiplicity f(nu)."""
    return math.sqrt(2.0 / math.pi) * nu * np.exp(-nu ** 2 / 2.0)


def _f_st(nu: np.ndarray) -> np.ndarray:
    """Sheth-Tormen multiplicity (A=0.3222, a=0.707, p=0.3)."""
    a, p, A = 0.707, 0.3, 0.3222
    anu2 = a * nu ** 2
    return (A * math.sqrt(2.0 * a / math.pi) * nu
            * (1.0 + anu2 ** -p) * np.exp(-anu2 / 2.0))


def _f_tinker(sigma: np.ndarray) -> np.ndarray:
    """Tinker et al. 2008 f(sigma) for Delta=200 (z=0 parameters)."""
    A, a, b, c = 0.186, 1.47, 2.57, 1.19
    return A * ((sigma / b) ** -a + 1.0) * np.exp(-c / sigma ** 2)


def theory_dndlnm(m: np.ndarray, c: Cosmology, a: float = 1.0,
                  kind: str = "st") -> np.ndarray:
    """dn/dlnM for PS/ST/Tinker at scale factor a."""
    lin = tr.linear_power(c, a=a)
    rho_m = RHO_CRIT * c.omega_m
    m = np.asarray(m, dtype=np.float64)
    lnm = np.log(m)
    sig = sigma_m(m, c, lin)
    dlnsig = np.gradient(np.log(sig), lnm)
    if kind == "ps":
        f = _f_ps(DELTA_C / sig)
    elif kind == "st":
        f = _f_st(DELTA_C / sig)
    elif kind == "tinker":
        f = _f_tinker(sig)
    else:
        raise ValueError(kind)
    return f * rho_m / m * np.abs(dlnsig)


def measured_dndlnm(cfg: SimConfig, halo_masses_grid: np.ndarray,
                    nbins: int = 20,
                    min_particles: float = 20.0) -> MassFunction:
    """Mass function of a halo catalog (grid-unit masses)."""
    m_unit = m_grid_to_msun(cfg)
    m = np.asarray(halo_masses_grid, dtype=np.float64) * m_unit
    m_min = min_particles * cfg.mass_p * m_unit
    m = m[m >= m_min]
    if m.size == 0:
        e = np.zeros(0)
        return MassFunction(m=e, dndlnm=e, counts=e)
    edges = np.logspace(np.log10(m_min), np.log10(m.max() * 1.0001),
                        nbins + 1)
    counts, _ = np.histogram(m, bins=edges)
    dlnm = np.diff(np.log(edges))
    vol = cfg.box ** 3
    centers = np.sqrt(edges[:-1] * edges[1:])
    return MassFunction(m=centers, dndlnm=counts / (vol * dlnm),
                        counts=counts)
