"""FLRW background expansion in CubeP3M code units.

Re-derivation of the reference integrator (`source_threads/timestep.f90:241-339`,
Hy Trac / Pat McDonald / Joachim Harnois-Deraps): the Friedmann equation in
super-comoving time τ with `omHsq = (2/3)**2` is Taylor-expanded to 3rd order
and integrated in two half steps.  Supports a constant dark-energy EoS `wde`
and the Chaplygin-gas background.

These run on host (float64) — they are O(1) scalar work per step, used by the
dt controller; keeping them off-device avoids polluting the jitted step with
tiny scalar math.
"""
from __future__ import annotations

import math
from typing import Tuple

from .config import Cosmology

_OM_HSQ = 4.0 / 9.0  # (2/3)^2: code-unit Hubble normalization


def _lcdm_derivs(a: float, c: Cosmology) -> Tuple[float, float, float]:
    """(adot, addot, atdot) for LCDM + wde at scale factor a."""
    a3rlm = a ** (-3.0 * c.wde) * c.omega_l / c.omega_m
    arkm = a * (1.0 - c.omega_m - c.omega_l) / c.omega_m
    adot = math.sqrt(_OM_HSQ * a ** 3 * (1.0 + arkm + a3rlm))
    addot = a ** 2 * _OM_HSQ * (1.5 + 2.0 * arkm + 1.5 * (1.0 - c.wde) * a3rlm)
    atdot = a * adot * _OM_HSQ * (
        3.0 + 6.0 * arkm
        + 1.5 * (2.0 - 3.0 * c.wde) * (1.0 - c.wde) * a3rlm)
    return adot, addot, atdot


def _chaplygin_derivs(a: float, c: Cosmology) -> Tuple[float, float, float]:
    """(adot, addot, atdot) for a Chaplygin-gas background at scale factor a."""
    a3rchm = a ** (-3.0) * c.omega_ch / c.omega_m
    arkm = a * (1.0 - c.omega_m - c.omega_ch) / c.omega_m
    g_ch = c.A_ch + (1.0 - c.A_ch) * a ** (-3.0 - 3.0 * c.alpha_ch)
    inv1pa = 1.0 / (1.0 + c.alpha_ch)
    adot = math.sqrt(_OM_HSQ * a ** 3 * (1.0 + arkm + a3rchm * g_ch ** inv1pa))
    addot = a ** 2 * _OM_HSQ * (
        1.5 + 2.0 * arkm
        + 3.0 * a3rchm * c.A_ch * g_ch ** (-c.alpha_ch * inv1pa))
    atdot = a * adot * _OM_HSQ * (
        3.0 + 6.0 * arkm
        + 3.0 * a3rchm * g_ch ** (inv1pa - 2.0) * (
            5.0 * c.A_ch ** 2
            + 3.0 * c.A_ch * (1.0 - c.A_ch) * a ** (-3.0 - 3.0 * c.alpha_ch)
            * (2.0 + c.alpha_ch / 2.0)
            + (1.0 - c.A_ch) ** 2 * a ** (-6.0 - 6.0 * c.alpha_ch)))
    return adot, addot, atdot


def _half_step_da(a: float, dt_half: float, c: Cosmology) -> float:
    if c.chaplygin:
        # NOTE: the reference's Chaplygin addot/atdot (timestep.f90:296-339)
        # are inconsistent with its own adot (they do not satisfy
        # addot = adot * d(adot)/da; e.g. at A_ch=1, alpha=0 the Chaplygin
        # addot term should vanish but does not).  We integrate the same
        # adot(a) exactly with RK4 substeps instead — a deliberate
        # correctness divergence.
        return _rk4_da(a, dt_half, c)
    adot, addot, atdot = _lcdm_derivs(a, c)
    return (adot * dt_half
            + addot * dt_half ** 2 / 2.0
            + atdot * dt_half ** 3 / 6.0)


def _rk4_da(a: float, dt: float, c: Cosmology, nsub: int = 8) -> float:
    a0 = a
    h = dt / nsub
    for _ in range(nsub):
        k1 = _chaplygin_derivs(a, c)[0]
        k2 = _chaplygin_derivs(a + 0.5 * h * k1, c)[0]
        k3 = _chaplygin_derivs(a + 0.5 * h * k2, c)[0]
        k4 = _chaplygin_derivs(a + h * k3, c)[0]
        a += h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return a - a0


def expansion(a0: float, dt: float, c: Cosmology) -> Tuple[float, float]:
    """Integrate the scale factor over dt in two half steps.

    Returns (da1, da2): growth over the first and second half of the step.
    Matches the reference's `expansion(a0, dt0, da1, da2)`.
    """
    dt_half = dt / 2.0
    da1 = _half_step_da(a0, dt_half, c)
    da2 = _half_step_da(a0 + da1, dt_half, c)
    return da1, da2


def dt_expansion_limit(a: float, c: Cosmology, dt_max: float,
                       ra_max: float, da_max: float | None = None,
                       max_iter: int = 10) -> float:
    """Largest dt with relative expansion da/(a+da) <= ra_max.

    Iterative shrink exactly as `timestep.f90:60-88` (RESTRICT_DA optional).
    """
    dt_e = dt_max
    for _ in range(max_iter):
        da1, da2 = expansion(a, dt_e, c)
        da = da1 + da2
        ra = da / (a + da)
        if ra > ra_max:
            dt_e = dt_e * (ra_max / ra)
        else:
            break
    if da_max is not None:
        for _ in range(max_iter):
            da1, da2 = expansion(a, dt_e, c)
            da = da1 + da2
            if da > da_max:
                dt_e = dt_e * (da_max / da)
            else:
                break
    return dt_e


# ----------------------------------------------------------------------
# Linear growth (for Zel'dovich ICs and analysis), standard LCDM forms.
# ----------------------------------------------------------------------
def hubble_e(a: float, c: Cosmology) -> float:
    """E(a) = H(a)/H0 for LCDM + constant wde."""
    return math.sqrt(c.omega_m / a ** 3
                     + c.omega_k / a ** 2
                     + c.omega_l * a ** (-3.0 * (1.0 + c.wde)))


def growth_factor(a: float, c: Cosmology, n: int = 4096) -> float:
    """Unnormalized linear growth D(a) ∝ H(a) ∫ da / (a H)^3 (LCDM integral)."""
    e = hubble_e(a, c)
    total = 0.0
    # midpoint rule in a'
    for i in range(n):
        ai = a * (i + 0.5) / n
        total += 1.0 / (ai * hubble_e(ai, c)) ** 3
    total *= a / n
    return 2.5 * c.omega_m * e * total


def growth_rate_f(a: float, c: Cosmology, eps: float = 1e-5) -> float:
    """f = dlnD/dlna (for Zel'dovich velocities)."""
    lo, hi = growth_factor(a * (1 - eps), c), growth_factor(a * (1 + eps), c)
    return (math.log(hi) - math.log(lo)) / (2 * eps)
