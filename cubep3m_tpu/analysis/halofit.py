"""HALOFIT nonlinear matter power spectrum (Takahashi et al. 2012).

The reference's acceptance methodology compares simulated P(k) against
CAMB outputs, whose nonlinear spectra are HALOFIT (the Takahashi 2012
revision of Smith et al. 2003, ApJ 761, 152 appendix).  This module
provides that prediction natively so acceptance runs can quote a
quantitative sim/theory ratio in the NONLINEAR regime instead of only
the large-scale linear check (reference comparison workflow:
utils/cic_power/cic_power.f90 outputs vs CAMB tables).

Host/numpy analysis code (runs once per measurement; no jit).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from ..config import Cosmology
from ..ic import transfer as tr


def _omegas(c: Cosmology, a: float) -> tuple[float, float]:
    """(Omega_m(a), Omega_de(a)) for flat-or-curved LCDM/wCDM."""
    w = c.wde
    om = c.omega_m * a ** -3
    ok = (1.0 - c.omega_m - c.omega_l) * a ** -2
    ol = c.omega_l * a ** (-3.0 * (1.0 + w))
    e2 = om + ok + ol
    return om / e2, ol / e2


class _Spectral(NamedTuple):
    k_sigma: float   # nonlinear scale [h/Mpc]: sigma(1/k_sigma) = 1
    n_eff: float     # effective slope at the nonlinear scale
    curv: float      # spectral curvature C at the nonlinear scale


def _spectral_params(lin: tr.LinearPower) -> _Spectral:
    """Gaussian-filtered sigma^2(R) and its log derivatives at sigma=1.

    sigma^2(R)    = int Delta^2_L(k) exp(-k^2 R^2) dln k
    n_eff         = -3 - dln sigma^2 / dln R
    C             = -d^2 ln sigma^2 / dln R^2
    (Smith et al. 2003 eqs. 54-58; Gaussian window, NOT the tophat used
    for sigma8 normalization.)
    """
    lk = np.linspace(np.log(1e-4), np.log(1e3), 4096)
    k = np.exp(lk)
    d2 = lin.delta2(k)

    def moments(ln_r: float):
        x2 = (k * math.exp(ln_r)) ** 2
        w = np.exp(-x2)
        s2 = np.trapezoid(d2 * w, lk)
        m1 = np.trapezoid(d2 * w * (-2.0 * x2), lk)          # d s2/dlnR
        m2 = np.trapezoid(d2 * w * (4.0 * x2 * x2 - 4.0 * x2), lk)
        return s2, m1, m2

    # bisect sigma^2(R) = 1 on lnR (sigma^2 decreases monotonically in R)
    lo, hi = math.log(1e-4), math.log(1e2)
    if moments(lo)[0] < 1.0:
        # spectrum never reaches sigma=1 (very high z / tiny amplitude):
        # the nonlinear correction is negligible; pin to the smallest R
        return _Spectral(k_sigma=math.exp(-lo), n_eff=-3.0 -
                         moments(lo)[1] / max(moments(lo)[0], 1e-30),
                         curv=0.0)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if moments(mid)[0] > 1.0:
            lo = mid
        else:
            hi = mid
    ln_r = 0.5 * (lo + hi)
    s2, m1, m2 = moments(ln_r)
    d1 = m1 / s2
    dd2 = m2 / s2 - d1 * d1
    return _Spectral(k_sigma=math.exp(-ln_r), n_eff=-3.0 - d1, curv=-dd2)


def nonlinear_delta2(lin: tr.LinearPower, k: np.ndarray) -> np.ndarray:
    """Takahashi-2012 HALOFIT Delta^2_NL(k) from a z-scaled linear
    spectrum (`tr.linear_power(cosmo, a)`); k in h/Mpc."""
    k = np.asarray(k, dtype=np.float64)
    sp = _spectral_params(lin)
    n, c = sp.n_eff, sp.curv
    om_m, om_de = _omegas(lin.cosmo, lin.a)
    w = lin.cosmo.wde
    wfac = om_de * (1.0 + w)

    a_n = 10.0 ** (1.5222 + 2.8553 * n + 2.3706 * n ** 2 + 0.9903 * n ** 3
                   + 0.2250 * n ** 4 - 0.6038 * c + 0.1749 * wfac)
    b_n = 10.0 ** (-0.5642 + 0.5864 * n + 0.5716 * n ** 2 - 1.5474 * c
                   + 0.2279 * wfac)
    c_n = 10.0 ** (0.3698 + 2.0404 * n + 0.8161 * n ** 2 + 0.5869 * c)
    gamma_n = 0.1971 - 0.0843 * n + 0.8460 * c
    alpha_n = abs(6.0835 + 1.3373 * n - 0.1959 * n ** 2 - 5.5274 * c)
    beta_n = (2.0379 - 0.7354 * n + 0.3157 * n ** 2 + 1.2490 * n ** 3
              + 0.3980 * n ** 4 - 0.1682 * c)
    nu_n = 10.0 ** (5.2105 + 3.6902 * n)   # mu_n = 0 in Takahashi 2012

    f1 = om_m ** -0.0307
    f2 = om_m ** -0.0585
    f3 = om_m ** 0.0743

    y = k / sp.k_sigma
    d2_lin = lin.delta2(k)

    # two-halo (quasi-linear) term
    fy = y / 4.0 + y ** 2 / 8.0
    d2_q = (d2_lin * (1.0 + d2_lin) ** beta_n / (1.0 + alpha_n * d2_lin)
            * np.exp(-fy))

    # one-halo term
    d2_hp = (a_n * y ** (3.0 * f1)
             / (1.0 + b_n * y ** f2 + (c_n * f3 * y) ** (3.0 - gamma_n)))
    d2_h = d2_hp / (1.0 + nu_n / np.maximum(y, 1e-30) ** 2)

    return d2_q + d2_h


def nonlinear_power(c: Cosmology, a: float, k: np.ndarray,
                    **linear_kw) -> np.ndarray:
    """Convenience: build the z-scaled linear spectrum and return
    Delta^2_NL(k).  `linear_kw` forwards to `tr.linear_power`
    (transfer functions / CAMB files)."""
    return nonlinear_delta2(tr.linear_power(c, a, **linear_kw), k)
