"""Transfer functions and linear power spectra.

Replaces `utils/dist_init/dist_init.f90:transferfnc` (reads CMBfast/CAMB
tables, normalizes to sigma8) and its `power/Dgrow/tophat` helpers.  Adds a
BBKS analytic transfer function so ICs need no external file.

Units: k in h/Mpc, box in Mpc/h; the dimensionless power is
Delta^2(k) = A k^(3+n) T(k)^2, normalized so that the z=0 tophat variance
at 8 Mpc/h equals sigma8^2, then scaled to the IC redshift with the
Carroll-Press-Turner growth approximation (dist_init.f90:2654-2671 uses the
same `Dgrow`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import numpy as np

from ..config import Cosmology


def dgrow(a: float, c: Cosmology) -> float:
    """Carroll-Press-Turner growth factor (dist_init.f90:2654-2671)."""
    om, ol = c.omega_m, c.omega_l
    hsq = om / a ** 3 + (1 - om - ol) / a ** 2 + ol
    oma = om / (a ** 3 * hsq)
    ola = ol / hsq
    g = 2.5 * om / (om ** (4 / 7) - ol + (1 + om / 2) * (1 + ol / 70))
    ga = 2.5 * oma / (oma ** (4 / 7) - ola + (1 + oma / 2) * (1 + ola / 70))
    return a * ga / g


def tophat(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.ones_like(x)
    nz = x != 0
    out[nz] = 3 * (np.sin(x[nz]) - np.cos(x[nz]) * x[nz]) / x[nz] ** 3
    return out


def bbks_transfer(k: np.ndarray, c: Cosmology) -> np.ndarray:
    """BBKS (1986) CDM transfer function with Sugiyama baryon correction."""
    # shape parameter Gamma (Sugiyama 1995), in h/Mpc units for k in h/Mpc
    gamma = c.omega_m * c.h0 * np.exp(
        -c.omega_b * (1 + np.sqrt(2 * c.h0) / c.omega_m))
    q = np.maximum(np.asarray(k, dtype=np.float64) / gamma, 1e-30)
    return (np.log(1 + 2.34 * q) / (2.34 * q)
            * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
               + (6.71 * q) ** 4) ** -0.25)


@dataclasses.dataclass
class LinearPower:
    """Dimensionless linear power Delta^2(k) at a given scale factor."""

    cosmo: Cosmology
    transfer: Callable[[np.ndarray], np.ndarray]
    amplitude: float = 1.0      # set by normalize()
    a: float = 1.0              # epoch of the spectrum

    def delta2(self, k: np.ndarray) -> np.ndarray:
        """Dimensionless power Delta^2(k), k in h/Mpc."""
        k = np.asarray(k, dtype=np.float64)
        return (self.amplitude * k ** (3 + self.cosmo.n_s)
                * self.transfer(k) ** 2)

    def pk(self, k: np.ndarray) -> np.ndarray:
        """P(k) in (Mpc/h)^3."""
        k = np.asarray(k, dtype=np.float64)
        return self.delta2(k) * 2 * math.pi ** 2 / np.maximum(k, 1e-30) ** 3

    def sigma_r(self, r: float = 8.0) -> float:
        """Tophat-filtered rms at radius r Mpc/h (log-k quadrature)."""
        lk = np.linspace(np.log(1e-4), np.log(1e3), 4096)
        k = np.exp(lk)
        integrand = self.delta2(k) * tophat(k * r) ** 2
        return float(np.sqrt(np.trapezoid(integrand, lk)))


def linear_power(c: Cosmology, a: float,
                 transfer: Optional[Callable] = None,
                 transfer_file: Optional[str] = None) -> LinearPower:
    """Build a sigma8-normalized linear power spectrum at scale factor a.

    Normalization: amplitude set so sigma8(z=0) = c.sigma8, then scaled by
    (Dgrow(a)/Dgrow(1))^2 (dist_init.f90:597 contract).
    """
    if transfer_file is not None:
        tf = load_transfer_file(transfer_file)
    elif transfer is not None:
        tf = transfer
    else:
        tf = lambda k: bbks_transfer(k, c)
    p = LinearPower(cosmo=c, transfer=tf, amplitude=1.0, a=a)
    s8 = p.sigma_r(8.0)
    growth2 = (dgrow(a, c) / dgrow(1.0, c)) ** 2
    p.amplitude = (c.sigma8 / s8) ** 2 * growth2
    return p


def load_transfer_file(path: str, k_col: int = 0, t_col: int = 1):
    """Load a CAMB/CMBfast-style transfer table: columns k [h/Mpc], T(k).

    Returns an interpolating callable normalized to T(k->0)=1
    (transferfnc reads `cmbfast.lcdm` the same way, dist_init.f90:550-626).
    """
    data = np.loadtxt(path)
    k = data[:, k_col]
    t = data[:, t_col]
    t = t / t[0]
    logk, logt = np.log(k), np.log(np.maximum(np.abs(t), 1e-30))

    def tf(kq):
        kq = np.asarray(kq, dtype=np.float64)
        return np.exp(np.interp(np.log(np.maximum(kq, k[0])), logk, logt))

    return tf
