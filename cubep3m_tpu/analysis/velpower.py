"""Velocity power spectra.

Replaces `utils/cic_velpower/cic_velpower.f90` (+ variants): CIC-deposited
velocity fields, auto/cross power spectra, divergence (theta) spectrum.

The velocity field is momentum/density per cell (empty cells get zero);
the reference uses the same mass-weighted estimator.  Velocities convert
from grid units to km/s via `velocity_to_kms`.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops.deposit import cic_deposit
from .power import measure_power, PowerSpectrum


def velocity_to_kms(cfg: SimConfig, a: float) -> float:
    """Convert grid velocities (cells per code-time tau) to peculiar km/s.

    Super-comoving time: dtau = (3/2) H0 dt / a^2 (so that da/dtau matches
    the code integrator with H0_code = 2/3).  Then
      v_pec = a * d(x_com)/dt = v_grid * cell_mpc * (3/2) * H0 / a,
    with cell_mpc = box/nf Mpc/h, H0 = 100 h km/s/Mpc.  Cross-check:
    Zel'dovich v_grid = vfactor*psi gives v_pec = a H f D psi (f=1 limit).
    """
    cell_mpc = cfg.box / cfg.nf_physical_dim       # Mpc/h per cell
    h0_kms = 100.0                                  # km/s per Mpc/h
    return cell_mpc * h0_kms * 1.5 / a


def _fold(g: np.ndarray, ngrid: int) -> np.ndarray:
    g = np.array(g)
    for ax in range(3):
        sl = [slice(None)] * 3

        def s(a, b):
            q = sl.copy()
            q[ax] = slice(a, b)
            return tuple(q)

        g[s(ngrid, ngrid + 1)] += g[s(0, 1)]
        g[s(1, 2)] += g[s(ngrid + 1, ngrid + 2)]
        g = g[s(1, ngrid + 1)]
    return g


def velocity_field(cfg: SimConfig, x: np.ndarray, v: np.ndarray,
                   ngrid: Optional[int] = None) -> np.ndarray:
    """(3, n, n, n) mass-weighted velocity field from particles."""
    ngrid = ngrid or cfg.nf_physical_dim
    scale = cfg.nf_physical_dim / ngrid
    xj = jnp.asarray(x)
    ones = jnp.ones((x.shape[0],), jnp.float32)
    shape = (ngrid + 2,) * 3
    rho = _fold(cic_deposit(xj, ones, shape, scale=scale, offset=-0.5,
                            pad=1), ngrid)
    out = []
    for c in range(3):
        mom = _fold(cic_deposit(xj, jnp.asarray(v[:, c]), shape, scale=scale,
                                offset=-0.5, pad=1), ngrid)
        out.append(np.where(rho > 0, mom / np.maximum(rho, 1e-20), 0.0))
    return np.stack(out)


def velocity_power(cfg: SimConfig, x: np.ndarray, v: np.ndarray,
                   ngrid: Optional[int] = None) -> PowerSpectrum:
    """Total velocity power: sum of the three component auto-spectra."""
    vf = velocity_field(cfg, x, v, ngrid)
    ps = None
    for c in range(3):
        p = measure_power(vf[c], cfg.box, assignment="cic")
        ps = p if ps is None else PowerSpectrum(
            k=p.k, delta2=ps.delta2 + p.delta2, pk=ps.pk + p.pk,
            nmodes=p.nmodes)
    return ps


def divergence_power(cfg: SimConfig, x: np.ndarray, v: np.ndarray,
                     ngrid: Optional[int] = None) -> PowerSpectrum:
    """Velocity-divergence (theta) power spectrum."""
    vf = velocity_field(cfg, x, v, ngrid)
    n = vf.shape[1]
    k = np.fft.fftfreq(n) * 2 * math.pi  # per-cell wavenumber
    theta_k = (1j * k[:, None, None] * np.fft.fftn(vf[0])
               + 1j * k[None, :, None] * np.fft.fftn(vf[1])
               + 1j * k[None, None, :] * np.fft.fftn(vf[2]))
    theta = np.fft.ifftn(theta_k).real
    return measure_power(theta, cfg.box)


def cross_power(cfg: SimConfig, f1: np.ndarray, f2: np.ndarray
                ) -> PowerSpectrum:
    """Cross power of two scalar fields (cic_velpower cross-spectra role)."""
    n = f1.shape[0]
    d1 = np.fft.fftn(f1.astype(np.float64)) / n ** 3
    d2 = np.fft.fftn(f2.astype(np.float64)) / n ** 3
    prod = (d1 * np.conj(d2)).real
    k = np.fft.fftfreq(n) * n
    kr = np.sqrt(k[:, None, None] ** 2 + k[None, :, None] ** 2
                 + k[None, None, :] ** 2)
    kbins = np.arange(0.5, n // 2, 1.0)
    which = np.digitize(kr.ravel(), kbins)
    nbin = kbins.size + 1
    counts = np.bincount(which, minlength=nbin)[1:-1]
    psum = np.bincount(which, weights=prod.ravel(), minlength=nbin)[1:-1]
    ksum = np.bincount(which, weights=kr.ravel(), minlength=nbin)[1:-1]
    ok = counts > 0
    k_phys = (ksum[ok] / counts[ok]) * 2 * math.pi / cfg.box
    pk = psum[ok] / counts[ok] * cfg.box ** 3
    return PowerSpectrum(k=k_phys, delta2=pk * k_phys ** 3 / (2 * math.pi ** 2),
                         pk=pk, nmodes=counts[ok])
