"""On-device timestep control for chunked stepping.

The host controller (core/timestep.py) mirrors the reference's rank-0
decision + bcast.  On a remote-tunneled TPU, one host<->device round trip
costs ~seconds, so stepping one sweep at a time is latency-bound.  This
module re-expresses the dt decision in jnp so `lax.scan` can run chunks of
sweeps entirely on device; the host only intervenes near scheduled outputs
(exact landing still happens host-side, matching timestep.f90:121-161).

Backgrounds: LCDM(+wde) via the reference's 3rd-order Taylor integrator
(timestep.f90:241-293) and the Chaplygin gas via RK4 on the same adot(a)
(the host controller's documented correctness divergence, cosmology.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig


def lcdm_adot_terms(a, c):
    a3rlm = a ** (-3.0 * c.wde) * (c.omega_l / c.omega_m)
    arkm = a * (1.0 - c.omega_m - c.omega_l) / c.omega_m
    om_hsq = 4.0 / 9.0
    adot = jnp.sqrt(om_hsq * a ** 3 * (1.0 + arkm + a3rlm))
    addot = a ** 2 * om_hsq * (1.5 + 2.0 * arkm
                               + 1.5 * (1.0 - c.wde) * a3rlm)
    atdot = a * adot * om_hsq * (
        3.0 + 6.0 * arkm
        + 1.5 * (2.0 - 3.0 * c.wde) * (1.0 - c.wde) * a3rlm)
    return adot, addot, atdot


def chaplygin_adot(a, c):
    """adot(a) for the Chaplygin-gas background (timestep.f90:296-339's
    adot; see cosmology._chaplygin_derivs for the addot/atdot caveat)."""
    a3rchm = a ** (-3.0) * (c.omega_ch / c.omega_m)
    arkm = a * (1.0 - c.omega_m - c.omega_ch) / c.omega_m
    g_ch = c.A_ch + (1.0 - c.A_ch) * a ** (-3.0 - 3.0 * c.alpha_ch)
    om_hsq = 4.0 / 9.0
    return jnp.sqrt(om_hsq * a ** 3
                    * (1.0 + arkm + a3rchm * g_ch ** (1.0 / (1.0 + c.alpha_ch))))


def _chaplygin_half_da(a, dth, c, nsub: int = 8):
    """RK4 integral of da/dtau over one half step (cosmology._rk4_da)."""
    h = dth / nsub

    def body(_, av):
        k1 = chaplygin_adot(av, c)
        k2 = chaplygin_adot(av + 0.5 * h * k1, c)
        k3 = chaplygin_adot(av + 0.5 * h * k2, c)
        k4 = chaplygin_adot(av + h * k3, c)
        return av + h / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return jax.lax.fori_loop(0, nsub, body, a) - a


def expansion_dev(a0, dt, c):
    """(da1, da2): two half-step scale-factor increments (device); 3rd-order
    Taylor for LCDM(+wde), RK4 for Chaplygin."""
    dth = dt / 2.0
    if c.chaplygin:
        da1 = _chaplygin_half_da(a0, dth, c)
        da2 = _chaplygin_half_da(a0 + da1, dth, c)
        return da1, da2
    adot, addot, atdot = lcdm_adot_terms(a0, c)
    da1 = adot * dth + addot * dth ** 2 / 2.0 + atdot * dth ** 3 / 6.0
    adot, addot, atdot = lcdm_adot_terms(a0 + da1, c)
    da2 = adot * dth + addot * dth ** 2 / 2.0 + atdot * dth ** 3 / 6.0
    return da1, da2


def decide_dt_dev(cfg: SimConfig, a, dt_limits) -> Tuple:
    """(dt, a_mid, a_new): the rank-0 decision (timestep.f90:55-115) on
    device, without output landing."""
    c = cfg.cosmo
    if not cfg.cosmo_expansion:
        dt = jnp.minimum(1.0, jnp.min(jnp.stack(dt_limits))) * cfg.dt_scale
        one = jnp.asarray(1.0, jnp.float32)
        return dt, one, one

    def shrink(i, dt_e):
        da1, da2 = expansion_dev(a, dt_e, c)
        da = da1 + da2
        ra = da / (a + da)
        fac = jnp.where(ra > cfg.ra_max, cfg.ra_max / ra, 1.0)
        if cfg.restrict_da:
            # da_max limit (timestep.f90 restrict_da branch; mirrors the
            # host controller cosmology.dt_expansion_limit)
            fac = jnp.minimum(fac, jnp.where(da > cfg.da_max,
                                             cfg.da_max / da, 1.0))
        return dt_e * fac

    dt_e = jax.lax.fori_loop(0, 10, shrink,
                             jnp.asarray(cfg.dt_max, jnp.float32))
    dt = jnp.minimum(dt_e, jnp.min(jnp.stack(dt_limits))) * cfg.dt_scale
    da1, da2 = expansion_dev(a, dt, c)
    da = da1 + da2
    return dt, a + da / 2.0, a + da
