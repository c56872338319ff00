"""Expansion integrator tests (reference timestep.f90:241-293 contract)."""
import math

import pytest

from cubep3m_tpu.config import Cosmology
from cubep3m_tpu import cosmology as cosmo


def test_eds_expansion_matches_analytic():
    """Einstein-de Sitter: a(tau) with adot = (2/3) a^(3/2).

    a = (1 + tau/3 * sqrt(a0) ... analytic: da/dtau = (2/3) a^{3/2}
    => a(tau) = a0 / (1 - a0^{1/2} tau / 3)^2.
    """
    c = Cosmology(omega_m=1.0, omega_l=0.0, omega_b=0.0)
    a0 = 0.01
    dt = 0.05
    da1, da2 = cosmo.expansion(a0, dt, c)
    a_num = a0 + da1 + da2
    a_exact = a0 / (1.0 - math.sqrt(a0) * dt / 3.0) ** 2
    assert abs(a_num - a_exact) / a_exact < 1e-8


def test_expansion_two_halves_consistent():
    c = Cosmology()
    a0 = 0.1
    da1, da2 = cosmo.expansion(a0, 0.02, c)
    # second half should grow slightly more (accelerating a-growth in tau)
    assert da2 > da1 > 0


def test_dt_expansion_limit_respects_ra_max():
    c = Cosmology()
    a = 0.01
    dt_e = cosmo.dt_expansion_limit(a, c, dt_max=100.0, ra_max=0.01)
    da1, da2 = cosmo.expansion(a, dt_e, c)
    da = da1 + da2
    assert da / (a + da) <= 0.01 * 1.001


def _rk4_a(a0, dt, adot_fn, nsub=2000):
    """Reference integration of da/dtau = adot(a)."""
    a = a0
    h = dt / nsub
    for _ in range(nsub):
        k1 = adot_fn(a)
        k2 = adot_fn(a + 0.5 * h * k1)
        k3 = adot_fn(a + 0.5 * h * k2)
        k4 = adot_fn(a + h * k3)
        a += h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return a


def test_lcdm_taylor_matches_rk4():
    c = Cosmology(omega_m=0.24, omega_l=0.76)
    a0, dt = 0.2, 0.05
    da1, da2 = cosmo.expansion(a0, dt, c)
    a_rk = _rk4_a(a0, dt, lambda a: cosmo._lcdm_derivs(a, c)[0])
    assert abs((a0 + da1 + da2) - a_rk) / a_rk < 1e-7


def test_chaplygin_taylor_matches_rk4():
    """3rd-order Taylor integrator vs RK4 of the same adot(a) formula
    (timestep.f90:296-339 contract)."""
    c = Cosmology(omega_m=0.3, chaplygin=True, omega_ch=0.7,
                  A_ch=0.8, alpha_ch=0.5)
    a0, dt = 0.2, 0.001  # da/a ~ 1% per step, the regime ra_max enforces
    da1, da2 = cosmo.expansion(a0, dt, c)
    a_rk = _rk4_a(a0, dt, lambda a: cosmo._chaplygin_derivs(a, c)[0])
    # we integrate the Chaplygin adot(a) with RK4 substeps; must track the
    # fine-grained reference integration closely
    assert abs((a0 + da1 + da2) - a_rk) / a_rk < 1e-9


def test_growth_factor_eds():
    """EdS growth D(a) ∝ a."""
    c = Cosmology(omega_m=1.0, omega_l=0.0)
    d1 = cosmo.growth_factor(0.5, c)
    d2 = cosmo.growth_factor(1.0, c)
    assert abs(d2 / d1 - 2.0) < 1e-2
    f = cosmo.growth_rate_f(0.5, c)
    assert abs(f - 1.0) < 1e-2


def test_device_chaplygin_expansion_matches_host():
    """On-device RK4 Chaplygin background (device_timestep.expansion_dev)
    tracks the host controller's integration of the same adot(a)."""
    import jax.numpy as jnp
    from cubep3m_tpu.core import device_timestep as dts

    c = Cosmology(omega_m=0.3, chaplygin=True, omega_ch=0.7,
                  A_ch=0.8, alpha_ch=0.5)
    a0, dt = 0.2, 0.01
    da1_h, da2_h = cosmo.expansion(a0, dt, c)
    da1_d, da2_d = dts.expansion_dev(jnp.float32(a0), jnp.float32(dt), c)
    assert abs(float(da1_d) - da1_h) / da1_h < 2e-4
    assert abs(float(da2_d) - da2_h) / da2_h < 2e-4
