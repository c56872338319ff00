"""HALOFIT (Takahashi 2012) nonlinear power: limits and known behavior.

The fitting formula is validated against its published structural
properties (the paper's own N-body calibration): linear-theory recovery
at large scales, the z-dependence of the nonlinear scale, and the
magnitude of the z=0 boost for a sigma8=0.8 LCDM cosmology.
"""
import numpy as np

from cubep3m_tpu.config import Cosmology
from cubep3m_tpu.ic import transfer as tr
from cubep3m_tpu.analysis import halofit as hft


def test_large_scale_linear_limit():
    c = Cosmology()
    lin = tr.linear_power(c, 1.0)
    k = np.array([1e-3, 5e-3, 1e-2])
    ratio = hft.nonlinear_delta2(lin, k) / lin.delta2(k)
    assert np.all(np.abs(ratio - 1.0) < 0.02)


def test_nonlinear_scale_and_boost():
    c = Cosmology()
    lin0 = tr.linear_power(c, 1.0)
    lin1 = tr.linear_power(c, 0.5)
    sp0 = hft._spectral_params(lin0)
    sp1 = hft._spectral_params(lin1)
    # sigma(8) = 0.8 at z=0 puts the nonlinear scale near k ~ 0.3-0.5
    assert 0.2 < sp0.k_sigma < 0.6
    # structure is less evolved at z=1: k_sigma moves to smaller scales
    assert sp1.k_sigma > 1.5 * sp0.k_sigma
    k = np.array([1.0])
    boost0 = float(hft.nonlinear_delta2(lin0, k) / lin0.delta2(k))
    boost1 = float(hft.nonlinear_delta2(lin1, k) / lin1.delta2(k))
    # Takahashi-calibrated z=0 boost at k=1 h/Mpc for this cosmology
    assert 4.0 < boost0 < 10.0
    assert 1.5 < boost1 < boost0


def test_monotone_and_positive():
    c = Cosmology()
    lin = tr.linear_power(c, 1.0)
    k = np.logspace(-2, 1, 64)
    nl = hft.nonlinear_delta2(lin, k)
    assert np.all(nl > 0)
    # the boost over linear grows monotonically through the nonlinear
    # regime (k > 0.1)
    ratio = nl / lin.delta2(k)
    sel = k > 0.1
    assert np.all(np.diff(ratio[sel]) > -1e-6)


def test_convenience_wrapper_matches():
    c = Cosmology()
    k = np.array([0.1, 1.0])
    lin = tr.linear_power(c, 0.5)
    np.testing.assert_allclose(hft.nonlinear_power(c, 0.5, k),
                               hft.nonlinear_delta2(lin, k), rtol=1e-12)
