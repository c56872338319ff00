"""Mass function, velocity power, force harnesses, C2Ray fields."""
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu.config import Cosmology
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.analysis import massfunc as mf
from cubep3m_tpu.analysis import velpower as vp
from cubep3m_tpu.analysis import forcetest as ft
from cubep3m_tpu.analysis import halofind as hf


def test_theory_mass_functions_sane():
    c = Cosmology()
    m = np.logspace(11, 15, 16)
    for kind in ("ps", "st", "tinker"):
        dn = mf.theory_dndlnm(m, c, a=1.0, kind=kind)
        assert np.all(dn > 0)
        assert np.all(np.diff(np.log(dn)) < 0)  # falling with mass
    # ST exceeds PS at the high-mass end (standard result)
    assert (mf.theory_dndlnm(m[-2:], c, kind="st")
            > mf.theory_dndlnm(m[-2:], c, kind="ps")).all()


def test_measured_mass_function_counts():
    cfg = small_config()
    masses = np.array([200.0, 400.0, 800.0, 3200.0])  # grid units
    res = mf.measured_dndlnm(cfg, masses, nbins=5)
    assert res.counts.sum() == 4
    assert np.all(res.dndlnm >= 0)


def test_velocity_power_of_coherent_flow():
    """A uniform bulk flow has only the k~0 mode; the measured velocity
    power at k>0 must be tiny compared to the flow speed."""
    cfg = small_config(tiles_node_dim=4)
    rng = np.random.default_rng(3)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (5000, 3)).astype(np.float32)
    v = np.tile(np.array([[0.5, 0.0, 0.0]], np.float32), (5000, 1))
    ps = vp.velocity_power(cfg, x, v, ngrid=32)
    assert np.all(ps.pk < 1e-3 * 0.25 * cfg.box ** 3)


def test_pairwise_force_sweep_harness():
    cfg = small_config(cosmo_expansion=False)
    sim = Simulation(cfg, pp_band=16)
    res = ft.pairwise_force_sweep(cfg, sim.kern_f, sim.kern_c,
                                  min_sep=2.0, max_sep=8.0,
                                  n_sep=6, n_orient=4)
    assert res.sep.size == 24
    # radial force tracks the exact law within the NGP error envelope
    assert np.median(np.abs(res.f_radial / res.f_exact - 1.0)) < 0.3
    assert np.median(res.frac_err) < 0.35


def test_superposition_harness():
    cfg = small_config(cosmo_expansion=False)
    sim = Simulation(cfg, pp_band=16)
    st = state_mod.random_ic(cfg, seed=6, fraction=0.2)
    res = ft.superposition_test(cfg, st, sim.kern_f, sim.kern_c)
    n = int(st.np_local[0])
    # the bulk of particles see the removed particle's contribution with
    # mesh-level accuracy
    err = res.frac_err[:n]
    err = np.delete(err, res.removed_index)
    assert np.median(err) < 0.5
    assert np.all(np.isfinite(err))


def test_c2ray_fields():
    cfg = small_config()
    st = state_mod.random_ic(cfg, seed=9)
    fields = hf.c2ray_fields(cfg, st)
    m = cfg.nf_physical_dim // cfg.mesh_scale
    assert fields["density"].shape == (m, m, m)
    assert fields["velocity"].shape == (3, m, m, m)
    assert fields["clumping"].shape == (m, m, m)
    # mean density 1 in grid units (mass-weighted pooling)
    total = fields["density"].mean()
    expect = int(st.np_local[0]) * cfg.mass_p / cfg.nf_physical_dim ** 3
    np.testing.assert_allclose(total, expect, rtol=1e-5)
    assert np.all(fields["clumping"] >= 0.99)  # <rho^2>/<rho>^2 >= 1
