"""Coupled gravity+gas stepping (cubepm.f90 MHD main-loop contract)."""
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core.driver import Simulation


@pytest.fixture(scope="module")
def sim_mhd():
    cfg = small_config(mhd=True, cosmo_expansion=True, z_i=50.0,
                       gas_p_init=1e-6)
    return Simulation(cfg, pp_band=16)


def test_mhd_sweep_runs_and_conserves_gas_mass(sim_mhd):
    cfg = sim_mhd.cfg
    st = state_mod.random_ic(cfg, seed=7)
    gas_mass0 = float(np.asarray(st.gas_u)[0].sum())
    for _ in range(3):
        st, dec = sim_mhd.step(st)
    gas = np.asarray(st.gas_u)
    assert np.all(np.isfinite(gas))
    assert np.all(gas[0] > 0)
    gas_mass1 = float(gas[0].sum())
    assert abs(gas_mass1 - gas_mass0) / gas_mass0 < 1e-4
    assert float(st.dt_gas_acc) > 0


def test_gas_feels_gravity(sim_mhd):
    """A dark-matter clump must pull gas toward it (momentum grows toward
    the clump; fine_velocity.f90 coupling)."""
    cfg = sim_mhd.cfg
    nf = cfg.nf_physical_node_dim
    rng = np.random.default_rng(8)
    center = np.array([nf / 2.0] * 3)
    x = np.vstack([rng.uniform(0, nf, (1000, 3)),
                   center + rng.normal(scale=1.0, size=(800, 3))]
                  ).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    for _ in range(3):
        st, dec = sim_mhd.step(st)
    gas = np.asarray(st.gas_u)
    # radial momentum toward the clump in a shell around it
    g = np.arange(nf) + 0.5
    dx = g[:, None, None] - center[0]
    dy = g[None, :, None] - center[1]
    dz = g[None, None, :] - center[2]
    r = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
    shell = (r > 2) & (r < 8)
    vr = (gas[1] * dx + gas[2] * dy + gas[3] * dz) / np.maximum(r, 1e-3)
    assert vr[shell].mean() < 0  # infall


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 devices")
def test_mhd_multidevice_runs_and_conserves():
    """Coupled MHD on a 2^3 device mesh: gas halos exchange across devices
    (comm_bufferupdate role), mass conserved."""
    import numpy as np
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu import state as state_mod_
    cfg = small_config(nodes_dim=2, tiles_node_dim=2, mhd=True,
                       cosmo_expansion=True, z_i=50.0, gas_p_init=1e-6)
    sim = Simulation(cfg, pp_band=16)
    rng = np.random.default_rng(11)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (3000, 3)).astype(np.float32)
    st = state_mod_.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, sim.mesh)
    gas_mass0 = float(np.asarray(st.gas_u)[0].sum())
    for _ in range(2):
        st, dec = sim.step(st)
    gas = np.asarray(st.gas_u)
    assert np.all(np.isfinite(gas))
    assert abs(float(gas[0].sum()) - gas_mass0) / gas_mass0 < 1e-4
    assert int(np.asarray(st.np_local).sum()) == 3000


def test_mhd_pp_force_scaled_by_dm_fraction():
    """In MHD runs the DM-DM short-range pair force carries the
    (1 - omega_b/omega_m) mass fraction, like the mesh deposit weight
    (reference particle_mesh_threaded.f90 MHD PPINT branch)."""
    import jax.numpy as jnp
    import numpy as np
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.core.driver import Simulation

    kick = {}
    for mhd in (False, True):
        cfg = small_config(mhd=mhd, cosmo_expansion=False, shake=False,
                           pp=True)
        sim = Simulation(cfg)
        nf = cfg.nf_physical_node_dim
        # same-cell pair: force is pure PPINT (mesh contribution of a
        # sub-cell pair is negligible by comparison at this separation)
        x1 = np.array([nf / 2 + 0.2] * 3, np.float32)
        x2 = np.array([nf / 2 + 0.7] * 3, np.float32)
        st = state_mod.pair_ic(cfg, x1, x2)
        st = step_mod.shard_state(st, sim.mesh)
        st2 = sim.sweep(st, sim.kern_f, sim.kern_c, jnp.float32(1.0),
                        jnp.float32(1e-3), jnp.float32(1.0),
                        jnp.float32(1e-3), jnp.float32(1e-3))
        kick[mhd] = np.asarray(st2.v[0])
    fb = 0.04 / 0.24  # small_config default cosmology omega_b/omega_m
    ratio = np.linalg.norm(kick[True]) / np.linalg.norm(kick[False])
    np.testing.assert_allclose(ratio, 1.0 - fb, rtol=0.05)


def test_gas_ic_from_particles_conserves_and_traces():
    """The reference-faithful gas IC (mhd_init.f90 GetU: CIC deposit of
    the displaced Zel'dovich particles): exact mean density 1, momentum
    consistent with the particle momenta, energy >= kinetic + floor."""
    import dataclasses
    import jax.numpy as jnp
    from cubep3m_tpu.ic import zeldovich as zl
    cfg = small_config(mhd=True, z_i=50.0, gas_p_init=1e-6,
                       gas_ic="particles")
    st = zl.zeldovich_ic(cfg, seed=3)
    u = np.asarray(st.gas_u)
    nf = cfg.nf_physical_node_dim
    assert u.shape == (5, nf, nf, nf)
    # total deposited mass mass_p * np == nf^3 exactly (mean rho 1)
    assert abs(u[0].mean() - 1.0) < 1e-5
    assert np.all(u[0] >= 0)
    # total gas momentum == total particle momentum (CIC weights sum 1)
    n = int(st.np_local[0])
    v = np.asarray(st.x * 0 + st.v)[:n]
    pm = cfg.mass_p * v.sum(axis=0)
    gm = u[1:4].sum(axis=(1, 2, 3))
    assert np.allclose(gm, pm, rtol=1e-3, atol=1e-2)
    # energy >= kinetic part, with the pressure floor everywhere
    floor = cfg.gas_p_init / (cfg.gas_gamma - 1.0)
    assert np.all(u[4] >= floor * 0.999)
    # At z_i the Zel'dovich displacements are sub-half-cell, so every
    # particle's CIC cloud stays inside its 2-cell home block and the
    # deposited DENSITY is exactly uniform above the lattice scale
    # (measured pooled std ~ 3e-8 = fp32 noise) — identical to the
    # reference's GetU construction, where the IC perturbation enters
    # through the MOMENTUM field and density contrast develops
    # dynamically.  So the cross-check against the delta-traced variant
    # (same realization) is on the momentum field.
    cfg_d = dataclasses.replace(cfg, gas_ic="delta")
    st_d = zl.zeldovich_ic(cfg_d, seed=3)
    ud = np.asarray(st_d.gas_u)

    def pool(f):
        nb = f.shape[0] // 4
        return f.reshape(nb, 4, nb, 4, nb, 4).mean(axis=(1, 3, 5))

    for ax in range(3):
        a = pool(u[1 + ax])
        b = pool(ud[1 + ax])
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.9, (ax, corr)


def test_gas_ic_cmb_thermal_floor():
    """z_i > 150 turns on the CMB-coupled thermal floor
    (mhd_init.f90:793-807); below, it is exactly zero."""
    from cubep3m_tpu.ic import zeldovich as zl
    cfg_hot = small_config(mhd=True, z_i=200.0)
    cfg_cold = small_config(mhd=True, z_i=100.0)
    assert zl.cmb_thermal_specific(cfg_hot) > 0
    assert zl.cmb_thermal_specific(cfg_cold) == 0.0
