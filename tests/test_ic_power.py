"""IC generator + power spectrum acceptance tests (SURVEY.md §4.4:
`dist_init` P(k) must match the input linear theory)."""
import math

import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu.config import Cosmology
from cubep3m_tpu.ic import transfer as tr
from cubep3m_tpu.ic import zeldovich as zl
from cubep3m_tpu.analysis import power as pw


def test_sigma8_normalization():
    c = Cosmology()
    lin = tr.linear_power(c, a=1.0)
    assert abs(lin.sigma_r(8.0) - c.sigma8) / c.sigma8 < 1e-3


def test_growth_scaling():
    c = Cosmology()
    lin1 = tr.linear_power(c, a=1.0)
    lin2 = tr.linear_power(c, a=0.01)
    ratio = lin2.delta2(0.1) / lin1.delta2(0.1)
    d = tr.dgrow(0.01, c) / tr.dgrow(1.0, c)
    assert abs(ratio - d ** 2) / d ** 2 < 1e-10


def test_vfactor_matches_expansion():
    """vfactor = a^2 H = (da/dtau)/a, consistent with the main integrator
    (Zel'dovich velocity: v = dlnD/dtau * psi ~ (adot/a) * psi in matter
    domination)."""
    from cubep3m_tpu import cosmology as cos
    c = Cosmology()
    a = 0.02
    vf = zl.vfactor(a, c)
    da1, da2 = cos.expansion(a, 1e-6, c)
    adot = (da1 + da2) / 1e-6
    assert abs(vf - adot / a) / (adot / a) < 1e-4


def test_zeldovich_delta_power_matches_linear():
    """P(k) of the generated Gaussian field matches the target linear
    spectrum within sample variance."""
    cfg = small_config(nodes_dim=1, tiles_node_dim=4, box=100.0, z_i=20.0)
    nf = cfg.nf_physical_dim  # 64
    st, delta = zl.zeldovich_ic(cfg, seed=3, return_delta=True)
    ps = pw.measure_power(delta, cfg.box)
    lin = tr.linear_power(cfg.cosmo, cfg.a_i)
    sel = (ps.k > 2 * 2 * math.pi / cfg.box) & (ps.k < 1.0)
    ratio = ps.delta2[sel] / lin.delta2(ps.k[sel])
    # mode-count-weighted mean ratio ~ 1
    assert abs(np.average(ratio, weights=ps.nmodes[sel]) - 1.0) < 0.15


def test_zeldovich_particle_power_matches_linear():
    """CIC-deposited particle P(k) (shot-subtracted, deconvolved) matches
    linear theory at large scales."""
    cfg = small_config(nodes_dim=1, tiles_node_dim=4, box=100.0, z_i=20.0)
    st = zl.zeldovich_ic(cfg, seed=3)
    n = int(st.np_local[0])
    x = np.asarray(st.x)[:n]
    # no shot-noise subtraction: lattice-displaced ICs carry no Poisson
    # noise below the particle Nyquist (subtraction is for evolved snaps)
    ps = pw.power_of_particles(cfg, x, assignment="cic")
    lin = tr.linear_power(cfg.cosmo, cfg.a_i)
    sel = (ps.k > 3 * 2 * math.pi / cfg.box) & (ps.k < 0.8)
    ratio = ps.delta2[sel] / lin.delta2(ps.k[sel])
    assert abs(np.average(ratio, weights=ps.nmodes[sel]) - 1.0) < 0.2


def test_zeldovich_velocities_sane():
    cfg = small_config(nodes_dim=1, tiles_node_dim=4, box=100.0, z_i=20.0)
    st = zl.zeldovich_ic(cfg, seed=3)
    n = int(st.np_local[0])
    v = np.asarray(st.v)[:n]
    x = np.asarray(st.x)[:n]
    assert n == cfg.np_total
    assert np.all(np.isfinite(v))
    # Zel'dovich: v ~ vfactor * displacement; rms displacement sub-cell at
    # this redshift/box
    vf = zl.vfactor(cfg.a_i, cfg.cosmo)
    disp_rms = np.sqrt((v ** 2).mean()) / vf
    assert 0.01 < disp_rms < 4.0
    assert x.min() >= 0.0 and x.max() < cfg.nf_physical_dim


def _dist_cfg(nodes_dim):
    return small_config(nodes_dim=nodes_dim, tiles_node_dim=4 // nodes_dim,
                        box=100.0, z_i=20.0)


def test_distributed_ic_power_matches_linear():
    """zeldovich_ic_distributed on a 2^3 mesh: particle P(k) matches the
    input linear spectrum (dist_init.f90 validation role) without any
    device holding a global field."""
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    cfg = _dist_cfg(2)
    mesh = make_sim_mesh(2)
    st = zl.zeldovich_ic_distributed(cfg, mesh, seed=3)
    assert int(np.asarray(st.np_local).sum()) == cfg.np_total
    x, v, pid = state_mod.gather_global(cfg, st)
    # PIDs are the global lattice ids, each exactly once
    assert np.unique(pid).size == cfg.np_total
    ps = pw.power_of_particles(cfg, x, assignment="cic")
    lin = tr.linear_power(cfg.cosmo, cfg.a_i)
    sel = (ps.k > 3 * 2 * math.pi / cfg.box) & (ps.k < 0.8)
    ratio = ps.delta2[sel] / lin.delta2(ps.k[sel])
    assert abs(np.average(ratio, weights=ps.nmodes[sel]) - 1.0) < 0.2


def test_distributed_ewald_matches_replicated_kernel():
    """cfg.ic_correct_kernel in the DISTRIBUTED path (local compact-patch
    convolution) equals the replicated corrected global kernel applied to
    the same realization (dist_init.f90:1367-1466 role)."""
    import dataclasses
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    cfg0 = _dist_cfg(2)
    cfg1 = dataclasses.replace(cfg0, ic_correct_kernel=True)
    mesh = make_sim_mesh(2)
    st0, delta = zl.zeldovich_ic_distributed(cfg0, mesh, seed=7,
                                             return_delta=True)
    st1 = zl.zeldovich_ic_distributed(cfg1, mesh, seed=7)
    nf = cfg0.nf_physical_dim

    def sorted_x(cfg, st):
        x, _, pid = state_mod.gather_global(cfg, st)
        return x[np.argsort(pid)]

    dx = sorted_x(cfg1, st1) - sorted_x(cfg0, st0)
    dx -= nf * np.round(dx / nf)

    # expected correction from the replicated machinery on the same delta
    k = np.fft.fftfreq(nf) * nf
    kd2 = (2 * np.sin(math.pi * k / nf)) ** 2
    kd2_tot = (kd2[:, None, None] + kd2[None, :, None]
               + kd2[None, None, :])
    inv = np.where(kd2_tot > 0, 1.0 / np.maximum(kd2_tot, 1e-20), 0.0)
    dinv = zl._corrected_inv_kd2(nf, inv.astype(np.float32)) - inv
    dinv.flat[0] = 0.0
    delta_k = np.fft.fftn(delta.astype(np.float64))
    sin_g = np.sin(2 * math.pi * k / nf)
    shapes = [(nf, 1, 1), (1, nf, 1), (1, 1, nf)]
    exp = np.stack([
        np.fft.ifftn(1j * sin_g.reshape(shapes[ax]) * delta_k * dinv).real
        for ax in range(3)])
    exp_sites = exp[:, ::2, ::2, ::2].reshape(3, -1).T
    assert np.abs(exp_sites).max() > 1e-4  # the correction is nontrivial
    np.testing.assert_allclose(dx, exp_sites, atol=5e-3)


def test_distributed_ic_overflow_raises(monkeypatch):
    """Over-displaced ICs must trip an error, never silently drop
    particles (the reference aborts, particle_pass.f90:96-99)."""
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    monkeypatch.setattr(step_mod, "face_buffer_size", lambda cfg: 1)
    # z_i=0 displacements are several cells: many lattice sites cross faces
    cfg = small_config(nodes_dim=2, tiles_node_dim=2, box=20.0, z_i=0.0)
    with pytest.raises(RuntimeError, match="dropped"):
        zl.zeldovich_ic_distributed(cfg, make_sim_mesh(2), seed=3)


def test_distributed_ic_invariant_across_device_counts():
    """The block-keyed noise makes the realization identical on a 1^3 and
    a 2^3 mesh (same seed, same noise_block) up to fp32 FFT reordering."""
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    outs = {}
    for nd in (1, 2):
        cfg = _dist_cfg(nd)
        st = zl.zeldovich_ic_distributed(cfg, make_sim_mesh(nd), seed=5,
                                         noise_block=16)
        x, v, pid = state_mod.gather_global(cfg, st)
        order = np.argsort(pid)
        outs[nd] = (x[order], v[order])
    np.testing.assert_allclose(outs[1][0], outs[2][0], atol=2e-3)
    np.testing.assert_allclose(outs[1][1], outs[2][1], atol=2e-3)


def test_zeldovich_host_fft_power_and_velocities():
    """host_fft=True (numpy transforms — insurance for backends whose c2c
    limit is below nf^3) produces particles with the same linear P(k) and
    consistent velocities (v ~ vfactor * psi at the particle)."""
    cfg = small_config(nodes_dim=1, tiles_node_dim=4, box=100.0, z_i=20.0)
    st = zl.zeldovich_ic(cfg, seed=5, host_fft=True)
    n = int(st.np_local[0])
    assert n == cfg.np_total
    x = np.asarray(st.x)[:n]
    v = np.asarray(st.v)[:n]
    assert np.all(np.isfinite(v)) and np.all((x >= 0) & (x < cfg.nf_physical_dim))
    ps = pw.power_of_particles(cfg, x, assignment="cic")
    lin = tr.linear_power(cfg.cosmo, cfg.a_i)
    sel = (ps.k > 3 * 2 * math.pi / cfg.box) & (ps.k < 0.8)
    ratio = ps.delta2[sel] / lin.delta2(ps.k[sel])
    assert abs(np.average(ratio, weights=ps.nmodes[sel]) - 1.0) < 0.2
    # velocity amplitude consistent with the device path's realization
    st_d = zl.zeldovich_ic(cfg, seed=5)
    vd = np.asarray(st_d.v)[: int(st_d.np_local[0])]
    rms_h = float(np.sqrt((v ** 2).mean()))
    rms_d = float(np.sqrt((vd ** 2).mean()))
    assert abs(rms_h - rms_d) / rms_d < 0.1
