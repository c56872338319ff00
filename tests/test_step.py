"""End-to-end sweep tests: the built-in physics harnesses of the reference
re-expressed as unit tests (SURVEY.md §4.2: grid_ic zero-force, pairwise
force accuracy, pair infall symmetry; plus conservation diagnostics §4.3).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu.config import G
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.core.timestep import OutputSchedule
from cubep3m_tpu import kernels as kernels_mod
from cubep3m_tpu.parallel.mesh import make_sim_mesh


@pytest.fixture(scope="module")
def sim():
    cfg = small_config(cosmo_expansion=False, pp=True)
    return Simulation(cfg, pp_band=16)


def test_grid_ic_zero_force(sim):
    """Uniform lattice: total force on every particle must vanish
    (reference grid_ic test mode, cubepm.par:62)."""
    cfg = sim.cfg
    st = state_mod.grid_ic(cfg)
    f = step_mod.compute_forces(cfg, st, sim.kern_f, sim.kern_c)
    f = np.asarray(f)[: int(st.np_local[0])]
    # force scale for one particle pair at r=2 is mass_p/4 = 2; lattice
    # cancellation should leave tiny residuals
    assert np.max(np.abs(f)) < 1e-3 * cfg.mass_p


def test_pairwise_force_accuracy(sim):
    """Two particles: simulated force vs exact -mass_p/r^2
    (report_pair.f90:38-73 harness)."""
    cfg = sim.cfg
    nf = cfg.nf_physical_node_dim
    rng = np.random.default_rng(3)
    errs = []
    for _ in range(40):
        r = rng.uniform(3.0, 10.0)
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        center = np.array([nf / 2.0] * 3) + rng.uniform(-1, 1, 3)
        x1 = center + u * r / 2
        x2 = center - u * r / 2
        st = state_mod.pair_ic(cfg, x1, x2)
        f = np.asarray(step_mod.compute_forces(cfg, st, sim.kern_f,
                                               sim.kern_c))
        sep = x1 - x2
        rr = np.linalg.norm(sep)
        f_exact = -cfg.mass_p * sep / rr ** 3
        errs.append(np.linalg.norm(f[0] - f_exact)
                    / np.linalg.norm(f_exact))
        # Newton's 3rd law: forces must be antisymmetric
        np.testing.assert_allclose(f[0], -f[1], atol=2e-4 * cfg.mass_p)
    errs = np.array(errs)
    # measured envelope (scripts/force_accuracy.py, VALIDATION.md): this
    # config/separation range sits at median ~0.17, mean ~0.20; regression
    # margin ~25%
    assert np.median(errs) < 0.21
    assert np.mean(errs) < 0.26


def test_pp_same_cell_exact(sim):
    """Particles in the same fine cell interact by exact softened 1/r^2
    through the PP level (particle_mesh_threaded.f90:322-362)."""
    cfg = sim.cfg
    nf = cfg.nf_physical_node_dim
    x1 = np.array([nf / 2 + 0.2] * 3)
    x2 = np.array([nf / 2 + 0.7] * 3)  # same fine cell, r ~ 0.87
    st = state_mod.pair_ic(cfg, x1, x2)
    f = np.asarray(step_mod.compute_forces(cfg, st, sim.kern_f, sim.kern_c))
    sep = x1 - x2
    r = np.linalg.norm(sep)
    f_exact = -cfg.mass_p * sep / r ** 3
    # mesh contributes ~nothing at zero cell offset; PP supplies the force
    np.testing.assert_allclose(f[0], f_exact, rtol=0.05)
    np.testing.assert_allclose(f[1], -f_exact, rtol=0.05)


def test_pp_softening(sim):
    """No pp force below rsoft (cubepm.par:75-76)."""
    cfg = sim.cfg
    nf = cfg.nf_physical_node_dim
    x1 = np.array([nf / 2 + 0.50] * 3)
    x2 = np.array([nf / 2 + 0.55] * 3)  # r ~ 0.087 < rsoft=0.1
    st = state_mod.pair_ic(cfg, x1, x2)
    f = np.asarray(step_mod.compute_forces(cfg, st, sim.kern_f, sim.kern_c))
    # the only force left is the (tiny) mesh self-cell contribution
    assert np.max(np.abs(f)) < 1e-2


def test_momentum_conservation_one_sweep(sim):
    """Total momentum change over a sweep vanishes (Newton's 3rd law holds
    exactly for the antisymmetric mesh kernels and the pp accumulation)."""
    cfg = sim.cfg
    st = state_mod.random_ic(cfg, seed=5, fraction=0.5)
    n = int(st.np_local[0])
    st2 = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.1, 1.0, 0.1, 0.1)
    dv = np.asarray(st2.v).sum(axis=0) - np.asarray(st.v).sum(axis=0)
    # compare to the typical per-particle kick magnitude
    kick_scale = np.abs(np.asarray(st2.v)).mean() + 1e-12
    assert np.all(np.abs(dv) < 1e-2 * kick_scale * n ** 0.5 + 1e-4)


def test_mass_conservation_deposit(sim):
    """Fine-mesh deposit conserves total mass (DIAG sum, §4.3)."""
    from cubep3m_tpu.ops import deposit
    cfg = sim.cfg
    st = state_mod.random_ic(cfg, seed=6)
    nf = cfg.nf_physical_node_dim
    w = np.where(np.asarray(st.valid), cfg.mass_p, 0.0).astype(np.float32)
    rho = deposit.ngp_deposit(st.x, jnp.asarray(w), (nf, nf, nf))
    total = float(jnp.sum(rho))
    expect = float(st.np_local[0]) * cfg.mass_p
    assert abs(total - expect) / expect < 1e-5


def test_pair_infall_symmetric(sim):
    """Two particles at rest fall toward each other symmetrically
    (pair_infall mode, set_pair.f90:39-42)."""
    cfg = sim.cfg
    nf = cfg.nf_physical_node_dim
    x1 = np.array([nf / 2 + 3.0, nf / 2, nf / 2])
    x2 = np.array([nf / 2 - 3.0, nf / 2, nf / 2])
    st = state_mod.pair_ic(cfg, x1, x2)
    sep0 = 6.0
    for _ in range(5):
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 1.0, 1.0, 0.0, 0.0)
    x = np.asarray(st.x)[:2]
    # sort by x-coordinate to identify the two particles
    x = x[np.argsort(x[:, 0])]
    sep = x[1, 0] - x[0, 0]
    assert sep < sep0  # they approached
    # symmetric approach about the center
    center = nf / 2
    assert abs((x[1, 0] - center) + (x[0, 0] - center)) < 0.05
    # y/z unchanged
    np.testing.assert_allclose(x[:, 1:], nf / 2, atol=1e-3)


def test_cosmo_sweep_advances(sim):
    """Full cosmological stepping through the driver advances a and lands
    exactly on scheduled outputs."""
    cfg = small_config(cosmo_expansion=True, pp=True, z_i=50.0)
    schedule = OutputSchedule.from_redshifts(checkpoints=[45.0, 40.0])
    s = Simulation(cfg, schedule=schedule, pp_band=16)
    hits = []
    s.on_checkpoint.append(lambda sim_, st, dec: hits.append(float(st.a)))
    st = state_mod.random_ic(cfg, seed=1, fraction=0.25)
    st = s.run(st, max_steps=50)
    assert len(hits) == 2
    np.testing.assert_allclose(hits[0], 1.0 / 46.0, rtol=1e-4)
    np.testing.assert_allclose(hits[1], 1.0 / 41.0, rtol=1e-4)
    assert int(st.nts) <= 50


def test_shake_single_particle_tracking():
    """shake_test_ic mode: a single particle under DISP_MESH shake must
    stay put in unshaken coordinates (zero self-force; the accumulated
    offset is exactly removable, update_position.f90/move_grid_back)."""
    cfg = small_config(cosmo_expansion=False, shake=True)
    nf = cfg.nf_physical_node_dim
    x0 = np.array([nf / 2 + 0.37, nf / 2 + 0.21, nf / 2 + 0.83])
    st = state_mod.particles_ic(cfg, x0[None, :].astype(np.float32),
                                np.zeros((1, 3), np.float32))
    sim = Simulation(cfg, pp_band=16)
    for i in range(6):
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.5, 1.0, 0.0, 0.0)
    x = np.asarray(st.x)[0]
    shake = np.asarray(st.shake_offset)
    unshaken = np.mod(x - shake, nf)
    np.testing.assert_allclose(unshaken, x0, atol=5e-3)
    v = np.asarray(st.v)[0]
    assert np.all(np.abs(v) < 1e-4)  # no self-force kicks


def test_two_body_circular_orbit():
    """Leapfrog + P3M force holds a two-body circular orbit: the separation
    stays bounded over many dynamical times (symplectic integrator check;
    pair_infall harness generalization)."""
    cfg = small_config(cosmo_expansion=False, shake=False)
    sim = Simulation(cfg, pp_band=16)
    nf = cfg.nf_physical_node_dim
    r = 3.0
    center = np.array([nf / 2.0] * 3)
    x1 = center + np.array([r / 2, 0, 0])
    x2 = center - np.array([r / 2, 0, 0])
    # circular orbit about the CM: v = sqrt(G m / (2 r)) each, opposite
    vmag = np.sqrt(G * cfg.mass_p / (2 * r))
    v1 = np.array([0.0, vmag, 0.0])
    st = state_mod.pair_ic(cfg, x1, x2, v1=v1, v2=-v1)
    dt = 0.2 * 2 * np.pi * (r / 2) / vmag / 20  # ~1/100 orbit per step
    seps = []
    for i in range(120):
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, dt, 1.0, 0.0, 0.0)
        x = np.asarray(st.x)[:2]
        d = x[0] - x[1]
        d -= nf * np.round(d / nf)
        seps.append(np.linalg.norm(d))
    seps = np.array(seps)
    # bounded orbit: separation stays within a factor ~2 of the initial
    # (NGP force quantization perturbs it, but no secular blowup/collapse)
    assert seps.min() > 0.3 * r and seps.max() < 2.5 * r, \
        f"orbit unstable: sep range [{seps.min():.2f}, {seps.max():.2f}]"


def test_cic_fine_build():
    """The CIC fine-mesh build (the reference's non-NGP makefile variant)
    produces pair forces at least as accurate as NGP."""
    cfg = small_config(cosmo_expansion=False, ngp=False)
    sim = Simulation(cfg, pp_band=16)
    rng = np.random.default_rng(4)
    nf = cfg.nf_physical_node_dim
    errs = []
    for _ in range(20):
        r = rng.uniform(3.0, 10.0)
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        c = np.array([nf / 2.0] * 3) + rng.uniform(-1, 1, 3)
        st = state_mod.pair_ic(cfg, c + u * r / 2, c - u * r / 2)
        f = np.asarray(step_mod.compute_forces(cfg, st, sim.kern_f,
                                               sim.kern_c))
        fe = -cfg.mass_p * (u * r) / r ** 3
        errs.append(np.linalg.norm(f[0] - fe) / np.linalg.norm(fe))
        np.testing.assert_allclose(f[0], -f[1], atol=2e-4 * cfg.mass_p)
    assert np.median(errs) < 0.2
    # sweep runs end-to-end in CIC mode
    st = state_mod.random_ic(cfg, seed=5, fraction=0.3)
    st2 = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.2, 1.0, 0.2, 0.2)
    assert np.all(np.isfinite(np.asarray(st2.v)))


def test_merged_exchange_sort_matches_classic():
    """cfg.merged_exchange_sort (one combined-key argsort + counting
    merge) reproduces the classic exchange+sort trajectories exactly, on
    1^3 and 2^3 meshes."""
    import dataclasses
    import jax

    for nd in (1, 2):
        if nd ** 3 > len(jax.devices()):
            continue
        cfg_a = small_config(nodes_dim=nd, shake=True,
                             cosmo_expansion=False)
        cfg_b = dataclasses.replace(cfg_a, merged_exchange_sort=True)

        def run(cfg):
            mesh = make_sim_mesh(cfg.nodes_dim)
            if cfg.nodes_dim == 1:
                st = state_mod.random_ic(cfg, seed=12)
            else:
                rng = np.random.default_rng(12)
                nfg = cfg.nf_physical_dim
                x = rng.uniform(0, nfg, (3000, 3)).astype(np.float32)
                v = (rng.normal(size=(3000, 3)) * 0.3).astype(np.float32)
                st = state_mod.distribute_global(cfg, x, v)
            st = step_mod.shard_state(st, mesh)
            sweep = step_mod.make_sweep(cfg, mesh)
            kf, kc = kernels_mod.build_kernels(cfg)
            kf, kc = jnp.asarray(kf), jnp.asarray(kc)
            for i in range(3):
                st = sweep(st, kf, kc, jnp.float32(1.0), jnp.float32(0.2),
                           jnp.float32(1.0), jnp.float32(0.2 * (i + 1)),
                           jnp.float32(0.2 * (i + 1)))
            return st

        st_a = run(cfg_a)
        st_b = run(cfg_b)
        assert int(st_a.np_local.sum()) == int(st_b.np_local.sum())
        assert int(st_b.pp_overflow) == int(st_a.pp_overflow)
        for name in ("dt_f_acc", "dt_pp_acc", "dt_c_acc"):
            np.testing.assert_allclose(
                np.asarray(getattr(st_a, name)),
                np.asarray(getattr(st_b, name)), rtol=1e-5,
                err_msg=f"{name} nd={nd}")
        # compare VALID rows only, matched by pid (padding rows differ by
        # construction: classic leaves garbage copies there, merged zeros)
        cap = cfg_a.max_np
        counts = np.asarray(st_a.np_local)
        for d in range(counts.size):
            n = int(counts[d])
            sl = slice(d * cap, d * cap + n)
            pa = np.asarray(st_a.pid)[sl]
            pb = np.asarray(st_b.pid)[sl]
            oa, ob = np.argsort(pa), np.argsort(pb)
            np.testing.assert_array_equal(pa[oa], pb[ob])
            for name in ("x", "v"):
                np.testing.assert_allclose(
                    np.asarray(getattr(st_a, name))[sl][oa],
                    np.asarray(getattr(st_b, name))[sl][ob],
                    rtol=1e-5, atol=1e-5, err_msg=f"{name} nd={nd}")
