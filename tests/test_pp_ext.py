"""PP_EXT extended pair force tests (particle_mesh_threaded.f90:488-615)."""
import jax
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation


def _pp_ext_cfg(**kw):
    kw.setdefault("pp_coarse_capacity", 64)
    return small_config(pp=True, pp_ext=True, pp_range=2,
                        cosmo_expansion=False, **kw)


@pytest.fixture(scope="module")
def sim_ext():
    return Simulation(_pp_ext_cfg(), pp_band=16)


def test_pp_ext_near_pair_force(sim_ext):
    """Neighboring-cell pair (r ~ 2 cells): the mesh kernel is zeroed
    inside the pp_range cube, so PP_EXT supplies the (tapered) force."""
    cfg = sim_ext.cfg
    nf = cfg.nf_physical_node_dim
    x1 = np.array([nf / 2 + 0.3] * 3)
    x2 = x1 + np.array([1.3, 0.9, 0.7])   # distinct cells within pp_range
    st = state_mod.pair_ic(cfg, x1, x2)
    f = np.asarray(step_mod.compute_forces(cfg, st, sim_ext.kern_f,
                                           sim_ext.kern_c))
    sep = x1 - x2
    r = np.linalg.norm(sep)
    s = r * cfg.pp_bias / cfg.nf_cutoff
    taper = 1 - 1.75 * s ** 3 + 0.75 * s ** 5
    f_exact = -cfg.mass_p * sep / r ** 3 * taper
    # coarse mesh adds a small smooth component; PP_EXT dominates
    np.testing.assert_allclose(f[0], f_exact, rtol=0.12)
    np.testing.assert_allclose(f[1], -f_exact, rtol=0.12)


def test_pp_ext_same_cell_untapered(sim_ext):
    """Same-cell pairs stay with plain PPINT (untapered), reference's
    half-open neighbor loop (ip starts at i+1)."""
    cfg = sim_ext.cfg
    nf = cfg.nf_physical_node_dim
    x1 = np.array([nf / 2 + 0.2] * 3)
    x2 = np.array([nf / 2 + 0.75] * 3)
    st = state_mod.pair_ic(cfg, x1, x2)
    f = np.asarray(step_mod.compute_forces(cfg, st, sim_ext.kern_f,
                                           sim_ext.kern_c))
    sep = x1 - x2
    r = np.linalg.norm(sep)
    f_exact = -cfg.mass_p * sep / r ** 3
    np.testing.assert_allclose(f[0], f_exact, rtol=0.05)


def test_pp_ext_sweep_runs(sim_ext):
    cfg = sim_ext.cfg
    st = state_mod.random_ic(cfg, seed=4, fraction=0.5)
    st2 = sim_ext.sweep(st, sim_ext.kern_f, sim_ext.kern_c,
                        1.0, 0.2, 1.0, 0.2, 0.2)
    assert int(st2.bucket_overflow) == 0
    v = np.asarray(st2.v)
    assert np.all(np.isfinite(v))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pp_ext_multidevice_matches_single():
    """Cross-boundary PP_EXT pairs via the bucket ghost layer: 8-device
    run must match single-device on the same global ICs."""
    cfg1 = _pp_ext_cfg(nodes_dim=1, tiles_node_dim=4, shake=False,
                       pp_coarse_capacity=128)
    cfg8 = _pp_ext_cfg(nodes_dim=2, tiles_node_dim=2, shake=False,
                       pp_coarse_capacity=128)
    rng = np.random.default_rng(5)
    nf = cfg1.nf_physical_dim
    # cluster particles near a device corner to exercise ghost exchange
    x = np.vstack([
        rng.uniform(0, nf, (1200, 3)),
        np.array([31.8, 31.8, 31.8]) + rng.uniform(-4.0, 4.0, (400, 3)),
    ]).astype(np.float32)
    v = np.zeros_like(x)

    def run(cfg):
        sim = Simulation(cfg, pp_band=32)
        st = state_mod.distribute_global(cfg, x, v)
        st = step_mod.shard_state(st, sim.mesh)
        for i in range(3):
            st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.3, 1.0,
                           0.3 * i, 0.3 * i)
        assert int(st.bucket_overflow) == 0
        assert int(st.pp_overflow) == 0
        return state_mod.gather_global(cfg, st)

    x1, v1, p1 = run(cfg1)
    x8, v8, p8 = run(cfg8)
    o1, o8 = np.argsort(p1), np.argsort(p8)
    np.testing.assert_allclose(x1[o1], x8[o8], atol=6e-3)
    np.testing.assert_allclose(v1[o1], v8[o8], atol=6e-3)
