"""Adaptive pp_dense_band sizing (cfg.pp_autosize).

The reference sizes its per-cell pair list statically and aborts on
overflow (particle_mesh_threaded.f90:280-284); our driver instead probes
the max same-fine-cell occupancy every few sweeps and preemptively
recompiles the sweep with a larger dense-tail window, so no step ever
drops pairs.
"""
import jax.numpy as jnp
import numpy as np

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def _state_with_dense_cell(cfg, n_dense, seed=0):
    """Random particles plus `n_dense` crammed into one fine cell."""
    rng = np.random.default_rng(seed)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    x[:n_dense] = (np.array([3.0, 4.0, 5.0])
                   + rng.uniform(0.05, 0.95, (n_dense, 3)))
    v = np.zeros_like(x)
    return state_mod.particles_ic(cfg, x, v)


def test_occupancy_probe_exact():
    cfg = small_config()
    mesh = make_sim_mesh(1)
    st = _state_with_dense_cell(cfg, n_dense=9)
    probe = step_mod.make_occupancy_probe(cfg, mesh, band=4)
    occ, n_dense = (int(v) for v in probe(st.x, st.np_local))
    # the dense cell holds exactly 9 (background can't exceed that at
    # 16^3 cells with 8^3 particles unless astronomically unlucky)
    assert occ == 9
    # with band=4 only the crammed cell (occ 9 > 5) is dense
    assert n_dense == 9


def test_occupancy_probe_multidevice():
    cfg = small_config(nodes_dim=2)
    mesh = make_sim_mesh(2)
    rng = np.random.default_rng(1)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    x[:7] = (np.array([3.0, 4.0, 5.0])
             + rng.uniform(0.05, 0.95, (7, 3)))  # 7 in one device-0 cell
    st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, mesh)
    probe = step_mod.make_occupancy_probe(cfg, mesh)
    occ, _ = probe(st.x, st.np_local)
    assert int(occ) == 7


def test_driver_grows_dense_band():
    """A run that starts with a too-small dense band must grow it before
    pairs are dropped."""
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                      pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=20)  # occ 20 > 0.7*(8+1)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band > 8, "autosize never grew the band"
    assert sim.cfg.pp_dense_band >= 20 / 0.7 - 1
    # the grown band covers the dense cell: the NEXT sweep reports no
    # genuinely dropped pairs
    st, _ = sim.step(st)
    assert int(st.pp_overflow) == 0


def test_driver_grows_dense_cap():
    """The dense-tail COMPACTION BUFFER must also grow: its capacity is
    per-device (max_np * pp_dense_cap_frac), and a device holding a big
    halo can exhaust it while occupancy still fits the band — exactly the
    failure seen on the 8-device 64^3 full-history run."""
    cfg = small_config(z_i=50.0, pp_dense_band=64, pp_autosize=True,
                      pp_autosize_every=1, pp_dense_cap_frac=0.01,
                      verbosity=0)
    # cap = int(8192*0.01) = 81; cram 60 particles into ONE cell so the
    # dense population (60) exceeds the 0.7*81 headroom line
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=60)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_cap_frac > 0.01, "autosize never grew the cap"
    st, _ = sim.step(st)
    assert int(st.pp_overflow) == 0


def test_autosize_noop_when_sparse():
    cfg = small_config(z_i=50.0, pp_dense_band=64, pp_autosize=True,
                      pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    st = state_mod.random_ic(cfg, seed=2)
    sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band == 64
