"""Chunked (on-device dt control) vs host-stepped trajectories."""
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.core.timestep import OutputSchedule


def test_chunked_matches_host_stepping():
    cfg = small_config(z_i=100.0, shake=False)
    sched = OutputSchedule.from_redshifts(checkpoints=[60.0])
    hits = {}

    def run(use_chunks):
        sim = Simulation(cfg, schedule=sched, pp_band=16)
        sim.on_checkpoint.append(
            lambda s, st, dec: hits.setdefault(use_chunks, float(st.a)))
        st = state_mod.random_ic(cfg, seed=3)
        st = sim.run(st, max_steps=200, use_chunks=use_chunks)
        return st

    st_host = run(False)
    st_chunk = run(True)
    # both landed exactly on the checkpoint
    np.testing.assert_allclose(hits[False], 1 / 61.0, rtol=1e-4)
    np.testing.assert_allclose(hits[True], 1 / 61.0, rtol=1e-4)
    # same number of sweeps and the same final state (device dt decisions
    # agree with host decisions to f32 rounding)
    assert abs(int(st_host.nts) - int(st_chunk.nts)) <= 1
    n = int(st_host.np_local[0])
    xh = np.asarray(st_host.x)[:n]
    xc = np.asarray(st_chunk.x)[:n]
    ph = np.asarray(st_host.pid)[:n]
    pc = np.asarray(st_chunk.pid)[:n]
    oh, oc = np.argsort(ph), np.argsort(pc)
    np.testing.assert_allclose(xh[oh], xc[oc], atol=2e-2)


def test_chunked_chaplygin_matches_host_stepping():
    """Chaplygin backgrounds now chunk too (device RK4 background)."""
    from cubep3m_tpu.config import Cosmology
    cosmo_ch = Cosmology(omega_m=0.3, chaplygin=True, omega_ch=0.7,
                         A_ch=0.9, alpha_ch=0.3)
    cfg = small_config(z_i=100.0, shake=False, cosmo=cosmo_ch)

    def run(use_chunks):
        sim = Simulation(cfg, pp_band=16)
        st = state_mod.random_ic(cfg, seed=5)
        return sim.run(st, max_steps=24, use_chunks=use_chunks)

    st_host = run(False)
    st_chunk = run(True)
    assert abs(int(st_host.nts) - int(st_chunk.nts)) <= 1
    np.testing.assert_allclose(float(st_chunk.a), float(st_host.a),
                               rtol=5e-4)


def test_fixed_chunk_matches_sequential_sweeps():
    """bench's make_fixed_chunk (lax.scan over fixed-dt sweeps) is
    step-for-step identical to dispatching the fused sweep."""
    import jax.numpy as jnp
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh
    from cubep3m_tpu import kernels as kernels_mod

    cfg = small_config(z_i=100.0, shake=True)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    kern_f, kern_c = jnp.asarray(kern_f), jnp.asarray(kern_c)
    mesh = make_sim_mesh(1)
    sweep = step_mod.make_sweep(cfg, mesh)
    chunked = step_mod.make_fixed_chunk(cfg, mesh, sweep, 3)
    st0 = step_mod.shard_state(state_mod.random_ic(cfg, seed=7), mesh)

    dt = jnp.float32(0.04)
    one = jnp.float32(1.0)
    st_seq = st0
    for _ in range(3):
        st_seq = sweep(st_seq, kern_f, kern_c, one, dt, one,
                       st_seq.tau + dt, st_seq.t + dt)
    st_chunk = chunked(st0, kern_f, kern_c, dt)

    n = int(st_seq.np_local[0])
    assert int(st_chunk.np_local[0]) == n
    ph = np.argsort(np.asarray(st_seq.pid)[:n])
    pc = np.argsort(np.asarray(st_chunk.pid)[:n])
    np.testing.assert_array_equal(np.asarray(st_seq.x)[:n][ph],
                                  np.asarray(st_chunk.x)[:n][pc])
    np.testing.assert_array_equal(np.asarray(st_seq.v)[:n][ph],
                                  np.asarray(st_chunk.v)[:n][pc])


def test_profiler_trace_capture(tmp_path):
    """Simulation.profile writes a jax.profiler trace (tracing aux role)."""
    cfg = small_config(shake=False)
    sim = Simulation(cfg, pp_band=16)
    st = state_mod.random_ic(cfg, seed=0)
    st = sim.profile(st, str(tmp_path / "trace"), steps=2)
    assert int(st.nts) == 2
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "no trace files written"
