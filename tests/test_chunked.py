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


def test_profiler_trace_capture(tmp_path):
    """Simulation.profile writes a jax.profiler trace (tracing aux role)."""
    cfg = small_config(shake=False)
    sim = Simulation(cfg, pp_band=16)
    st = state_mod.random_ic(cfg, seed=0)
    st = sim.profile(st, str(tmp_path / "trace"), steps=2)
    assert int(st.nts) == 2
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "no trace files written"
