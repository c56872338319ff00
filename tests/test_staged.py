"""Staged (3-jit) sweep vs the fused sweep: identical trajectories.

The staged path exists because AOT/remote compilers OOM on the fused
512^3-mesh program (see step.make_staged_sweep); it must remain
numerically IDENTICAL to make_sweep for non-MHD configs.
"""
import jax
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu import kernels as km
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.parallel.mesh import make_sim_mesh

import jax.numpy as jnp


def _run(cfg, sweep_fn, steps=3):
    if cfg.nodes_dim == 1:
        st = state_mod.random_ic(cfg, seed=9)
    else:
        rng = np.random.default_rng(9)
        nfg = cfg.nf_physical_dim
        x = rng.uniform(0, nfg, (2000, 3)).astype(np.float32)
        v = (rng.normal(size=(2000, 3)) * 0.1).astype(np.float32)
        st = state_mod.distribute_global(cfg, x, v)
    mesh = make_sim_mesh(cfg.nodes_dim)
    st = step_mod.shard_state(st, mesh)
    kf, kc = km.build_kernels(cfg)
    kf, kc = jnp.asarray(kf), jnp.asarray(kc)
    t = 0.0
    for _ in range(steps):
        t += 0.1
        st = sweep_fn(st, kf, kc, jnp.float32(1.0), jnp.float32(0.1),
                      jnp.float32(1.0), jnp.float32(t), jnp.float32(t))
    return st


@pytest.mark.parametrize("nodes_dim", [1, 2])
def test_staged_matches_fused(nodes_dim):
    if nodes_dim ** 3 > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    cfg = small_config(nodes_dim=nodes_dim, shake=True,
                       cosmo_expansion=False)
    mesh = make_sim_mesh(cfg.nodes_dim)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused)
    st_s = _run(cfg, staged)
    assert int(st_f.np_local.sum()) == int(st_s.np_local.sum())
    for name in ("x", "v", "pid", "dt_f_acc", "dt_pp_acc", "dt_c_acc",
                 "shake_offset", "a", "nts"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_f, name)),
            np.asarray(getattr(st_s, name)), rtol=1e-4, atol=1e-4,
            err_msg=name)  # SoA stages reassociate fp32 arithmetic
            # (near-cancelling pp sums give ~5e-5 outliers)


def test_staged_pp_ext_matches_fused():
    """pp_ext in the staged path (SoA bucket build + neighborhood scan,
    stage B5) matches the fused sweep's extended-range forces."""
    cfg = small_config(shake=False, cosmo_expansion=False, pp_ext=True,
                       pp_range=4, pp_coarse_capacity=64)
    mesh = make_sim_mesh(1)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused, steps=2)
    st_s = _run(cfg, staged, steps=2)
    assert int(st_s.bucket_overflow) == 0
    for name in ("x", "v", "dt_pp_ext_acc"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_f, name)),
            np.asarray(getattr(st_s, name)), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_staged_mhd_matches_fused():
    """MHD in the staged path (G1-G3 gas stages at the fused sweep's
    three coupling points, cubepm.f90:113-165) matches the fused sweep:
    identical particle trajectories AND gas fields."""
    cfg = small_config(shake=False, cosmo_expansion=False, mhd=True,
                       gas_p_init=1e-6)
    mesh = make_sim_mesh(1)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused, steps=2)
    st_s = _run(cfg, staged, steps=2)
    for name in ("x", "v", "dt_f_acc", "dt_c_acc", "dt_gas_acc"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_f, name)),
            np.asarray(getattr(st_s, name)), rtol=1e-4, atol=1e-4,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(st_f.gas_u),
                               np.asarray(st_s.gas_u),
                               rtol=1e-5, atol=1e-6, err_msg="gas_u")
    np.testing.assert_allclose(np.asarray(st_f.gas_b),
                               np.asarray(st_s.gas_b),
                               rtol=1e-5, atol=1e-6, err_msg="gas_b")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_staged_mhd_multidevice_matches_fused():
    """Staged MHD on a 2^3 mesh: gas halo pads cross devices in the G
    stages exactly as in the fused sweep."""
    cfg = small_config(nodes_dim=2, tiles_node_dim=2, shake=False,
                       cosmo_expansion=False, mhd=True, gas_p_init=1e-6)
    mesh = make_sim_mesh(cfg.nodes_dim)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused, steps=2)
    st_s = _run(cfg, staged, steps=2)
    assert int(st_f.np_local.sum()) == int(st_s.np_local.sum())
    np.testing.assert_allclose(np.asarray(st_f.gas_u),
                               np.asarray(st_s.gas_u),
                               rtol=1e-5, atol=1e-6, err_msg="gas_u")
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_s.v),
                               rtol=1e-4, atol=1e-4)


def test_staged_tiled_fine_solve_matches_fused():
    """fine_fft_tiles > 1 in the staged path runs ONE compiled tile
    program at tiles^3 dynamic offsets (stage B2); must equal the fused
    sweep's unrolled tile solve."""
    cfg = small_config(shake=True, cosmo_expansion=False,
                       fine_fft_tiles=2)
    mesh = make_sim_mesh(1)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused, steps=2)
    st_s = _run(cfg, staged, steps=2)
    for name in ("x", "v", "dt_f_acc"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_f, name)),
            np.asarray(getattr(st_s, name)), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_staged_cic_fine_build():
    cfg = small_config(shake=False, cosmo_expansion=False, ngp=False)
    mesh = make_sim_mesh(1)
    fused = step_mod.make_sweep(cfg, mesh)
    staged = step_mod.make_staged_sweep(cfg, mesh)
    st_f = _run(cfg, fused, steps=2)
    st_s = _run(cfg, staged, steps=2)
    np.testing.assert_allclose(np.asarray(st_f.x), np.asarray(st_s.x),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_s.v),
                               rtol=1e-5, atol=2e-5)


def test_driver_staged_sweep_runs():
    """cfg.staged_sweep drives Simulation through the 3-jit path."""
    from cubep3m_tpu.core.driver import Simulation
    cfg = small_config(z_i=100.0, shake=False, staged_sweep=True)
    sim = Simulation(cfg, pp_band=16)
    st = state_mod.random_ic(cfg, seed=4)
    st = sim.run(st, max_steps=5)
    assert int(st.nts) == 5
    assert np.isfinite(float(st.a)) and float(st.a) > 1.0 / 101.0


def test_staged_chunked_matches_host_stepping():
    """Staged chunking (on-device dt dispatch loop) == host stepping."""
    from cubep3m_tpu.core.driver import Simulation

    def run(use_chunks):
        cfg = small_config(z_i=100.0, shake=False, staged_sweep=True)
        sim = Simulation(cfg, pp_band=16)
        st = state_mod.random_ic(cfg, seed=6)
        return sim.run(st, max_steps=20, use_chunks=use_chunks)

    st_h = run(False)
    st_c = run(True)
    assert abs(int(st_h.nts) - int(st_c.nts)) <= 1
    np.testing.assert_allclose(float(st_c.a), float(st_h.a), rtol=5e-4)


def test_exchange_heavy_exodus_stay_block_integrity():
    """Regression: when more particles leave than the face-buffer size,
    the stay-segment dynamic_slice must not clamp (a clamped start
    silently reads leaver rows as residents).  700 of 1024 particles
    leave through -x with a face buffer of only 64."""
    from cubep3m_tpu.parallel import exchange as ex_mod
    n, nf = 1024, 16
    x = np.zeros((n, 3), np.float32)
    x[:700, 0] = -1.0            # leave through -x
    x[700:] = 5.25               # residents, all at one spot
    v = np.zeros((n, 3), np.float32)
    pid = np.arange(n, dtype=np.int32)
    valid = np.ones(n, bool)
    ex = step_mod.exchange_mod.exchange_particles(
        jnp.asarray(x), jnp.asarray(v), jnp.asarray(pid),
        jnp.asarray(valid), nf, max_buf=64, compact=False)
    xs = np.asarray(ex.x)
    ok = np.asarray(ex.valid)
    # the first 1024 rows are the stay block: 324 residents at 5.25
    stay_x = xs[:n][ok[:n]]
    assert stay_x.shape[0] == 324
    np.testing.assert_allclose(stay_x, 5.25)
    # leavers wrap back to this device (1^3 mesh), shifted +nf, capped by
    # the face buffer; the excess is counted
    recv_x = xs[n:][ok[n:]]
    assert recv_x.shape[0] == 64
    np.testing.assert_allclose(recv_x[:, 0], 15.0)
    assert int(ex.overflow) == 700 - 64
