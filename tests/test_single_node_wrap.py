"""Single-node wrap fast path (cfg.single_node_wrap): on a 1-device mesh
the ownership exchange degenerates to the periodic wrap `x mod nf`.  The
fast path must produce the same physics as the full 26-class machinery.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu import kernels as kernels_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def _run_steps(cfg, staged, n_steps=3, seed=5):
    mesh = make_sim_mesh(1)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    kern_f = jnp.asarray(kern_f)
    kern_c = jnp.asarray(kern_c)
    make = (step_mod.make_staged_sweep if staged else step_mod.make_sweep)
    sweep = make(cfg, mesh, pp_band=16)
    rng = np.random.default_rng(seed)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    # park some particles ON the boundary to exercise the wrap
    x[:32, 0] = rng.uniform(nf - 0.3, nf - 1e-4, 32)
    v = (0.3 * rng.normal(size=x.shape)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, v)
    one = jnp.float32(1.0)
    dt = jnp.float32(0.2)
    for _ in range(n_steps):
        st = sweep(st, kern_f, kern_c, one, dt, one, st.tau + dt,
                   st.t + dt)
    return st


def _sorted_by_pid(st):
    n = int(st.np_local[0])
    pid = np.asarray(st.pid)[:n]
    o = np.argsort(pid)
    return (np.asarray(st.x)[:n][o], np.asarray(st.v)[:n][o])


def test_wrap_matches_full_exchange_fused():
    base = small_config(cosmo_expansion=False, shake=True, pid=True)
    st_a = _run_steps(dataclasses.replace(base, single_node_wrap=True),
                      staged=False)
    st_b = _run_steps(dataclasses.replace(base, single_node_wrap=False),
                      staged=False)
    assert int(st_a.np_local[0]) == int(st_b.np_local[0]) == base.np_total
    assert int(st_a.clamp_count) == 0
    xa, va = _sorted_by_pid(st_a)
    xb, vb = _sorted_by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=2e-3)
    np.testing.assert_allclose(va, vb, atol=2e-3)
    assert np.all(xa >= 0.0) and np.all(xa < base.nf_physical_dim)


def test_wrap_matches_full_exchange_staged():
    base = small_config(cosmo_expansion=False, shake=True, pid=True)
    st_a = _run_steps(dataclasses.replace(base, single_node_wrap=True),
                      staged=True)
    st_b = _run_steps(dataclasses.replace(base, single_node_wrap=False),
                      staged=True)
    assert int(st_a.np_local[0]) == int(st_b.np_local[0]) == base.np_total
    xa, va = _sorted_by_pid(st_a)
    xb, vb = _sorted_by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=2e-3)
    np.testing.assert_allclose(va, vb, atol=2e-3)


def test_wrap_handles_multiwidth_displacement():
    """mod wraps ANY distance (the exchange path would clamp+count a
    multi-node-width hop; on one node there is no such thing)."""
    cfg = small_config(cosmo_expansion=False, shake=False, pid=True,
                      single_node_wrap=True)
    mesh = make_sim_mesh(1)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    sweep = step_mod.make_sweep(cfg, mesh, pp_band=16)
    nf = cfg.nf_physical_dim
    rng = np.random.default_rng(0)
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    v = np.zeros_like(x)
    v[0] = (2.5 * nf, -1.5 * nf, 0.25 * nf)   # several box widths per step
    st = state_mod.particles_ic(cfg, x, v)
    one = jnp.float32(1.0)
    dt = jnp.float32(1.0)
    st = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c), one, dt, one,
               st.tau + dt, st.t + dt)
    assert int(st.np_local[0]) == cfg.np_total
    assert int(st.clamp_count) == 0
    xs = np.asarray(st.x)[: cfg.np_total]
    assert np.all(xs >= 0.0) and np.all(xs < nf)
