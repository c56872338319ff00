"""Pallas segmented corner deposit (ops/deposit_pallas.py): equality with
the XLA corner-split CIC deposit, including runs crossing kernel blocks.
Runs in the Pallas interpreter on the CPU test platform.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu import kernels as kernels_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.ops import deposit as dep
from cubep3m_tpu.experiments import deposit_pallas as dpp
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def _sorted_case(n, ncp, ms, seed=0, dense_cell=None, n_dense=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, (ncp - 2) * ms, (n, 3)).astype(np.float32)
    if n_dense:
        x[:n_dense] = (np.asarray(dense_cell) * ms
                       + rng.uniform(0, ms, (n_dense, 3)))
    w = (rng.random(n) < 0.9).astype(np.float32) * 8.0
    key = np.asarray(dep.cic_base_key(
        jnp.asarray(x), (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
        valid=jnp.asarray(w > 0)))
    o = np.argsort(key, kind="stable")
    return jnp.asarray(x[o].T), jnp.asarray(w[o])


def _check(xt, w, ncp, ms):
    ref = dep.cic_deposit_corner_t(xt, w, (ncp,) * 3, scale=ms,
                                   offset=-0.5, pad=1)
    got = dpp.cic_deposit_corner_seg(xt, w, (ncp,) * 3, scale=ms,
                                     offset=-0.5, pad=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=1e-5)


def test_segment_deposit_random():
    xt, w = _sorted_case(9000, 10, 4)
    _check(xt, w, 10, 4)


def test_segment_deposit_run_spans_blocks():
    """One cell holding >2 kernel blocks of particles: the forced
    block-boundary ends must re-assemble the run exactly."""
    xt, w = _sorted_case(12000, 8, 4, dense_cell=(2, 3, 1),
                         n_dense=11000)
    _check(xt, w, 8, 4)


def test_segment_deposit_trailing_padding():
    """Valid count far below the padded capacity (sentinel tail)."""
    rng = np.random.default_rng(3)
    n, cap, ncp, ms = 700, 9000, 10, 4
    x = np.zeros((cap, 3), np.float32)
    x[:n] = rng.uniform(0, (ncp - 2) * ms, (n, 3))
    w = np.zeros(cap, np.float32)
    w[:n] = 8.0
    key = np.asarray(dep.cic_base_key(
        jnp.asarray(x), (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
        valid=jnp.asarray(w > 0)))
    o = np.argsort(key, kind="stable")
    _check(jnp.asarray(x[o].T), jnp.asarray(w[o]), ncp, ms)


def test_sweep_with_coarse_pallas_matches_xla():
    """Full fused sweep: coarse_sort + coarse_pallas == coarse_sort with
    the XLA sorted deposit (interpret mode on CPU)."""
    base = small_config(cosmo_expansion=False, shake=True, pid=True,
                       coarse_sort=True)
    mesh = make_sim_mesh(1)
    kern_f, kern_c = kernels_mod.build_kernels(base)
    kern_f = jnp.asarray(kern_f)
    kern_c = jnp.asarray(kern_c)
    rng = np.random.default_rng(11)
    nf = base.nf_physical_dim
    x = rng.uniform(0, nf, (base.np_total, 3)).astype(np.float32)
    v = (0.3 * rng.normal(size=x.shape)).astype(np.float32)

    def run(cfg):
        sweep = step_mod.make_sweep(cfg, mesh, pp_band=16)
        st = state_mod.particles_ic(cfg, x, v)
        one = jnp.float32(1.0)
        dt = jnp.float32(0.2)
        for _ in range(2):
            st = sweep(st, kern_f, kern_c, one, dt, one, st.tau + dt,
                       st.t + dt)
        n = int(st.np_local[0])
        pid = np.asarray(st.pid)[:n]
        o = np.argsort(pid)
        return np.asarray(st.x)[:n][o], np.asarray(st.v)[:n][o]

    xa, va = run(dataclasses.replace(base, coarse_pallas=True))
    xb, vb = run(dataclasses.replace(base, coarse_pallas=False))
    np.testing.assert_allclose(xa, xb, atol=2e-3)
    np.testing.assert_allclose(va, vb, atol=2e-3)
