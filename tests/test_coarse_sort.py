"""Coarse-key re-sort path (cfg.coarse_sort): identical physics to the
unsorted coarse CIC, with the scatter/gather indices genuinely monotone.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu import kernels as kernels_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.ops import binning, deposit
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def test_base_key_matches_op_indices():
    """cic_base_key must reproduce the ops' clipped base index exactly,
    and sorting by it must make them monotone."""
    rng = np.random.default_rng(0)
    n, ncp, ms = 5000, 6, 4
    x = rng.uniform(0, (ncp - 2) * ms, (n, 3)).astype(np.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    key = deposit.cic_base_key(jnp.asarray(x), (ncp,) * 3, scale=ms,
                               offset=-0.5, pad=1, valid=valid)
    order = jnp.argsort(key)
    skey = np.asarray(key[order])
    assert np.all(np.diff(skey) >= 0)
    # invalid slots land at the tail with the sentinel
    nv = int(np.asarray(valid).sum())
    assert np.all(skey[nv:] == ncp ** 3)


def test_csum_deposit_matches_scatter():
    """Segmented-sum corner deposit (compensated cumsum + boundary
    gathers) == scatter corner deposit, with counts from BOTH sources:
    the in-op sorted histogram and the pooled fine NGP histogram."""
    rng = np.random.default_rng(1)
    n, nc, ms = 20000, 4, 4
    ncp, nf = nc + 2, nc * ms
    # clustered + uniform positions, ~10% invalid slots
    x = np.concatenate([
        rng.uniform(0, nf, (n // 2, 3)),
        (rng.normal(0.6 * nf, 0.05 * nf, (n // 2, 3)) % nf)]).astype(
            np.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    xj = jnp.asarray(x)
    key = deposit.cic_base_key(xj, (ncp,) * 3, scale=ms, offset=-0.5,
                               pad=1, valid=valid)
    order = jnp.argsort(key)
    xs = xj[order]
    w = jnp.where(valid[order], jnp.float32(0.37), 0.0)
    want = deposit.cic_deposit_corner(xs, w, (ncp,) * 3, scale=ms,
                                      offset=-0.5, pad=1,
                                      valid=valid[order])
    # (a) in-op histogram
    got_a = deposit.cic_deposit_corner_csum_t(
        xs.T, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    # (b) counts pooled from the fine NGP histogram
    hist = deposit.ngp_deposit(xj, jnp.where(valid, 1.0, 0.0),
                               (nf,) * 3)
    counts = deposit.coarse_counts_from_fine_hist(hist, ms, 1)
    assert int(counts.sum()) == int(np.asarray(valid).sum())
    got_b = deposit.cic_deposit_corner_csum_t(
        xs.T, w, (ncp,) * 3, scale=ms, offset=-0.5, pad=1,
        counts=counts.reshape(-1))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    # pooled counts agree with a direct key histogram
    np.testing.assert_array_equal(
        np.asarray(counts).reshape(-1),
        np.bincount(np.asarray(key)[np.asarray(valid)],
                    minlength=ncp ** 3)[:ncp ** 3])


def _run(cfg, staged, n_steps=3, seed=7):
    mesh = make_sim_mesh(1)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    kern_f = jnp.asarray(kern_f)
    kern_c = jnp.asarray(kern_c)
    make = (step_mod.make_staged_sweep if staged else step_mod.make_sweep)
    sweep = make(cfg, mesh, pp_band=16)
    rng = np.random.default_rng(seed)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    v = (0.3 * rng.normal(size=x.shape)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, v)
    one = jnp.float32(1.0)
    dt = jnp.float32(0.2)
    for _ in range(n_steps):
        st = sweep(st, kern_f, kern_c, one, dt, one, st.tau + dt,
                   st.t + dt)
    return st


def _by_pid(st):
    n = int(st.np_local[0])
    pid = np.asarray(st.pid)[:n]
    o = np.argsort(pid)
    return np.asarray(st.x)[:n][o], np.asarray(st.v)[:n][o]


def test_fused_coarse_sort_equals_unsorted():
    base = small_config(cosmo_expansion=False, shake=True, pid=True)
    st_a = _run(dataclasses.replace(base, coarse_sort=True), staged=False)
    st_b = _run(dataclasses.replace(base, coarse_sort=False), staged=False)
    assert int(st_a.np_local[0]) == int(st_b.np_local[0]) == base.np_total
    xa, va = _by_pid(st_a)
    xb, vb = _by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=2e-3)
    np.testing.assert_allclose(va, vb, atol=2e-3)


def test_staged_coarse_sort_equals_fused():
    cfg = small_config(cosmo_expansion=False, shake=True, pid=True,
                      coarse_sort=True)
    st_a = _run(cfg, staged=True)
    st_b = _run(cfg, staged=False)
    xa, va = _by_pid(st_a)
    xb, vb = _by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=2e-3)
    np.testing.assert_allclose(va, vb, atol=2e-3)


def test_fused_gather_pallas_equals_xla():
    """cfg.coarse_gather_pallas (ranked-window kernel, interpret mode on
    CPU) == the XLA corner gather inside the fused sweep."""
    base = small_config(cosmo_expansion=False, shake=True, pid=True,
                        coarse_sort=True)
    st_a = _run(dataclasses.replace(base, coarse_gather_pallas=True),
                staged=False)
    st_b = _run(dataclasses.replace(base, coarse_gather_pallas=False),
                staged=False)
    xa, va = _by_pid(st_a)
    xb, vb = _by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=1e-5)
    np.testing.assert_allclose(va, vb, atol=1e-5)


def test_staged_gather_pallas_equals_xla():
    base = small_config(cosmo_expansion=False, shake=True, pid=True,
                        coarse_sort=True)
    st_a = _run(dataclasses.replace(base, coarse_gather_pallas=True),
                staged=True)
    st_b = _run(dataclasses.replace(base, coarse_gather_pallas=False),
                staged=True)
    xa, va = _by_pid(st_a)
    xb, vb = _by_pid(st_b)
    np.testing.assert_allclose(xa, xb, atol=1e-5)
    np.testing.assert_allclose(va, vb, atol=1e-5)


def test_gather_pallas_multidevice():
    """Ranked-window gather under a real 8-device mesh (interpret mode):
    pallas_call must compose with shard_map — per-device local tables,
    keys, and counts."""
    cfg = small_config(nodes_dim=2, tiles_node_dim=2, nf_tile=24,
                      nf_cutoff=8, buf_extra=0, cosmo_expansion=False,
                      shake=False, pid=True, coarse_sort=True,
                      coarse_gather_pallas=True)
    mesh = make_sim_mesh(2)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    sweep = step_mod.make_sweep(cfg, mesh, pp_band=16)
    rng = np.random.default_rng(5)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, mesh)
    one = jnp.float32(1.0)
    dt = jnp.float32(0.2)
    st2 = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c), one, dt,
                one, st.tau + dt, st.t + dt)
    cfg_b = dataclasses.replace(cfg, coarse_gather_pallas=False)
    sweep_b = step_mod.make_sweep(cfg_b, mesh, pp_band=16)
    st3 = sweep_b(st, jnp.asarray(kern_f), jnp.asarray(kern_c), one, dt,
                  one, st.tau + dt, st.t + dt)
    xa, va, pa = state_mod.gather_global(cfg, st2)[:3]
    xb, vb, pb = state_mod.gather_global(cfg_b, st3)[:3]
    oa, ob = np.argsort(pa), np.argsort(pb)
    np.testing.assert_allclose(xa[oa], xb[ob], atol=1e-5)
    np.testing.assert_allclose(va[oa], vb[ob], atol=1e-5)


def test_coarse_sort_multidevice():
    """coarse_sort under a real 8-device mesh (per-device local sorts)."""
    cfg = small_config(nodes_dim=2, tiles_node_dim=2, nf_tile=24,
                      nf_cutoff=8, buf_extra=0, cosmo_expansion=False,
                      shake=False, pid=True, coarse_sort=True)
    mesh = make_sim_mesh(2)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    sweep = step_mod.make_sweep(cfg, mesh, pp_band=16)
    rng = np.random.default_rng(3)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, mesh)
    one = jnp.float32(1.0)
    dt = jnp.float32(0.2)
    st2 = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c), one, dt,
                one, st.tau + dt, st.t + dt)
    assert int(np.asarray(st2.np_local).sum()) == cfg.np_total
    # against the unsorted path on the same mesh
    cfg_b = dataclasses.replace(cfg, coarse_sort=False)
    sweep_b = step_mod.make_sweep(cfg_b, mesh, pp_band=16)
    st3 = sweep_b(st, jnp.asarray(kern_f), jnp.asarray(kern_c), one, dt,
                  one, st.tau + dt, st.t + dt)
    xa, va = state_mod.gather_global(cfg, st2)[:2]
    xb, vb = state_mod.gather_global(cfg_b, st3)[:2]
    pa = state_mod.gather_global(cfg, st2)[2]
    pb = state_mod.gather_global(cfg_b, st3)[2]
    oa, ob = np.argsort(pa), np.argsort(pb)
    np.testing.assert_allclose(xa[oa], xb[ob], atol=2e-3)
    np.testing.assert_allclose(va[oa], vb[ob], atol=2e-3)
