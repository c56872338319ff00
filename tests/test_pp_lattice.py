"""Lattice-shift PP_EXT (ops/pp_lattice.py) correctness tests.

The lattice path must reproduce the reference PP_EXT pair sum
(`particle_mesh_threaded.f90:488-615`) exactly: same pair set (distinct
fine cells within pp_range, periodic), same taper, no pair counted twice
across the 8 shifted super-cell sorts.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.ops import pp, pp_lattice


def direct_ext_force(x, nf, pp_range, nf_cutoff, mass_p, rsoft, pp_bias):
    """O(N^2) reference sum over periodic images (numpy, float64)."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    f = np.zeros((n, 3))
    taper_cut = nf_cutoff + np.sqrt(3.0)
    offs = np.array([(a, b, c) for a in (-nf, 0, nf)
                     for b in (-nf, 0, nf) for c in (-nf, 0, nf)])
    for i in range(n):
        for off in offs:
            sep = x[i] - (x + off)               # (n, 3)
            dc = np.abs(np.floor(x[i]) - np.floor(x + off))
            near = (dc.max(axis=1) <= pp_range) & (dc.sum(axis=1) > 0)
            r = np.sqrt((sep ** 2).sum(axis=1))
            ok = near & (r > rsoft)
            s = r * pp_bias / nf_cutoff
            taper = np.where(r <= taper_cut,
                             1 - 1.75 * s ** 3 + 0.75 * s ** 5, 1.0)
            w = np.where(ok, mass_p * taper
                         / np.where(ok, (r * pp_bias) ** 3, 1.0), 0.0)
            f[i] -= (sep * w[:, None]).sum(axis=0)
    return f


def _cloud(rng, n, nf):
    """Random points with a dense clump near a face (exercises ghosts +
    the dense tail) and a clump spanning the periodic corner."""
    return np.vstack([
        rng.uniform(0, nf, (n, 3)),
        np.array([nf / 2, 1.0, nf / 2]) + rng.uniform(-1.5, 1.5, (n // 2, 3)),
        rng.uniform(-1.5, 1.5, (n // 3, 3)) % nf,
    ]).astype(np.float32)


def test_lattice_matches_direct_sum():
    nf, pr, nfc = 16, 2, 8
    rng = np.random.default_rng(7)
    x = _cloud(rng, 120, nf)
    n = x.shape[0]
    valid = jnp.ones(n, bool)
    res = pp_lattice.pp_ext_lattice_force(
        jnp.asarray(x), valid, nf, pr, nfc, mass_p=8.0, rsoft=0.1,
        pp_bias=1.0, band=16, dense_band=256, dense_cap=8 * n,
        ghost_cap=n)
    assert int(res.overflow) == 0
    f_ref = direct_ext_force(x, nf, pr, nfc, 8.0, 0.1, 1.0)
    np.testing.assert_allclose(np.asarray(res.force), f_ref,
                               rtol=2e-4, atol=2e-4)


def test_lattice_matches_bucket():
    """On an interior cloud (no periodic pairs involved) the lattice and
    bucket implementations must agree pair-for-pair."""
    cfg = small_config(pp=True, pp_ext=True, pp_range=2,
                       cosmo_expansion=False, pp_coarse_capacity=256)
    nf = cfg.nf_physical_node_dim
    nc, ms = cfg.nc_node_dim, cfg.mesh_scale
    rng = np.random.default_rng(3)
    x = (np.array([nf / 2] * 3)
         + rng.uniform(-6, 6, (400, 3))).astype(np.float32)
    xj = jnp.asarray(x)
    valid = jnp.ones(x.shape[0], bool)
    res_l = pp_lattice.pp_ext_lattice_force(
        xj, valid, nf, cfg.pp_range, cfg.nf_cutoff, cfg.mass_p,
        cfg.rsoft, cfg.pp_bias, band=32, dense_band=512,
        dense_cap=x.shape[0], ghost_cap=256)
    buckets = pp.bucket_by_coarse_cell(xj, valid, nc, ms, 256)
    res_b = pp.pp_ext_force(xj, buckets, nc, ms, cfg.pp_range,
                            cfg.nf_cutoff, cfg.mass_p, cfg.rsoft,
                            cfg.pp_bias)
    assert int(res_l.overflow) == 0
    assert int(res_b.overflow) == 0
    np.testing.assert_allclose(np.asarray(res_l.force),
                               np.asarray(res_b.force),
                               rtol=5e-4, atol=5e-4)


def test_lattice_dense_tail_counts():
    """A clump denser than the band must spill into the dense tail, not
    drop pairs; shrinking dense_band below the occupancy must surface
    overflow instead of silently missing force."""
    nf, pr, nfc = 16, 2, 8
    rng = np.random.default_rng(11)
    x = (np.array([5.0, 5.0, 5.0])
         + rng.uniform(0, 3.9, (80, 3))).astype(np.float32)
    valid = jnp.ones(80, bool)
    kw = dict(pp_range=pr, nf_cutoff=nfc, mass_p=8.0, rsoft=0.1,
              pp_bias=1.0, dense_cap=128, ghost_cap=64)
    full = pp_lattice.pp_ext_lattice_force(
        jnp.asarray(x), valid, nf, band=128, dense_band=128, **kw)
    tail = pp_lattice.pp_ext_lattice_force(
        jnp.asarray(x), valid, nf, band=8, dense_band=128, **kw)
    trunc = pp_lattice.pp_ext_lattice_force(
        jnp.asarray(x), valid, nf, band=8, dense_band=16, **kw)
    assert int(full.overflow) == 0 and int(tail.overflow) == 0
    np.testing.assert_allclose(np.asarray(tail.force),
                               np.asarray(full.force),
                               rtol=1e-4, atol=1e-4)
    assert int(trunc.overflow) > 0


def test_lattice_sweep_runs():
    cfg = small_config(pp=True, pp_ext=True, pp_range=2,
                       cosmo_expansion=False)
    assert cfg.pp_ext_impl == "lattice"
    sim = Simulation(cfg, pp_band=16)
    st = state_mod.random_ic(cfg, seed=4, fraction=0.5)
    st2 = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.2, 1.0, 0.2, 0.2)
    assert int(st2.bucket_overflow) == 0
    assert np.all(np.isfinite(np.asarray(st2.v)))


def test_staged_tail_chunk_matches_single():
    """`cfg.pp_ext_tail_chunk` splits each shift's dense-tail pass into
    bounded b5t dispatches (the single-dispatch tail at 256³ production
    clustering is ~6e11 pair lanes and crashes the tunnel worker —
    campaign_r9.log ppext256-demo).  The chunked staged sweep must
    reproduce the single-dispatch staged sweep exactly: chunks
    partition the pair set by left index, so only f32 accumulation
    order differs."""
    import dataclasses
    from cubep3m_tpu.parallel.mesh import make_sim_mesh
    from cubep3m_tpu import kernels as kernels_mod
    cfg = small_config(pp=True, pp_ext=True, pp_range=2,
                       cosmo_expansion=False, pp_ext_band=4,
                       pp_ext_tail_band=256)
    assert cfg.pp_ext_impl == "lattice"
    nf = cfg.nf_physical_node_dim
    rng = np.random.default_rng(5)
    x = np.vstack([
        rng.uniform(0, nf, (200, 3)),
        np.array([nf / 2, 2.0, nf / 2])
        + rng.uniform(-1.8, 1.8, (120, 3)),
    ]).astype(np.float32)
    v = (0.05 * rng.normal(size=x.shape)).astype(np.float32)
    mesh = make_sim_mesh(1)
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    outs = []
    for chunk in (0, 16):
        c = dataclasses.replace(cfg, pp_ext_tail_chunk=chunk)
        c.validate()
        st = state_mod.distribute_global(c, x, v)
        st = step_mod.shard_state(st, mesh)
        sweep = step_mod.make_staged_sweep(c, mesh)
        out = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c),
                    jnp.float32(1.0), jnp.float32(0.1),
                    jnp.float32(1.0), jnp.float32(0.1),
                    jnp.float32(0.1))
        assert int(out.bucket_overflow) == 0
        outs.append(np.asarray(out.v))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lattice_multidevice_matches_single():
    """Cross-boundary pairs via ghost copies: 8-device lattice PP_EXT
    must match single-device on the same global ICs."""
    def cfgk(nodes, tiles):
        return small_config(pp=True, pp_ext=True, pp_range=2,
                            cosmo_expansion=False, shake=False,
                            nodes_dim=nodes, tiles_node_dim=tiles)

    cfg1, cfg8 = cfgk(1, 4), cfgk(2, 2)
    rng = np.random.default_rng(5)
    nf = cfg1.nf_physical_dim
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
