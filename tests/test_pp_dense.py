"""PPINT dense-tail tests: no pair dropping in over-occupied fine cells.

The reference never drops pairs (it sizes `max_llf` and aborts,
particle_mesh_threaded.f90:280-284); our counterpart is the band pass +
dense tail (ops/pp.py ppint_force), whose pp_overflow must stay 0 up to
pp_dense_band occupancy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cubep3m_tpu.ops import binning, pp


def _brute_same_cell(x, cell, mass_p, rsoft):
    """O(N^2) reference: untapered same-cell pair forces."""
    n = x.shape[0]
    f = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j or cell[i] != cell[j]:
                continue
            sep = x[i] - x[j]
            r = np.linalg.norm(sep)
            if r <= rsoft:
                continue
            f[i] -= mass_p * sep / r ** 3
    return f


def _clustered(seed, nf, n_dense, n_sparse):
    """n_dense particles crammed into one cell + a sparse background."""
    rng = np.random.default_rng(seed)
    xd = (np.array([3.0, 4.0, 5.0])
          + rng.uniform(0.05, 0.95, (n_dense, 3))).astype(np.float32)
    xs = rng.uniform(0, nf, (n_sparse, 3)).astype(np.float32)
    return np.concatenate([xd, xs]).astype(np.float32)


def test_dense_tail_matches_bruteforce():
    nf = 8
    band = 4
    x = _clustered(0, nf, n_dense=13, n_sparse=40)  # occupancy 13 > band+1
    n = x.shape[0]
    valid = jnp.ones(n, bool)
    sp = binning.sort_by_cell(jnp.asarray(x), valid, nf)
    xs = jnp.asarray(x)[sp.order]
    res = pp.ppint_force(xs, sp.cell, sp.rank, nf ** 3, band=band,
                         dense_band=64, dense_cap=64, mass_p=8.0,
                         rsoft=0.1, pp_bias=1.0)
    assert int(res.overflow) == 0
    cell_np = np.asarray(sp.cell)
    f_ref = _brute_same_cell(np.asarray(xs), cell_np, 8.0, 0.1)
    np.testing.assert_allclose(np.asarray(res.force), f_ref,
                               rtol=2e-4, atol=2e-4)


def test_band_alone_would_overflow():
    """Sanity: the same distribution genuinely exceeds the band, so the
    dense tail is doing real work."""
    nf = 8
    band = 4
    x = _clustered(1, nf, n_dense=13, n_sparse=40)
    valid = jnp.ones(x.shape[0], bool)
    sp = binning.sort_by_cell(jnp.asarray(x), valid, nf)
    res = pp.ppint_band_force(jnp.asarray(x)[sp.order], sp.cell, sp.rank,
                              nf ** 3, band, 8.0, 0.1, 1.0)
    assert int(res.overflow) > 0


def test_cell_occupancy():
    nf = 8
    x = _clustered(2, nf, n_dense=9, n_sparse=20)
    valid = jnp.ones(x.shape[0], bool)
    sp = binning.sort_by_cell(jnp.asarray(x), valid, nf)
    occ = np.asarray(pp.cell_occupancy(sp.cell, sp.rank))
    cell_np = np.asarray(sp.cell)
    counts = {c: int((cell_np == c).sum()) for c in np.unique(cell_np)}
    for i in range(x.shape[0]):
        assert occ[i] == counts[cell_np[i]]


def test_dense_overflow_counted_beyond_dense_band():
    """Occupancy beyond dense_band+1 is surfaced, not silent."""
    nf = 8
    x = _clustered(3, nf, n_dense=12, n_sparse=10)
    valid = jnp.ones(x.shape[0], bool)
    sp = binning.sort_by_cell(jnp.asarray(x), valid, nf)
    res = pp.ppint_force(jnp.asarray(x)[sp.order], sp.cell, sp.rank,
                         nf ** 3, band=4, dense_band=8, dense_cap=64,
                         mass_p=8.0, rsoft=0.1, pp_bias=1.0)
    # occupancy 12 > dense_band+1=9: ranks 9..11 counted
    assert int(res.overflow) == 3


def test_dense_tail_inside_jit_sweep():
    """ppint_force (incl. the lax.cond skip) compiles inside the full
    sweep and leaves pp_overflow at 0 for a clustered load."""
    from cubep3m_tpu import small_config
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core.driver import Simulation

    cfg = small_config(pp=True, cosmo_expansion=False, pp_band=4,
                       pp_dense_band=64)
    sim = Simulation(cfg)
    nf = cfg.nf_physical_node_dim
    x = _clustered(4, nf, n_dense=10, n_sparse=50)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    st = step_shard(sim, st)
    st2 = sim.sweep(st, sim.kern_f, sim.kern_c, jnp.float32(1.0),
                    jnp.float32(0.01), jnp.float32(1.0), jnp.float32(0.01),
                    jnp.float32(0.01))
    assert int(st2.pp_overflow) == 0
    assert int(st2.np_local.sum()) == x.shape[0]


def step_shard(sim, st):
    from cubep3m_tpu.core import step as step_mod
    return step_mod.shard_state(st, sim.mesh)
