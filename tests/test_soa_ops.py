"""SoA (C, N) op variants vs their AoS (N, C) counterparts.

The staged 256^3+ path runs entirely on the `*_t` variants (ops/deposit.py,
ops/binning.py, ops/pp.py) because (M, small) materializations lane-pad
42x on TPU; these tests pin each variant to its row-major original.
"""
import numpy as np
import jax.numpy as jnp

from cubep3m_tpu.ops import binning, deposit, pp


def _cloud(n, nf, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w)


def test_ngp_deposit_t_matches():
    x, w = _cloud(3000, 16, 0)
    a = deposit.ngp_deposit(x, w, (16, 16, 16))
    b = deposit.ngp_deposit_t(x.T, w, (16, 16, 16))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)


def test_cic_deposit_t_matches():
    x, w = _cloud(3000, 32, 1)
    shape = (10, 10, 10)
    a = deposit.cic_deposit(x, w, shape, scale=4.0, offset=-0.5, pad=1)
    b = deposit.cic_deposit_t(x.T, w, shape, scale=4.0, offset=-0.5, pad=1)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_gathers_t_match():
    rng = np.random.default_rng(2)
    nf = 16
    x, _ = _cloud(2000, nf, 2)
    field = jnp.asarray(rng.normal(size=(3, nf, nf, nf)).astype(np.float32))
    cells = jnp.asarray(
        (np.floor(np.asarray(x)).astype(np.int64) @
         np.array([nf * nf, nf, 1])).astype(np.int32))
    a = deposit.ngp_gather(field, x, flat_cells=cells)
    b = deposit.ngp_gather_t(field, cells)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a).T, rtol=1e-6)

    fieldp = jnp.asarray(rng.normal(size=(3, 6, 6, 6)).astype(np.float32))
    a2 = deposit.cic_gather(fieldp, x, scale=4.0, offset=-0.5, pad=1)
    b2 = deposit.cic_gather_corner_t(fieldp, x.T, scale=4.0, offset=-0.5,
                                     pad=1)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a2).T,
                               rtol=1e-4, atol=1e-5)
    b3 = deposit.cic_gather_t(fieldp, x.T, scale=4.0, offset=-0.5, pad=1)
    np.testing.assert_allclose(np.asarray(b3), np.asarray(a2).T,
                               rtol=1e-4, atol=1e-5)


def test_sort_by_cell_t_matches():
    x, _ = _cloud(1000, 8, 3)
    valid = jnp.arange(1000) < 900
    a = binning.sort_by_cell(x, valid, 8)
    b = binning.sort_by_cell_t(x.T, valid, 8)
    np.testing.assert_array_equal(np.asarray(b.cell), np.asarray(a.cell))
    np.testing.assert_array_equal(np.asarray(b.rank), np.asarray(a.rank))


def test_ppint_force_t_matches():
    nf = 8
    rng = np.random.default_rng(4)
    x = np.zeros((512, 3), np.float32)
    x[:480] = rng.uniform(0, nf, (480, 3))
    x[:40] = np.array([2.0, 3.0, 4.0]) + rng.uniform(0.05, 0.95, (40, 3))
    valid = jnp.arange(512) < 480
    sp = binning.sort_by_cell(jnp.asarray(x), valid, nf)
    xs = jnp.asarray(x)[sp.order]
    args = (sp.cell, sp.rank, nf ** 3, 8, 48, 128, 1.5, 0.1, 1.0)
    a = pp.ppint_force(xs, *args)
    b = pp.ppint_force_t(xs.T, *args)
    np.testing.assert_allclose(np.asarray(b.force), np.asarray(a.force).T,
                               rtol=2e-5, atol=2e-5)
    assert int(a.overflow) == int(b.overflow)
