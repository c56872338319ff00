"""Pallas PPINT band kernel vs the XLA band pass (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from cubep3m_tpu.ops import binning, pp, pp_pallas


def _sorted_cloud(n_valid, n_slots, nf, seed, cluster=None):
    rng = np.random.default_rng(seed)
    x = np.zeros((n_slots, 3), np.float32)
    x[:n_valid] = rng.uniform(0, nf, (n_valid, 3)).astype(np.float32)
    if cluster:
        # stuff `cluster` particles into one cell to exercise the band
        x[:cluster] = (np.array([3.0, 4.0, 5.0], np.float32)
                       + rng.uniform(0.05, 0.95, (cluster, 3))
                       .astype(np.float32))
    valid = np.arange(n_slots) < n_valid
    sp = binning.sort_by_cell(jnp.asarray(x), jnp.asarray(valid), nf)
    xs = jnp.asarray(x)[sp.order]
    return xs, sp


def test_pallas_band_matches_xla_band():
    nf = 8
    xs, sp = _sorted_cloud(900, 1024, nf, seed=1, cluster=24)
    band, mass_p, rsoft, bias = 16, 2.0, 0.1, 1.0
    ref = pp._band_pass(xs, sp.cell, 1, band, mass_p, rsoft, bias)
    got = pp_pallas.ppint_band_force_pallas(xs, sp.cell, band, mass_p,
                                            rsoft, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_band_multi_block():
    """Windows crossing pallas block boundaries (N > one block)."""
    nf = 16
    n_slots = 3 * pp_pallas._T + 17   # forces 4 blocks + ragged tail
    xs, sp = _sorted_cloud(n_slots - 40, n_slots, nf, seed=2, cluster=30)
    band, mass_p, rsoft, bias = 8, 1.0, 0.05, 0.95
    ref = pp._band_pass(xs, sp.cell, 1, band, mass_p, rsoft, bias)
    got = pp_pallas.ppint_band_force_pallas(xs, sp.cell, band, mass_p,
                                            rsoft, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_band_ppint_force_integration():
    """ppint_force with use_pallas matches the XLA path (incl. dense tail)."""
    nf = 8
    xs, sp = _sorted_cloud(700, 768, nf, seed=3, cluster=40)
    args = (xs, sp.cell, sp.rank, nf ** 3, 12, 48, 256, 1.0, 0.1, 1.0)
    ref = pp.ppint_force(*args, use_pallas=False)
    got = pp.ppint_force(*args, use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got.force), np.asarray(ref.force),
                               rtol=2e-5, atol=2e-5)
    assert int(got.overflow) == int(ref.overflow)
