"""Regular-stencil coarse path vs exact per-particle CIC."""
import numpy as np
import pytest

import jax.numpy as jnp

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.ops import coarse_stencil as cst
from cubep3m_tpu.ops import deposit
from cubep3m_tpu.core.step import fold_pads


def test_stencil_deposit_matches_cic_of_cell_centers():
    """The stencil deposit equals the exact CIC deposit of unit masses
    placed at fine-cell centers."""
    rng = np.random.default_rng(0)
    nf, ms = 16, 4
    nc = nf // ms
    rho = rng.random((nf, nf, nf)).astype(np.float32)
    got = np.asarray(cst.coarse_deposit_from_fine(jnp.asarray(rho), ms))
    # reference: every fine cell center deposits rho[i] via exact CIC
    g = np.arange(nf) + 0.5
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    w = jnp.asarray(rho.reshape(-1))
    want = np.asarray(deposit.cic_deposit(jnp.asarray(pos), w,
                                          (nc + 2,) * 3, scale=ms,
                                          offset=-0.5, pad=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stencil_gather_matches_cic_at_centers():
    rng = np.random.default_rng(1)
    nf, ms = 16, 4
    nc = nf // ms
    fc = rng.standard_normal((3, nc + 2, nc + 2, nc + 2)).astype(np.float32)
    got = np.asarray(cst.coarse_gather_to_fine(jnp.asarray(fc), ms))
    g = np.arange(nf) + 0.5
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    want = np.asarray(deposit.cic_gather(jnp.asarray(fc), jnp.asarray(pos),
                                         scale=ms, offset=-0.5, pad=1))
    np.testing.assert_allclose(got.reshape(3, -1).T, want, rtol=1e-5,
                               atol=1e-5)


def test_fast_coarse_sweep_close_to_exact():
    """Full sweeps with coarse_from_fine stay close to the exact path
    (positions quantized to fine centers in the coarse level only)."""
    rng = np.random.default_rng(2)
    cfgA = small_config(cosmo_expansion=False, shake=False)
    cfgB = small_config(cosmo_expansion=False, shake=False,
                        coarse_from_fine=True)
    nf = cfgA.nf_physical_node_dim
    x = rng.uniform(0, nf, (3000, 3)).astype(np.float32)
    v = np.zeros_like(x)

    def run(cfg):
        # one sweep: avoids chaotic divergence (an NGP cell flip after
        # differing drifts changes forces discontinuously)
        sim = Simulation(cfg, pp_band=16)
        st = state_mod.particles_ic(cfg, x, v)
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.3, 1.0, 0.0, 0.0)
        n = int(np.asarray(st.np_local).sum())
        pid = np.asarray(st.pid)[:n]
        o = np.argsort(pid)
        return np.asarray(st.x)[:n][o], np.asarray(st.v)[:n][o]

    xa, va = run(cfgA)
    xb, vb = run(cfgB)
    # kicks agree up to the small coarse-level quantization for the bulk
    v_rms = np.sqrt((va ** 2).mean())
    dv = np.abs(vb - va)
    assert np.percentile(dv, 99) < 0.1 * max(v_rms, 1e-6) + 1e-4
    np.testing.assert_allclose(xb, xa, atol=1e-4)  # same drift (pre-kick)
