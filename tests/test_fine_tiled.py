"""Tiled fine solve vs the single padded-node FFT: exact agreement.

The tile decomposition (fftconv.fine_force_tiled) must reproduce the
one-FFT solve to fp32 FFT roundoff — each tile carries the full nf_buf
halo, so its cropped region is the same linear convolution.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cubep3m_tpu import small_config, kernels as km, state as state_mod
from cubep3m_tpu.ops import fftconv
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def test_tiled_fine_force_matches_single():
    cfg1 = small_config(shake=False, cosmo_expansion=False)
    nf = cfg1.nf_physical_node_dim
    nf_buf = cfg1.nf_buf
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.normal(size=(nf + 2 * nf_buf,) * 3)
                      .astype(np.float32))

    k_single = jnp.asarray(km.fine_kernel_fourier(nf + 2 * nf_buf,
                                                  cfg1.nf_cutoff))
    k_tile = jnp.asarray(km.fine_kernel_fourier(nf // 2 + 2 * nf_buf,
                                                cfg1.nf_cutoff))
    f1 = fftconv.fine_force(rho, k_single, nf_buf, nf)
    f2 = fftconv.fine_force_tiled(rho, k_tile, nf_buf, nf, tiles=2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=2e-4, atol=2e-4)


def test_tiled_sweep_matches_single_fft_sweep():
    """Full sweeps with fine_fft_tiles=2 vs 1: identical trajectories."""
    def run(tiles):
        cfg = small_config(shake=False, cosmo_expansion=False,
                           fine_fft_tiles=tiles)
        mesh = make_sim_mesh(1)
        sweep = step_mod.make_sweep(cfg, mesh)
        kf, kc = km.build_kernels(cfg)
        kf, kc = jnp.asarray(kf), jnp.asarray(kc)
        st = state_mod.random_ic(cfg, seed=12)
        st = step_mod.shard_state(st, mesh)
        t = 0.0
        for _ in range(3):
            t += 0.1
            st = sweep(st, kf, kc, jnp.float32(1.0), jnp.float32(0.1),
                       jnp.float32(1.0), jnp.float32(t), jnp.float32(t))
        return st

    st1 = run(1)
    st2 = run(2)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st2.v), np.asarray(st1.v),
                               rtol=1e-3, atol=1e-4)


def test_tiled_potential_matches_single():
    cfg = small_config(shake=False, fine_potential=True)
    nf = cfg.nf_physical_node_dim
    nf_buf = cfg.nf_buf
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.normal(size=(nf + 2 * nf_buf,) * 3)
                      .astype(np.float32))
    kf_single, _ = km.build_kernels(
        small_config(shake=False, fine_potential=True))
    kf_tiled, _ = km.build_kernels(
        small_config(shake=False, fine_potential=True, fine_fft_tiles=2))
    f1 = fftconv.fine_force_potential(rho, jnp.asarray(kf_single),
                                      nf_buf, nf)
    f2 = fftconv.fine_force_potential_tiled(rho, jnp.asarray(kf_tiled),
                                            nf_buf, nf, tiles=2)
    # the LSQ potential projection is transform-size dependent (the
    # potential mode is the documented approximate variant), so tile- and
    # node-sized kernels agree only to the projection residual
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=5e-3)


@pytest.mark.parametrize("tiles", [1, 3])
def test_tiled_fine_force_odd_tile_count(tiles):
    """Odd tile counts exercise the classic last-tile branch (t3 % 2)."""
    nf, nf_buf, cutoff = 12, 4, 4
    rng = np.random.default_rng(2)
    rho = jnp.asarray(rng.normal(size=(nf + 2 * nf_buf,) * 3)
                      .astype(np.float32))
    k_single = jnp.asarray(km.fine_kernel_fourier(nf + 2 * nf_buf, cutoff))
    k_tile = jnp.asarray(km.fine_kernel_fourier(nf // tiles + 2 * nf_buf,
                                                cutoff))
    f1 = fftconv.fine_force(rho, k_single, nf_buf, nf)
    f2 = fftconv.fine_force_tiled(rho, k_tile, nf_buf, nf, tiles=tiles)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("tiles", [1, 3])
def test_tiled_potential_odd_tile_count(tiles):
    """Odd-tile-count potential solve.  Unlike the compact force kernel,
    the PROJECTED potential kernel has a slowly-decaying tail, so the
    tiled potential solve is approximate at tile boundaries — consistent
    with the quantized `--fast` mode's documented 1-3%% contract (at
    tiles=1 the tile IS the padded node, so agreement is exact)."""
    nf, nf_buf, cutoff = 12, 12, 4
    rng = np.random.default_rng(3)
    rho = jnp.asarray(rng.normal(size=(nf + 2 * nf_buf,) * 3)
                      .astype(np.float32))
    pk_single = jnp.asarray(km.potential_kernel_fourier(
        km.fine_kernel_fourier(nf + 2 * nf_buf, cutoff)))
    pk_tile = jnp.asarray(km.potential_kernel_fourier(
        km.fine_kernel_fourier(nf // tiles + 2 * nf_buf, cutoff)))
    f1 = fftconv.fine_force_potential(rho, pk_single, nf_buf, nf)
    f2 = fftconv.fine_force_potential_tiled(rho, pk_tile, nf_buf, nf,
                                            tiles=tiles)
    tol = 1e-4 if tiles == 1 else 0.01
    err = np.max(np.abs(np.asarray(f2) - np.asarray(f1)))
    assert err < tol, err
