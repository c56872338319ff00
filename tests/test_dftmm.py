"""MXU matmul DFT (ops/dftmm.py) vs jnp.fft — exactness of the FFT swap.

The force solves accept `use_mm` and must produce fp32-identical physics
either way (the reference has exactly one FFT backend, FFTW
`fft_fine.f90`; we have two and pin them equal).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cubep3m_tpu.ops import dftmm, fftconv


RNG = np.random.default_rng(7)


def _randc(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("shape", [(8, 8, 8), (12, 10, 8), (16, 16, 16)])
def test_fftn_ifftn_match_jnp(shape):
    z = _randc(shape)
    for mm, ref in [(dftmm.fftn_mm, jnp.fft.fftn),
                    (dftmm.ifftn_mm, jnp.fft.ifftn)]:
        a, b = np.asarray(ref(z)), np.asarray(mm(z))
        assert np.max(np.abs(a - b)) < 2e-5 * np.max(np.abs(a))


def test_real_input_fast_path():
    r = RNG.standard_normal((16, 16, 16)).astype(np.float32)
    a = np.asarray(jnp.fft.fftn(r.astype(np.complex64)))
    b = np.asarray(dftmm.fftn_mm(r))
    assert np.max(np.abs(a - b)) < 2e-5 * np.max(np.abs(a))


def test_batched_axes():
    z = _randc((3, 8, 8, 8))
    a = np.asarray(jnp.fft.ifftn(z, axes=(1, 2, 3)))
    b = np.asarray(dftmm.ifftn_mm(z, axes=(1, 2, 3)))
    assert np.max(np.abs(a - b)) < 2e-5 * np.max(np.abs(a))


def test_roundtrip():
    z = _randc((12, 12, 12))
    back = np.asarray(dftmm.ifftn_mm(dftmm.fftn_mm(z)))
    assert np.max(np.abs(back - z)) < 2e-5 * np.max(np.abs(z))


def test_force_from_density_equal():
    n = 16
    rho = RNG.standard_normal((n, n, n)).astype(np.float32)
    k = RNG.standard_normal((3, n, n, n)).astype(np.float32)
    f0 = np.asarray(fftconv.force_from_density(jnp.asarray(rho),
                                               jnp.asarray(k)))
    f1 = np.asarray(fftconv.force_from_density(jnp.asarray(rho),
                                               jnp.asarray(k), use_mm=True))
    assert np.max(np.abs(f0 - f1)) < 2e-5 * np.max(np.abs(f0))


def test_fine_force_tiled_equal():
    nf, nf_buf, tiles = 16, 4, 2
    npad = nf + 2 * nf_buf
    tpad = nf // tiles + 2 * nf_buf
    rho = RNG.standard_normal((npad, npad, npad)).astype(np.float32)
    k = RNG.standard_normal((3, tpad, tpad, tpad)).astype(np.float32)
    f0 = np.asarray(fftconv.fine_force_tiled(
        jnp.asarray(rho), jnp.asarray(k), nf_buf, nf, tiles))
    f1 = np.asarray(fftconv.fine_force_tiled(
        jnp.asarray(rho), jnp.asarray(k), nf_buf, nf, tiles, use_mm=True))
    assert np.max(np.abs(f0 - f1)) < 2e-5 * max(np.max(np.abs(f0)), 1e-6)


def test_fine_force_potential_tiled_equal():
    nf, nf_buf, tiles = 12, 4, 3  # odd tile count covers the tail branch
    npad = nf + 2 * nf_buf
    tpad = nf // tiles + 2 * nf_buf
    rho = RNG.standard_normal((npad, npad, npad)).astype(np.float32)
    k = RNG.standard_normal((tpad, tpad, tpad)).astype(np.float32)
    f0 = np.asarray(fftconv.fine_force_potential_tiled(
        jnp.asarray(rho), jnp.asarray(k), nf_buf, nf, tiles))
    f1 = np.asarray(fftconv.fine_force_potential_tiled(
        jnp.asarray(rho), jnp.asarray(k), nf_buf, nf, tiles, use_mm=True))
    assert np.max(np.abs(f0 - f1)) < 2e-5 * max(np.max(np.abs(f0)), 1e-6)


def test_zeldovich_ic_use_mm_same_realization():
    """use_mm=True keeps the same device RNG stream: identical ICs up to
    fp32 transform noise (unlike host_fft, which re-draws on host)."""
    from cubep3m_tpu import small_config
    from cubep3m_tpu.ic import zeldovich as zl

    cfg = small_config(z_i=50.0)
    st0 = zl.zeldovich_ic(cfg, seed=5, use_mm=False)
    st1 = zl.zeldovich_ic(cfg, seed=5, use_mm=True)
    n = int(st0.np_local[0])
    assert n == int(st1.np_local[0])
    np.testing.assert_allclose(np.asarray(st1.x)[:n], np.asarray(st0.x)[:n],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st1.v)[:n], np.asarray(st0.v)[:n],
                               atol=1e-4)


def test_power_on_device_use_mm_equal():
    from cubep3m_tpu import small_config
    from cubep3m_tpu.analysis import power as pw

    cfg = small_config()
    n = 500
    x = jnp.asarray(RNG.uniform(0, cfg.nf_physical_dim, (n, 3))
                    .astype(np.float32))
    p0 = pw.power_on_device(cfg, x, jnp.asarray(n), use_mm=False)
    p1 = pw.power_on_device(cfg, x, jnp.asarray(n), use_mm=True)
    np.testing.assert_allclose(p1.pk, p0.pk, rtol=1e-4)


def test_sweep_with_fft_matmul_matches():
    """Full sweeps with fft_matmul=True vs False: same trajectories to
    fp32 FFT-noise tolerance (pattern of tests/test_coarse_sort.py)."""
    import dataclasses
    from cubep3m_tpu import small_config, kernels as kernels_mod
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    base = small_config(cosmo_expansion=False, pid=True,
                        fine_fft_tiles=2)
    mesh = make_sim_mesh(1)
    outs = {}
    for mm in (False, True):
        cfg = dataclasses.replace(base, fft_matmul=mm)
        kern_f, kern_c = kernels_mod.build_kernels(cfg)
        sweep = step_mod.make_sweep(cfg, mesh, pp_band=16)
        rng = np.random.default_rng(3)
        nf = cfg.nf_physical_dim
        x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
        v = (0.3 * rng.normal(size=x.shape)).astype(np.float32)
        st = state_mod.particles_ic(cfg, x, v)
        one, dt = jnp.float32(1.0), jnp.float32(0.2)
        for _ in range(3):
            st = sweep(st, jnp.asarray(kern_f), jnp.asarray(kern_c),
                       one, dt, one, st.tau + dt, st.t + dt)
        n = int(st.np_local[0])
        o = np.argsort(np.asarray(st.pid)[:n])
        outs[mm] = (np.asarray(st.x)[:n][o], np.asarray(st.v)[:n][o])
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-3)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=2e-3)
