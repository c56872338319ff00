"""TVD MHD solver tests (reference mpi_tvd_mhd.f90 physics contract)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cubep3m_tpu.mhd import tvd


GAMMA = 5.0 / 3.0


def test_uniform_state_stationary():
    u, b = tvd.uniform_gas((16, 16, 16), rho=2.0, p=1.5)
    u2, b2 = tvd.gas_step(u, b, dt_gas=0.05)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-6)


def test_conservation():
    rng = np.random.default_rng(0)
    n = 16
    u, b = tvd.uniform_gas((n, n, n))
    u = u.at[0].add(jnp.asarray(0.3 * rng.random((n, n, n)), jnp.float32))
    u = u.at[1].add(jnp.asarray(0.1 * rng.standard_normal((n, n, n)),
                                jnp.float32))
    u = u.at[4].add(jnp.asarray(0.2 * rng.random((n, n, n)), jnp.float32))
    tot0 = np.asarray(u).sum(axis=(1, 2, 3))
    dt = float(tvd.calcfl(u, b))
    for _ in range(4):
        u, b = tvd.gas_step(u, b, dt_gas=dt / 4)
    tot1 = np.asarray(u).sum(axis=(1, 2, 3))
    # mass, momentum, energy conserved (periodic)
    np.testing.assert_allclose(tot1, tot0, rtol=2e-5, atol=2e-4)
    assert np.all(np.asarray(u[0]) > 0)


def test_sod_shock_tube():
    """1-D Sod tube along x: density jump resolves into the classic
    rarefaction/contact/shock structure with intermediate plateau."""
    n = 128
    u, b = tvd.uniform_gas((n, 4, 4), rho=1.0, p=1.0, gamma=GAMMA)
    x = np.arange(n)
    right = (x >= n // 2)
    rho = np.where(right, 0.125, 1.0)
    p = np.where(right, 0.1, 1.0)
    u = u.at[0].set(jnp.asarray(np.broadcast_to(rho[:, None, None],
                                                (n, 4, 4)), jnp.float32))
    u = u.at[4].set(jnp.asarray(np.broadcast_to(
        (p / (GAMMA - 1))[:, None, None], (n, 4, 4)), jnp.float32))
    t = 0.0
    while t < 15.0:
        dt = float(tvd.calcfl(u, b, cfl=0.6))
        u, b = tvd.gas_step(u, b, dt_gas=dt / 2)  # one gas_step = 2*dt_gas
        t += 2 * (dt / 2)
    prof = np.asarray(u[0][:, 0, 0])
    # contact/shock plateau density for Sod: ~0.26-0.43 region between
    # the two initial states must exist
    mid = prof[(prof > 0.2) & (prof < 0.5)]
    assert mid.size > 5, f"no intermediate plateau: {prof}"
    assert prof.max() <= 1.05 and prof.min() >= 0.1
    # no NaN anywhere
    assert np.all(np.isfinite(np.asarray(u)))


def test_div_b_preserved():
    """Constrained transport keeps div B = 0 to roundoff."""
    rng = np.random.default_rng(1)
    n = 16
    u, b = tvd.uniform_gas((n, n, n))
    # random velocity field
    u = u.at[1:4].add(jnp.asarray(0.3 * rng.standard_normal((3, n, n, n)),
                                  jnp.float32))
    # divergence-free B: b = curl A from a random vector potential
    A = rng.standard_normal((3, n, n, n)).astype(np.float32)
    bx = (np.roll(A[2], -1, 1) - A[2]) - (np.roll(A[1], -1, 2) - A[1])
    by = (np.roll(A[0], -1, 2) - A[0]) - (np.roll(A[2], -1, 0) - A[2])
    bz = (np.roll(A[1], -1, 0) - A[1]) - (np.roll(A[0], -1, 1) - A[0])
    b = jnp.asarray(np.stack([bx, by, bz]) * 0.1)
    div0 = np.abs(np.asarray(tvd.div_b(b))).max()
    assert div0 < 1e-5
    dt = float(tvd.calcfl(u, b))
    for _ in range(3):
        u, b = tvd.gas_step(u, b, dt_gas=dt / 4)
    div1 = np.abs(np.asarray(tvd.div_b(b))).max()
    assert div1 < 5e-5, f"div B grew: {div0} -> {div1}"
    assert np.all(np.isfinite(np.asarray(b)))


def test_calcfl_positive():
    u, b = tvd.uniform_gas((8, 8, 8))
    dt = float(tvd.calcfl(u, b))
    assert 0 < dt < 1.0
