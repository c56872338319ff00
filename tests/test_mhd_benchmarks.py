"""Magnetized shock benchmarks for the TVD+CT solver (VERDICT r3 Weak #6).

Two published problems exercising `tvdb`'s CT fluxes and the full
magnetized Riemann structure, with quantitative tolerances:

* Brio & Wu (1988) shock tube (gamma=2): the canonical MHD Riemann
  problem.  At t=0.1 (unit box) the solution carries, left to right, a
  fast rarefaction, a slow compound wave, a contact, a slow shock and a
  fast rarefaction, with density plateaus near rho~0.68 (left of the
  contact) and rho~0.26 (right of it) — e.g. Stone et al. 2008 (Athena),
  fig. 22.  Reference solver: mpi_tvd_mhd.f90:851-990 (same relaxing TVD
  scheme, Pen, Arras & Wong 2003).

* Orszag-Tang (1979) vortex (gamma=5/3): supersonic 2-D MHD turbulence
  with interacting shocks.  No closed-form solution; validated by
  (a) exact div B preservation from an exactly staggered-divergence-free
  vector-potential IC, (b) conservation, (c) the vortex's 180-degree
  point symmetry, (d) grid self-convergence of the density field
  (first-order-or-better L1 convergence through shock formation).
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cubep3m_tpu.mhd import tvd


def run_to(u, b, t_end, gamma, cfl=0.6):
    """March to t_end with CFL steps.  gas_step/calcfl are jitted ONCE
    per shape with dt as a traced argument — the unjitted loop retraced
    hundreds of compiles, and the old `(t_end - t)/2` cap (gas_step
    advances 2*dt_gas, so the TOTAL advance is capped at the remainder,
    not half of it) made the tail approach t_end geometrically."""
    step = jax.jit(functools.partial(tvd.gas_step, gamma=gamma))
    fl = jax.jit(functools.partial(tvd.calcfl, cfl=cfl, gamma=gamma))
    t = 0.0
    while t < t_end * (1.0 - 1e-9):
        dt = min(float(fl(u, b)), t_end - t)
        u, b = step(u, b, dt_gas=dt / 2)
        t += dt
    return u, b


def test_brio_wu_shock_tube():
    # PERIODIC box caveat: the wrap-around jump at x=0 launches a second
    # (mirrored) Riemann fan whose fast wave moves at c_f ~ 3.75 in the
    # light right state (~96 cells by t=0.1*256).  A 512-cell box with
    # the standard jump spacing keeps windows of both far fields clean
    # at the published output time (in a 256 box NO cell keeps By=-1).
    gamma = 2.0
    n = 512
    n2 = n // 2
    u, b = tvd.uniform_gas((n, 1, 1), rho=1.0, p=1.0, gamma=gamma)
    x = np.arange(n)
    right = (x >= n2)
    rho = np.where(right, 0.125, 1.0).astype(np.float32)
    p = np.where(right, 0.1, 1.0).astype(np.float32)
    by = np.where(right, -1.0, 1.0).astype(np.float32)
    bx = np.full(n, 0.75, np.float32)
    u = u.at[0].set(jnp.asarray(rho[:, None, None]))
    b = b.at[0].set(jnp.asarray(bx[:, None, None]))
    b = b.at[1].set(jnp.asarray(by[:, None, None]))
    # total energy with the magnetic term (cell-centered == face values
    # for a 1-D x-profile: the y/z faces are uniform along y/z)
    e = p / (gamma - 1) + 0.5 * (bx ** 2 + by ** 2)
    u = u.at[4].set(jnp.asarray(e[:, None, None]))

    tot0 = np.asarray(u).sum(axis=(1, 2, 3))
    # published output time t=0.1 on a unit box of the jump spacing n2
    u, b = run_to(u, b, 0.1 * n2, gamma)
    prof = np.asarray(u[0][:, 0, 0])
    byf = np.asarray(b[1][:, 0, 0])
    assert np.all(np.isfinite(prof)) and np.all(np.isfinite(byf))

    # conservation on the periodic box
    tot1 = np.asarray(u).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(tot1, tot0, rtol=1e-4, atol=1e-4)

    # density bounded near the solution extremes: the max never exceeds
    # the left state, and the min is the ~0.11 inter-wave state between
    # the slow shock and the right fast rarefaction (Athena fig. 22 dips
    # to ~0.109 there; we measure 0.107 at this resolution) — NOT the
    # 0.125 ambient right state
    assert prof.max() < 1.03 and prof.min() > 0.095

    # published plateau structure at t=0.1 (Brio & Wu 1988 fig. 2;
    # Athena fig. 22): a >=4-cell plateau near 0.68 left of the contact
    # and near 0.26 right of it, in the Brio-Wu fan (spread < 64 cells
    # each way from the n2 jump at this time)
    mid = prof[n2 - 64: n2 + 64]
    plateau_a = mid[(mid > 0.62) & (mid < 0.73)]
    plateau_b = mid[(mid > 0.22) & (mid < 0.31)]
    assert plateau_a.size >= 4, f"no ~0.68 plateau: {np.round(mid, 3)}"
    assert plateau_b.size >= 4, f"no ~0.26 plateau: {np.round(mid, 3)}"

    # By flips sign through the compound wave / contact region, and the
    # windows untouched by EITHER fan (Brio-Wu's at n2, the mirrored
    # wrap-around fan at 0: heads ~48 cells in the heavy medium, ~96 in
    # the light one by this time) keep their initial values
    assert byf[60:n2 - 56].mean() > 0.95
    assert byf[n2 + 104: n - 104].mean() < -0.95
    flip = np.where(np.diff(np.sign(byf[n2 - 64: n2 + 64])) != 0)[0]
    assert flip.size >= 1, "By never crosses zero in the wave fan"

    # Bx is exactly conserved (1-D: no x-flux for the x-face field)
    np.testing.assert_allclose(np.asarray(b[0][:, 0, 0]), 0.75, atol=1e-5)


def _orszag_tang(n, gamma=5.0 / 3.0):
    """Standard OT vortex on [0,1]^2 as an (n, n, 1) slab; face-centered
    B from a vector potential so the STAGGERED divergence is exactly 0."""
    i = np.arange(n, dtype=np.float64)
    xc = (i + 0.5) / n                       # cell centers
    xf = i / n                               # lower faces
    X, Y = np.meshgrid(xc, xc, indexing="ij")
    rho = np.full((n, n), 25.0 / (36.0 * np.pi))
    p = np.full((n, n), 5.0 / (12.0 * np.pi))
    vx = -np.sin(2 * np.pi * Y)
    vy = np.sin(2 * np.pi * X)
    b0 = 1.0 / np.sqrt(4.0 * np.pi)
    # Az = b0*(cos(4 pi x)/(4 pi) + cos(2 pi y)/(2 pi));
    # bx(face i,j) = [Az(i, j+1) - Az(i, j)]/dy at x=xf -> -b0 sin(2 pi y)
    az = lambda x, y: b0 * (np.cos(4 * np.pi * x) / (4 * np.pi)
                            + np.cos(2 * np.pi * y) / (2 * np.pi))
    XF, YC = np.meshgrid(xf, xc, indexing="ij")
    XC, YF = np.meshgrid(xc, xf, indexing="ij")
    dy = 1.0 / n
    bx = (az(XF, YC + dy / 2) - az(XF, YC - dy / 2)) / dy
    by = -(az(XC + dy / 2, YF) - az(XC - dy / 2, YF)) / dy
    bc = 0.5 * (bx + np.roll(bx, -1, 0)), 0.5 * (by + np.roll(by, -1, 1))
    e = (p / (gamma - 1) + 0.5 * rho * (vx ** 2 + vy ** 2)
         + 0.5 * (bc[0] ** 2 + bc[1] ** 2))
    u = np.stack([rho, rho * vx, rho * vy, np.zeros_like(rho), e])
    b = np.stack([bx, by, np.zeros_like(bx)])
    return (jnp.asarray(u[..., None].astype(np.float32)),
            jnp.asarray(b[..., None].astype(np.float32)))


def test_orszag_tang_vortex():
    gamma = 5.0 / 3.0
    n = 64
    u, b = _orszag_tang(n)
    div0 = float(np.abs(np.asarray(tvd.div_b(b))).max())
    assert div0 < 1e-6, "IC not staggered-divergence-free"
    tot0 = np.asarray(u).sum(axis=(1, 2, 3))

    # t=0.3 on the unit box: shocks have formed and interacted
    u, b = run_to(u, b, 0.3 * n, gamma)
    assert np.all(np.isfinite(np.asarray(u)))
    rho = np.asarray(u[0][..., 0])
    assert np.all(rho > 0)

    # CT keeps the staggered divergence at roundoff THROUGH shocks
    div1 = float(np.abs(np.asarray(tvd.div_b(b))).max())
    assert div1 < 5e-5, f"div B grew through shocks: {div0} -> {div1}"

    # conservation on the periodic box
    tot1 = np.asarray(u).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(tot1[0], tot0[0], rtol=1e-5)   # mass
    np.testing.assert_allclose(tot1[4], tot0[4], rtol=1e-4)   # energy

    # the vortex's 180-degree point symmetry: rho(x,y) = rho(-x,-y)
    # about the box center (cell-center grid: index map i -> n-1-i)
    rot = rho[::-1, ::-1]
    err = np.abs(rho - rot).max() / rho.max()
    assert err < 5e-3, f"point symmetry broken: {err}"

    # shocks actually formed: the initially uniform density develops
    # order-unity contrast (published t=0.3 maps span roughly 2.5x)
    assert rho.max() / rho.min() > 1.8


def test_orszag_tang_self_convergence():
    """L1 self-convergence of rho through shock formation: the 2x-grid
    error must shrink by >=1.4x (first-order-or-better at shocks; smooth
    regions converge at 2nd order, so the measured rate sits between)."""
    gamma = 5.0 / 3.0
    t = 0.2
    sols = {}
    for n in (32, 64, 128):
        u, b = _orszag_tang(n)
        u, b = run_to(u, b, t * n, gamma)
        sols[n] = np.asarray(u[0][..., 0])

    def down(a, f):
        n = a.shape[0] // f
        return a.reshape(n, f, n, f).mean(axis=(1, 3))

    e_lo = np.abs(down(sols[64], 2) - sols[32]).mean()
    e_hi = np.abs(down(sols[128], 2) - sols[64]).mean()
    assert e_hi < e_lo / 1.4, (
        f"no convergence: L1(64 vs 32)={e_lo:.3e}, "
        f"L1(128 vs 64)={e_hi:.3e}")
