"""Fine-mesh ranked NGP deposit/gather Pallas kernels (interpret mode).

Equality is pinned against ops/deposit.py's XLA paths: the deposit must
match the sorted scatter-add bit-for-bit on power-of-two masses (sums of
equal f32 values are order-independent there) and to ~1 ulp otherwise;
the gather is an exact selection (HIGHEST-precision one-hot dots).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cubep3m_tpu.ops import deposit
from cubep3m_tpu.experiments import fine_pallas


def _sorted_keys(n, nf, nvalid, seed=0, cluster=0):
    """Sorted flat keys with `cluster` particles crammed in one cell and
    the tail at the sentinel (invalid slots)."""
    rng = np.random.default_rng(seed)
    nflat = nf ** 3
    keys = rng.integers(0, nflat, nvalid).astype(np.int64)
    if cluster:
        keys[:cluster] = 7 * nf * nf + 3 * nf + 2
    keys = np.sort(keys)
    full = np.full(n, nflat, np.int64)
    full[:nvalid] = keys
    w = np.zeros(n, np.float32)
    w[:nvalid] = 8.0                      # power-of-two unit mass
    return jnp.asarray(full.astype(np.int32)), jnp.asarray(w)


def _xla_deposit(skey, w, shape):
    nflat = shape[0] * shape[1] * shape[2]
    grid = jnp.zeros(nflat, jnp.float32)
    grid = grid.at[jnp.minimum(skey, nflat - 1)].add(
        jnp.where(skey < nflat, w, 0.0), indices_are_sorted=True)
    return grid.reshape(shape)


@pytest.mark.parametrize("nvalid,cluster", [
    (5000, 0),       # sparse: most cells empty, ranks ~ particles
    (5000, 3000),    # one mega-cell: rank windows revisit heavily
    (0, 0),          # all-invalid edge (empty state slots)
])
def test_deposit_matches_scatter(nvalid, cluster):
    nf, n = 16, 6000
    skey, w = _sorted_keys(n, nf, nvalid, cluster=cluster)
    ref = _xla_deposit(skey, w, (nf, nf, nf))
    out = fine_pallas.ngp_deposit_ranked(skey, w, (nf, nf, nf),
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_deposit_full_grid():
    """Every cell occupied (the production regime: occ fine cells ~0.93N)."""
    nf = 8
    nflat = nf ** 3
    keys = np.sort(np.concatenate([np.arange(nflat),
                                   np.arange(0, nflat, 3)]))
    n = keys.size
    skey = jnp.asarray(keys.astype(np.int32))
    w = jnp.full((n,), 8.0, jnp.float32)
    ref = _xla_deposit(skey, w, (nf, nf, nf))
    out = fine_pallas.ngp_deposit_ranked(skey, w, (nf, nf, nf),
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_deposit_nonuniform_weights_close():
    nf, n, nvalid = 16, 4096, 3000
    skey, w = _sorted_keys(n, nf, nvalid, seed=3)
    rng = np.random.default_rng(4)
    w = w * jnp.asarray(
        np.where(np.arange(n) < nvalid,
                 rng.uniform(0.5, 1.5, n), 0.0).astype(np.float32))
    ref = _xla_deposit(skey, w, (nf, nf, nf))
    out = fine_pallas.ngp_deposit_ranked(skey, w, (nf, nf, nf),
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize("nvalid,cluster", [(5000, 0), (5000, 3000)])
def test_gather_exact(nvalid, cluster):
    nf, n = 16, 6000
    skey, w = _sorted_keys(n, nf, nvalid, cluster=cluster, seed=7)
    rng = np.random.default_rng(8)
    field = jnp.asarray(rng.normal(size=(3, nf, nf, nf)).astype(np.float32))
    out = fine_pallas.ngp_gather_ranked(field, skey, w, interpret=True)
    ref = field.reshape(3, -1)[:, np.minimum(np.asarray(skey), nf ** 3 - 1)]
    ref = np.where(np.asarray(skey)[None, :] < nf ** 3, np.asarray(ref), 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_shared_plan_deposit_then_gather():
    """The sweep shares one plan between the deposit and the gather."""
    nf, n, nvalid = 16, 4096, 3500
    skey, w = _sorted_keys(n, nf, nvalid, seed=11)
    plan = fine_pallas.make_plan(skey, w, nf ** 3, interpret=True)
    rho = fine_pallas.deposit_from_plan(plan, (nf, nf, nf))
    np.testing.assert_array_equal(
        np.asarray(rho), np.asarray(_xla_deposit(skey, w, (nf, nf, nf))))
    rng = np.random.default_rng(12)
    field = jnp.asarray(rng.normal(size=(3, nf, nf, nf)).astype(np.float32))
    out = fine_pallas.gather_from_plan(plan, field)
    ref = field.reshape(3, -1)[:, np.minimum(np.asarray(skey), nf ** 3 - 1)]
    ref = np.where(np.asarray(skey)[None, :] < nf ** 3, np.asarray(ref), 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_jit_and_grad_free_shapes():
    """The whole chain must be jittable with static shapes."""
    nf, n, nvalid = 16, 4096, 3000
    skey, w = _sorted_keys(n, nf, nvalid, seed=13)

    @jax.jit
    def f(k, ww):
        return fine_pallas.ngp_deposit_ranked(k, ww, (nf, nf, nf),
                                              interpret=True)
    out = f(skey, w)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(_xla_deposit(skey, w, (nf, nf, nf))))


def test_sweep_equality_fine_pallas():
    """Fused sweep with the ranked fine kernels == the scatter/gather
    sweep, bit-for-bit (power-of-two masses make the deposit exact and
    the gather is exact selection)."""
    import dataclasses
    from cubep3m_tpu import small_config
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core.driver import Simulation

    cfg0 = small_config(z_i=50.0, verbosity=0)
    out = {}
    for flag in (False, True):
        cfg = dataclasses.replace(cfg0, fine_pallas=flag)
        sim = Simulation(cfg)
        st = state_mod.random_ic(cfg, seed=5)
        st = sim.run(st, max_steps=3, use_chunks=False)
        out[flag] = st
    np.testing.assert_array_equal(np.asarray(out[True].x),
                                  np.asarray(out[False].x))
    np.testing.assert_array_equal(np.asarray(out[True].v),
                                  np.asarray(out[False].v))


def test_auto_enabled_precedence(tmp_path, monkeypatch):
    vfile = tmp_path / "verdict.json"
    monkeypatch.setenv("CUBEP3M_FINE_PROBE_FILE", str(vfile))
    monkeypatch.delenv("CUBEP3M_FINE_PALLAS", raising=False)
    # no verdict: off by default (production deposit path)
    assert fine_pallas.auto_enabled("tpu") is False
    fine_pallas.record_probe_verdict("tpu", ok=True, ms_deposit=50.0)
    assert fine_pallas.auto_enabled("tpu") is True
    assert fine_pallas.auto_enabled("cpu") is False   # other backend
    fine_pallas.record_probe_verdict("tpu", ok=False, error="mosaic")
    assert fine_pallas.auto_enabled("tpu") is False
    monkeypatch.setenv("CUBEP3M_FINE_PALLAS", "1")
    assert fine_pallas.auto_enabled("tpu") is True    # env wins
    monkeypatch.setenv("CUBEP3M_FINE_PALLAS", "0")
    fine_pallas.record_probe_verdict("tpu", ok=True)
    assert fine_pallas.auto_enabled("tpu") is False


def test_staged_sweep_equality_fine_pallas():
    """Staged sweep (separate B1/B3 plan builds) with the ranked fine
    kernels == without, bit-for-bit."""
    import dataclasses
    from cubep3m_tpu import small_config
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core.driver import Simulation

    cfg0 = small_config(z_i=50.0, verbosity=0, staged_sweep=True)
    out = {}
    for flag in (False, True):
        cfg = dataclasses.replace(cfg0, fine_pallas=flag)
        sim = Simulation(cfg)
        st = state_mod.random_ic(cfg, seed=6)
        st = sim.run(st, max_steps=2, use_chunks=False)
        out[flag] = st
    np.testing.assert_array_equal(np.asarray(out[True].x),
                                  np.asarray(out[False].x))
    np.testing.assert_array_equal(np.asarray(out[True].v),
                                  np.asarray(out[False].v))


def test_multidevice_sweep_fine_pallas():
    """8-device mesh: the per-device kernels see local shapes; the run
    must match the single-flag-off run exactly."""
    import dataclasses
    from cubep3m_tpu import small_config
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core.driver import Simulation
    from cubep3m_tpu.core import step as step_mod

    rng = np.random.default_rng(9)
    out = {}
    for flag in (False, True):
        cfg = small_config(nodes_dim=2, z_i=50.0, verbosity=0,
                           fine_pallas=flag)
        sim = Simulation(cfg)
        nf = cfg.nf_physical_dim
        x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
        rng = np.random.default_rng(9)        # same draw both flags
        x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
        st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
        st = step_mod.shard_state(st, sim.mesh)
        st = sim.run(st, max_steps=2, use_chunks=False)
        out[flag] = state_mod.gather_global(cfg, st)
    xa, va = out[True][0], out[True][1]
    xb, vb = out[False][0], out[False][1]
    order_a = np.lexsort(np.asarray(xa).T)
    order_b = np.lexsort(np.asarray(xb).T)
    np.testing.assert_array_equal(np.asarray(xa)[order_a],
                                  np.asarray(xb)[order_b])
    np.testing.assert_array_equal(np.asarray(va)[order_a],
                                  np.asarray(vb)[order_b])
