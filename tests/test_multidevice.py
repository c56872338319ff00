"""Multi-device consistency: an 8-device (2^3 mesh) run must reproduce the
single-device run on the same global ICs (SURVEY.md §7.5 acceptance test —
the reference's analog is `mpirun -np 8` vs single-rank equivalence)."""
import jax
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _global_ic(nf_global: int, n: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, nf_global, (n, 3)).astype(np.float32)
    v = (rng.normal(size=(n, 3)) * 0.1).astype(np.float32)
    return x, v


def _run(cfg, x, v, steps, dt=0.2):
    sim = Simulation(cfg)
    st = state_mod.distribute_global(cfg, x, v)
    st = step_mod.shard_state(st, sim.mesh)
    t = 0.0
    for _ in range(steps):
        t += dt
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, dt, 1.0, t, t)
    return state_mod.gather_global(cfg, st)


@requires_8
def test_eight_devices_match_single():
    # same global box: 64^3 fine cells; 1-device (4^3 tiles) vs 2^3 devices
    cfg1 = small_config(nodes_dim=1, tiles_node_dim=4,
                        cosmo_expansion=False, shake=False)
    cfg8 = small_config(nodes_dim=2, tiles_node_dim=2,
                        cosmo_expansion=False, shake=False)
    assert cfg1.nf_physical_dim == cfg8.nf_physical_dim == 64
    x, v = _global_ic(64, 2000)

    x1, v1, p1 = _run(cfg1, x, v, steps=3)
    x8, v8, p8 = _run(cfg8, x, v, steps=3)

    assert x1.shape == x8.shape
    o1 = np.argsort(p1)
    o8 = np.argsort(p8)
    # positions agree to fp32 FFT roundoff (different transform sizes)
    np.testing.assert_allclose(x1[o1], x8[o8], atol=5e-3)
    np.testing.assert_allclose(v1[o1], v8[o8], atol=5e-3)


@requires_8
def test_exchange_preserves_particles():
    """Ownership exchange: no particles lost/duplicated over many sweeps."""
    cfg8 = small_config(nodes_dim=2, tiles_node_dim=2,
                        cosmo_expansion=False, shake=True)
    x, v = _global_ic(64, 3000, seed=4)
    sim = Simulation(cfg8)
    st = state_mod.distribute_global(cfg8, x, v)
    st = step_mod.shard_state(st, sim.mesh)
    for i in range(5):
        st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.5, 1.0, 0.0, 0.0)
    assert int(np.asarray(st.np_local).sum()) == 3000
    assert int(st.pp_overflow) == 0
    xg, vg, pg = state_mod.gather_global(cfg8, st)
    assert np.unique(pg).size == 3000


@requires_8
def test_power_of_state_sharded_matches_single_device():
    """power_of_state on a sharded, shake-offset state must equal the
    single-device measurement of the same global snapshot (the final P(k)
    of validate_lcdm; a local-coordinate overlay would inflate it ~8x)."""
    import dataclasses
    import jax.numpy as jnp
    from cubep3m_tpu.analysis import power as pw

    cfg1 = small_config(nodes_dim=1, tiles_node_dim=4, shake=True)
    cfg8 = small_config(nodes_dim=2, tiles_node_dim=2, shake=True)
    x, v = _global_ic(64, 4000, seed=7)
    # clustered component so P(k) is far above shot noise
    x[:2000] = (x[:1000].repeat(2, axis=0)
                + np.random.default_rng(3).normal(
                    scale=1.5, size=(2000, 3)).astype(np.float32)) % 64

    st1 = state_mod.distribute_global(cfg1, x, v)
    ps1 = pw.power_of_state(cfg1, st1, ngrid=32)

    # shaken multi-device state: particles live at x+shake in local coords,
    # with the offset recorded — exactly what a mid-run snapshot holds
    shake = np.array([3.5, -2.25, 1.0], np.float32)
    st8 = state_mod.distribute_global(cfg8, (x + shake) % 64, v)
    st8 = dataclasses.replace(st8, shake_offset=jnp.asarray(shake))
    st8 = step_mod.shard_state(st8, Simulation(cfg8).mesh)
    ps8 = pw.power_of_state(cfg8, st8, ngrid=32)

    np.testing.assert_allclose(ps8.pk, ps1.pk, rtol=2e-3, atol=1e-2)
    np.testing.assert_array_equal(ps8.nmodes, ps1.nmodes)


@requires_8
def test_pencil_fft_matches_replicated_in_sweep():
    """The distributed pencil coarse FFT (p3dfft_coarse role) gives the
    same evolution as the replicated all_gather solve inside the full
    multi-device sweep."""
    x, v = _global_ic(64, 2000, seed=9)
    outs = {}
    for pencil in (False, True):
        cfg = small_config(nodes_dim=2, tiles_node_dim=2,
                           cosmo_expansion=False, shake=False,
                           coarse_pencil_fft=pencil)
        outs[pencil] = _run(cfg, x, v, steps=3)
    xr, vr, pr = outs[False]
    xp, vp, pp_ = outs[True]
    orr, op = np.argsort(pr), np.argsort(pp_)
    np.testing.assert_allclose(xr[orr], xp[op], atol=5e-3)
    np.testing.assert_allclose(vr[orr], vp[op], atol=5e-3)
