"""Kill checkpoints, restart-resume equivalence, step logs."""
import json
import os

import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core.driver import Simulation
from cubep3m_tpu.core.timestep import OutputSchedule
from cubep3m_tpu.io import checkpoint as ck


def test_kill_checkpoint_fires(tmp_path):
    """Wall-clock kill checkpoint (cubepm_kill.f90:231-258 role)."""
    cfg = small_config(z_i=50.0)
    sim = Simulation(cfg, kill_time_s=0.0)  # fire immediately
    sim.attach_outputs(str(tmp_path), reference_format=True)
    st = state_mod.random_ic(cfg, seed=1)
    st = sim.run(st, max_steps=5, use_chunks=False)
    assert os.path.exists(tmp_path / "ckpt_kill.npz")
    # reference kill format too
    files = [f for f in os.listdir(tmp_path) if "xvres" in f]
    assert files, "no xvres kill checkpoint written"
    # resume from it
    st2, cur = ck.load_native(str(tmp_path / "ckpt_kill.npz"), cfg)
    assert int(st2.np_local[0]) == int(st.np_local[0])


def test_restart_resume_matches_continuous(tmp_path):
    """Stop at a checkpoint, restart, continue: identical to an
    uninterrupted run (bit-faithful resume contract, checkpoint.f90)."""
    cfg = small_config(z_i=50.0, shake=True)
    sched = OutputSchedule.from_redshifts(checkpoints=[45.0, 40.0])

    # continuous run to the second checkpoint
    sim_a = Simulation(cfg, schedule=sched)
    states = {}
    sim_a.on_checkpoint.append(
        lambda s, st, dec: states.setdefault(len(states), st))
    st = state_mod.random_ic(cfg, seed=3)
    sim_a.run(st, max_steps=100, use_chunks=False)
    assert len(states) == 2

    # interrupted run: save at first checkpoint, reload, continue
    sim_b = Simulation(cfg, schedule=sched)
    sim_b.attach_outputs(str(tmp_path), halofinds=False, projections=False)
    st = state_mod.random_ic(cfg, seed=3)
    st_b = sim_b.run(st, max_steps=100, use_chunks=False)
    # run ended at final checkpoint; reload the first and continue fresh
    st_c, cur = ck.load_native(str(tmp_path / "ckpt_45.000.npz"), cfg)
    sim_c = Simulation(cfg, schedule=sched)
    sim_c.cursors = cur
    finals = {}
    sim_c.on_checkpoint.append(
        lambda s, st2, dec: finals.setdefault(0, st2))
    sim_c.run(st_c, max_steps=100, use_chunks=False)
    assert finals, "resumed run never hit the second checkpoint"
    xa = np.asarray(states[1].x)
    xb = np.asarray(finals[0].x)
    na = int(states[1].np_local[0])
    pa = np.asarray(states[1].pid)[:na]
    pb = np.asarray(finals[0].pid)[:na]
    oa, ob = np.argsort(pa), np.argsort(pb)
    np.testing.assert_allclose(xa[:na][oa], xb[:na][ob], atol=1e-4)


def test_step_log_written(tmp_path):
    cfg = small_config(z_i=50.0)
    sim = Simulation(cfg)
    st = state_mod.random_ic(cfg, seed=2)
    for _ in range(3):
        st, _ = sim.step(st)
    path = str(tmp_path / "log.jsonl")
    sim.write_log(path)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert lines[0]["nts"] == 1 and "limits" in lines[0]


def test_clamp_counter_surfaces_multihop_particles():
    """A particle moving more than one node width in a step is clamped AND
    counted (core/step.py clamp_count) — never silently pinned.  Applies
    to the EXCHANGE path only: the single-node wrap fast path handles any
    displacement exactly (test_single_node_wrap), so force the full
    machinery here."""
    import jax.numpy as jnp
    from cubep3m_tpu.core import step as step_mod

    cfg = small_config(pp=False, cosmo_expansion=False, shake=False,
                       single_node_wrap=False)
    sim = Simulation(cfg)
    nf = cfg.nf_physical_node_dim
    x = np.array([[nf / 2.0] * 3, [nf / 4.0] * 3], np.float32)
    v = np.zeros_like(x)
    v[0, 0] = 5.0 * nf  # drift = v*(dt+dt_old)/2 = 2.5 node widths at dt=1
    st = state_mod.particles_ic(cfg, x, v)
    st = step_mod.shard_state(st, sim.mesh)
    st2 = sim.sweep(st, sim.kern_f, sim.kern_c, jnp.float32(1.0),
                    jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
                    jnp.float32(1.0))
    assert int(st2.clamp_count) == 1
    # and a benign step counts zero
    st3 = sim.sweep(st, sim.kern_f, sim.kern_c, jnp.float32(1.0),
                    jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1.0),
                    jnp.float32(1.0))
    assert int(st3.clamp_count) == 0


def test_coarse_ps_recorded_each_step():
    """cfg.coarse_ps triggers the per-step coarse P(k) diagnostic
    (coarse_power.f90 role)."""
    cfg = small_config(z_i=50.0, coarse_ps=True)
    sim = Simulation(cfg)
    st = state_mod.random_ic(cfg, seed=2)
    for _ in range(2):
        st, _ = sim.step(st)
    assert len(sim.coarse_ps_log) == 2
    nts, a, k, pk = sim.coarse_ps_log[0]
    assert nts == 1 and k.size > 0 and np.all(np.isfinite(pk))


def test_async_checkpoints_match_sync(tmp_path):
    """attach_outputs(async_checkpoints=True) produces byte-identical
    checkpoints to the synchronous path (the sweep keeps running while the
    previous snapshot drains)."""
    cfg = small_config(z_i=50.0, shake=True)
    sched = OutputSchedule.from_redshifts(checkpoints=[45.0, 40.0])

    def run(sub, async_ck):
        sim = Simulation(cfg, schedule=sched)
        sim.attach_outputs(str(tmp_path / sub), halofinds=False,
                           projections=False, async_checkpoints=async_ck)
        st = state_mod.random_ic(cfg, seed=3)
        sim.run(st, max_steps=100, use_chunks=False)
        sim.finish()

    run("sync", False)
    run("async", True)
    for z in ("45.000", "40.000"):
        a = np.load(str(tmp_path / "sync" / f"ckpt_{z}.npz"))
        b = np.load(str(tmp_path / "async" / f"ckpt_{z}.npz"))
        assert set(a.files) == set(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k])


def test_async_writer_surfaces_errors():
    from cubep3m_tpu.io.checkpoint import AsyncWriter

    def boom():
        raise RuntimeError("disk full")

    w = AsyncWriter()
    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w.wait()
    w.wait()  # error consumed; writer reusable


def test_coarse_ps_multidevice_device_resident():
    """Multi-device coarse_ps uses the device-side deposit path (no
    particle gather) and matches the single-device spectrum."""
    from cubep3m_tpu.core import step as step_mod

    def run(nd, tiles):
        cfg = small_config(nodes_dim=nd, tiles_node_dim=tiles, z_i=50.0,
                           coarse_ps=True, shake=False)
        nf = cfg.nf_physical_dim
        x = np.random.default_rng(7).uniform(
            0, nf, (2000, 3)).astype(np.float32)
        v = np.zeros_like(x)
        sim = Simulation(cfg)
        st = state_mod.distribute_global(cfg, x, v)
        st = step_mod.shard_state(st, sim.mesh)
        st, _ = sim.step(st)
        return sim.coarse_ps_log[0]

    _, _, k1, pk1 = run(1, 4)
    _, _, k8, pk8 = run(2, 2)
    np.testing.assert_allclose(k8, k1, rtol=1e-5)
    # same realization, same deposit -> same spectrum to fp tolerance
    np.testing.assert_allclose(pk8, pk1, rtol=2e-3, atol=1e-10)


def test_schedule_from_reference_input_dir(tmp_path):
    """OutputSchedule reads the reference's input/ list files (one
    redshift per line, variable_initialization.f90:69-211)."""
    (tmp_path / "checkpoints").write_text("12.0\n3.0\n0.0\n")
    (tmp_path / "halofinds").write_text("3.0\n")
    s = OutputSchedule.from_input_dir(str(tmp_path))
    np.testing.assert_allclose(s.checkpoints,
                               sorted([1/13.0, 1/4.0, 1.0]))
    np.testing.assert_allclose(s.halofinds, [1/4.0])
    assert s.projections == []


def test_subulp_wrap_not_counted_as_clamp():
    """A sub-ulp negative coordinate wraps to exactly nf in fp32 after the
    exchange's +nf shift (the shift is inexact on the negative side) —
    that representation artifact must be CLIPPED but NOT counted as a
    multi-hop clamp (it produced false WARNING lines every few dozen
    sweeps of the 64^3 validation)."""
    import jax.numpy as jnp
    from cubep3m_tpu.parallel import exchange as ex_mod

    cfg = small_config(pp=False, single_node_wrap=False)
    nf = cfg.nf_physical_node_dim
    tiny = np.float32(-1e-8)
    assert np.float32(tiny + nf) == np.float32(nf)  # the artifact exists

    x = np.full((4, 3), nf / 2.0, np.float32)
    x[1] = [tiny, nf / 2.0, nf / 2.0]      # sub-ulp: artifact, no clamp
    x[2] = [-1.5 * nf, nf / 2.0, nf / 2.0]  # genuine multi-hop: clamp
    valid = np.array([True, True, True, False])
    pid = np.arange(1, 5, dtype=np.int32)

    ex = ex_mod.exchange_particles(
        jnp.asarray(x), jnp.zeros((4, 3), jnp.float32), jnp.asarray(pid),
        jnp.asarray(valid), nf, max_buf=8, compact=False)
    xr = np.asarray(ex.x)[np.asarray(ex.valid)]
    # single-device wrap: all 3 remain valid; the sub-ulp one sits at
    # exactly nf (clipped by the caller), the multi-hop one is off by
    # half a node width
    assert xr.shape[0] == 3
    # only the genuine multi-hop mover is left out of range (at -nf/2,
    # after its one-hop +nf wrap); the sub-ulp one sits at exactly nf
    assert np.sum(np.any((xr < 0) | (xr > nf), axis=-1)) == 1
    assert np.sum(np.any(xr == nf, axis=-1)) == 1

    res = ex_mod.exchange_cell_sorted(
        jnp.asarray(x), jnp.zeros((4, 3), jnp.float32),
        jnp.asarray(pid), jnp.asarray(valid), nf, max_buf=8)
    assert int(res.clamp_count) == 1      # the genuine multi-hop only
    assert int(res.n_valid) == 3


def test_resume_cursors_f32_landing_eps():
    """A resumed f32 scale factor sits a few ulp BELOW the f64 schedule
    entry it landed on (the driver clamps dt to hit the trigger, then
    stores a in f32).  for_resume must count that entry as done or the
    resumed run re-fires the trigger it resumed from (the r4 256^3 leg
    re-wrote its 470 MB z=10 checkpoint)."""
    from cubep3m_tpu.core.timestep import Cursors

    sched = OutputSchedule.from_redshifts(
        checkpoints=[10.0, 5.0, 3.0, 2.0, 1.0], halofinds=[1.0])
    # the actual landed value from the r4 256^3 run's z=10 checkpoint:
    # the on-device f32 dt clamp stops a couple of ulp short
    a_landed = 0.09090907871723175
    assert a_landed < 1.0 / 11.0
    cur = Cursors.for_resume(sched, a_landed)
    assert cur.checkpoint == 1        # z=10 done, z=5 pending
    assert cur.halofind == 0
    # mid-interval resume (a kill checkpoint) counts only passed entries
    cur2 = Cursors.for_resume(sched, 0.12)
    assert cur2.checkpoint == 1
    cur3 = Cursors.for_resume(sched, float(np.float32(0.5)))
    assert cur3.checkpoint == 5 and cur3.halofind == 1
