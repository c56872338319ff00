"""Adaptive pp_dense_band sizing (cfg.pp_autosize).

The reference sizes its per-cell pair list statically and aborts on
overflow (particle_mesh_threaded.f90:280-284); our driver instead probes
the max same-fine-cell occupancy every few sweeps and preemptively
recompiles the sweep with a larger dense-tail window, so no step ever
drops pairs.
"""
import jax.numpy as jnp
import numpy as np

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import RebuildRequired, Simulation
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def _state_with_dense_cell(cfg, n_dense, seed=0):
    """Random particles plus `n_dense` crammed into one fine cell."""
    rng = np.random.default_rng(seed)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    x[:n_dense] = (np.array([3.0, 4.0, 5.0])
                   + rng.uniform(0.05, 0.95, (n_dense, 3)))
    v = np.zeros_like(x)
    return state_mod.particles_ic(cfg, x, v)


def test_occupancy_probe_bounds():
    cfg = small_config()
    mesh = make_sim_mesh(1)
    st = _state_with_dense_cell(cfg, n_dense=9)
    probe = step_mod.make_occupancy_probe(cfg, mesh, band=4)
    occ, n_dense = (int(v) for v in probe(st.x, st.np_local))
    # the probe returns a shake-invariant UPPER BOUND: at least the 9
    # crammed particles, at most those plus the background that shares
    # their 2^3-cell block (~0.125/cell mean density)
    assert 9 <= occ <= 9 + 16
    # every crammed particle must be counted dense; background blocks
    # stay below band+1=5 w.h.p. but the bound may sweep in a few
    assert n_dense >= 9


def test_occupancy_probe_shake_invariant():
    """A clump STRADDLING a cell corner: the per-cell occupancy at the
    current alignment is ~1/8 of the clump, but one future shake
    alignment puts the whole clump in a single cell — the bound must
    report the full clump size (the round-3 64^3 validation dropped
    pairs for ~80 sweeps because the old point-sampled probe kept
    sampling lucky alignments)."""
    cfg = small_config()
    mesh = make_sim_mesh(1)
    rng = np.random.default_rng(3)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    x[:16] = (np.array([4.0, 4.0, 4.0])
              + rng.uniform(-0.05, 0.05, (16, 3))).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    probe = step_mod.make_occupancy_probe(cfg, mesh, band=4)
    occ, n_dense = (int(v) for v in probe(st.x, st.np_local))
    assert occ >= 16
    assert n_dense >= 16


def test_occupancy_probe_multidevice():
    cfg = small_config(nodes_dim=2)
    mesh = make_sim_mesh(2)
    rng = np.random.default_rng(1)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    x[:7] = (np.array([3.0, 4.0, 5.0])
             + rng.uniform(0.05, 0.95, (7, 3)))  # 7 in one device-0 cell
    st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, mesh)
    probe = step_mod.make_occupancy_probe(cfg, mesh)
    occ, _ = probe(st.x, st.np_local)
    assert 7 <= int(occ) <= 7 + 16


def test_driver_grows_dense_band():
    """A run that starts with a too-small dense band must grow it before
    pairs are dropped."""
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                      pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=20)  # occ 20 > 0.7*(8+1)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band > 8, "autosize never grew the band"
    assert sim.cfg.pp_dense_band >= 20 / 0.7 - 1
    # the grown band covers the dense cell: the NEXT sweep reports no
    # genuinely dropped pairs
    st, _ = sim.step(st)
    assert int(st.pp_overflow) == 0


def test_driver_grows_dense_cap():
    """The dense-tail COMPACTION BUFFER must also grow: its capacity is
    per-device (max_np * pp_dense_cap_frac), and a device holding a big
    halo can exhaust it while occupancy still fits the band — exactly the
    failure seen on the 8-device 64^3 full-history run."""
    cfg = small_config(z_i=50.0, pp_dense_band=64, pp_autosize=True,
                      pp_autosize_every=1, pp_dense_cap_frac=0.01,
                      verbosity=0)
    # cap = int(8192*0.01) = 81; cram 60 particles into ONE cell so the
    # dense population (60) exceeds the 0.7*81 headroom line
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=60)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_cap_frac > 0.01, "autosize never grew the cap"
    st, _ = sim.step(st)
    assert int(st.pp_overflow) == 0


def test_autosize_noop_when_sparse():
    cfg = small_config(z_i=50.0, pp_dense_band=64, pp_autosize=True,
                      pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    st = state_mod.random_ic(cfg, seed=2)
    sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band == 64


def test_reactive_backstop_on_overflow():
    """With the scheduled probe effectively disabled, an actual overflow
    sweep must still trigger an immediate (reactive) resize."""
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                      pp_autosize_every=10 ** 6, verbosity=0)
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=40)  # occ 40 >> band 8
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band > 8, "reactive autosize never fired"
    assert any(l.pp_overflow for l in sim.logs[:1]), \
        "test setup: the first sweep should have overflowed"
    st, _ = sim.step(st)
    assert int(st.pp_overflow) == 0


def test_probe_straddling_device_face():
    """A clump crammed against a device face: its 2-block straddles two
    devices, so the bound needs the halo fold to see the full count."""
    cfg = small_config(nodes_dim=2)
    mesh = make_sim_mesh(2)
    rng = np.random.default_rng(4)
    nf = cfg.nf_physical_dim
    half = nf // 2
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    # 12 particles within +-0.05 of the x-face between devices
    x[:12] = (np.array([float(half), 5.5, 5.5])
              + rng.uniform(-0.05, 0.05, (12, 3))).astype(np.float32)
    st = state_mod.distribute_global(cfg, x, np.zeros_like(x))
    st = step_mod.shard_state(st, mesh)
    probe = step_mod.make_occupancy_probe(cfg, mesh, band=4)
    occ, n_dense = (int(v) for v in probe(st.x, st.np_local))
    assert occ >= 12
    assert n_dense >= 6  # each side holds its own fraction locally


def test_reactive_bucket_growth_pp_ext():
    """PP_EXT coarse-cell buckets: an observed bucket_overflow doubles
    pp_coarse_capacity and rebuilds (the reference aborts when a
    coarse-cell list overflows; our bucket build drops + counts)."""
    cfg = small_config(z_i=50.0, pp_ext=True, pp_ext_impl="bucket",
                      pp_coarse_capacity=16,
                      pp_autosize=True, pp_autosize_every=10 ** 6,
                      verbosity=0)
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=40)  # one coarse cell > 16
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_coarse_capacity > 16, "bucket autosize never fired"
    assert any(l.bucket_overflow for l in sim.logs[:1])
    st, _ = sim.step(st)
    assert int(st.bucket_overflow) == 0


def test_reactive_lattice_growth_pp_ext():
    """Lattice PP_EXT: an observed bucket_overflow (ghost drops or dense
    residuals) doubles pp_ext_band + pp_ext_ghost_cap and rebuilds; the
    rebuilt sweep absorbs the same state with zero overflow."""
    cfg = small_config(z_i=50.0, pp_ext=True, pp_ext_band=8,
                      pp_dense_band=8,  # dense tail can't absorb either
                      pp_autosize=True, pp_autosize_every=10 ** 6,
                      verbosity=0)
    assert cfg.pp_ext_impl == "lattice"
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=40)  # one fine cell > band
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_ext_band_eff > 8, "lattice autosize never fired"
    assert sim.cfg.pp_ext_ghost_cap > 0
    assert any(l.bucket_overflow for l in sim.logs[:1])
    st, _ = sim.step(st)
    assert int(st.bucket_overflow) == 0


def test_presize_from_state_grows_before_first_sweep():
    """Resume path: a loaded late-time state that already exceeds the
    dense-tail sizing must grow the band at t=0, not via a mid-run
    rebuild (the r4c 256^3 leg's TPU worker died in exactly that
    mid-run recompile, bench_logs/campaign_r4c.log)."""
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                       verbosity=0)
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=20)  # occ 20 > 0.7*(8+1)
    sim.presize_from_state(st)
    assert sim.cfg.pp_dense_band > 8, "presize never grew the band"
    # and the pre-sized run then steps without dropping pairs
    st = sim.run(st, max_steps=1, use_chunks=False)
    assert int(st.pp_overflow) == 0


def test_presize_noop_when_sparse():
    cfg = small_config(z_i=50.0, pp_dense_band=64, pp_autosize=True,
                       verbosity=0)
    sim = Simulation(cfg)
    rng = np.random.default_rng(5)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    sim.presize_from_state(st)
    assert sim.cfg.pp_dense_band == 64


def _ext_observed_occ(cfg, x, n_valid, shake):
    """Max super-cell occupancy over the 8 lattice shifts at a given
    shake offset (what pp_ext_lattice_force_t actually bins)."""
    nf = cfg.nf_physical_node_dim
    s = 2 * cfg.pp_range
    h = cfg.pp_range
    xs = np.mod(np.asarray(x[:n_valid]) + np.asarray(shake)[None, :], nf)
    worst = 0
    for ox in (0.0, h):
        for oy in (0.0, h):
            for oz in (0.0, h):
                k = np.floor((xs + s - np.array([ox, oy, oz])) / s
                             ).astype(np.int64)
                ncs = (nf + 2 * s) // s + 1
                key = (k[:, 0] * ncs + k[:, 1]) * ncs + k[:, 2]
                _, cnt = np.unique(key, return_counts=True)
                worst = max(worst, int(cnt.max()))
    return worst


def test_pp_ext_probe_bounds_under_shake():
    """The ext probe's occupancy bound must dominate the OBSERVED max
    super-cell occupancy at every shake alignment (the lattice origin
    moves with the per-sweep shake; VERDICT r4 weak #2: the reactive
    path retained drops at each growth)."""
    cfg = small_config(pp_ext=True)
    mesh = make_sim_mesh(1)
    rng = np.random.default_rng(7)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    # clump straddling a super-cell corner (edge s=4): worst alignment
    # sees all 24 in one super cell
    x[:24] = (np.array([8.0, 8.0, 8.0])
              + rng.uniform(-0.4, 0.4, (24, 3))).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    probe = step_mod.make_pp_ext_probe(cfg, mesh)
    assert probe is not None
    occ, n_dense, skin = (int(v) for v in probe(st.x, st.np_local))
    # observed occupancy at 32 random shake alignments never exceeds it
    for seed in range(32):
        sh = np.random.default_rng(seed).uniform(
            -2 * cfg.mesh_scale, 2 * cfg.mesh_scale, 3)
        obs = _ext_observed_occ(cfg, x, n, sh)
        assert obs <= occ, (obs, occ, seed)
    assert occ >= 24
    # every clump particle is in a super cell denser than band+1
    assert n_dense >= 24


def test_pp_ext_probe_skin_bound():
    """The skin bound must dominate the per-face ghost population for
    any shake alignment in the probe period."""
    cfg = small_config(pp_ext=True)
    mesh = make_sim_mesh(1)
    rng = np.random.default_rng(8)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    probe = step_mod.make_pp_ext_probe(cfg, mesh)
    occ, n_dense, skin = (int(v) for v in probe(st.x, st.np_local))
    h = cfg.pp_range
    worst = 0
    for seed in range(32):
        sh = np.random.default_rng(100 + seed).uniform(
            -2 * cfg.mesh_scale, 2 * cfg.mesh_scale, 3)
        xs = np.mod(x + sh[None, :], nf)
        for ax in range(3):
            worst = max(worst, int(np.sum(xs[:, ax] < h)),
                        int(np.sum(xs[:, ax] >= nf - h)))
    assert skin >= worst


def test_driver_grows_ext_band_preemptively():
    """Lattice PP_EXT: the scheduled probe must grow pp_ext_band BEFORE
    any sweep drops pairs — zero bucket_overflow across the growth
    (VERDICT r4 'make PP_EXT sizing preemptive')."""
    # 12 particles spread over a 2-cell neighborhood: super-cell occ 12
    # stays under band+1=17 (no drops) but the probe's 2s-block bound
    # (>= 12 > 0.7*17) triggers growth
    cfg = small_config(z_i=50.0, pp_ext=True, pp_ext_band=16,
                       pp_dense_band=64, pp_autosize=True,
                       pp_autosize_every=1, verbosity=0)
    assert cfg.pp_ext_impl == "lattice"
    sim = Simulation(cfg)
    rng = np.random.default_rng(9)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    x[:12] = (np.array([9.0, 9.0, 9.0])
              + rng.uniform(-1.0, 1.0, (12, 3))).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    st = sim.run(st, max_steps=3, use_chunks=False)
    assert sim.cfg.pp_ext_band_eff > 16, "ext probe never grew the band"
    assert all(l.bucket_overflow == 0 for l in sim.logs), \
        "preemptive sizing must never let a sweep drop pairs"


def test_driver_grows_ext_ghost_cap_preemptively():
    """A face-hugging population must grow pp_ext_ghost_cap via the skin
    bound BEFORE the first sweep drops ghost copies (the presize path —
    the same t=0 growth a resumed leg gets)."""
    cfg = small_config(z_i=50.0, pp_ext=True, pp_ext_band=64,
                       pp_dense_band=128, pp_ext_ghost_cap=256,
                       pp_autosize=True, pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    rng = np.random.default_rng(10)
    nf = cfg.nf_physical_dim
    n = cfg.np_total
    # everything within 2 cells of the x=0 face: skin bound ~ n >> cap
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    x[:, 0] = rng.uniform(0, 2.0, n).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    sim.presize_from_state(st)
    assert sim.cfg.pp_ext_ghost_cap > 256, "skin bound never grew the cap"
    st = sim.run(st, max_steps=3, use_chunks=False)
    assert all(l.bucket_overflow == 0 for l in sim.logs)


def test_prerebuild_safety_checkpoint(tmp_path):
    """Any autosize sweep recompile must first checkpoint the state:
    three TPU worker crashes (campaign_r4c.log) happened exactly inside
    mid-run rebuilds, and the safety file makes them resumable."""
    from cubep3m_tpu.io import checkpoint as ck
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                       pp_autosize_every=1, verbosity=0)
    sim = Simulation(cfg)
    sim.attach_outputs(str(tmp_path), projections=False, halofinds=False)
    st = _state_with_dense_cell(cfg, n_dense=20)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert sim.cfg.pp_dense_band > 8
    path = tmp_path / "ckpt_prerebuild.npz"
    assert path.exists(), "no pre-rebuild safety checkpoint written"
    st2, cur = ck.load_native(str(path), sim.cfg)
    assert int(st2.np_local.sum()) == int(st.np_local.sum())


def test_rebuild_policy_exit_raises_resumable(tmp_path):
    """rebuild_policy="exit": a mid-run growth must checkpoint + raise
    RebuildRequired instead of recompiling in-process (in-process sweep
    recompiles crashed the tunneled TPU worker 5/5 times in round 4);
    the checkpoint must carry the GROWN sizing so a fresh process can
    resume at the right windows via io.checkpoint.stored_sizing."""
    import pytest
    from cubep3m_tpu.io import checkpoint as ck
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                       pp_autosize_every=1, verbosity=0,
                       rebuild_policy="exit")
    sim = Simulation(cfg)
    sim.attach_outputs(str(tmp_path), projections=False, halofinds=False)
    st = _state_with_dense_cell(cfg, n_dense=20)
    with pytest.raises(RebuildRequired):
        sim.run(st, max_steps=3, use_chunks=False)
    path = tmp_path / "ckpt_prerebuild.npz"
    assert path.exists()
    sizing = ck.stored_sizing(str(path))
    assert sizing["pp_dense_band"] > 8, "checkpoint lacks the grown band"
    # the relaunch contract: fresh Simulation at the stored sizing steps
    # the resumed state without dropping pairs or growing again
    cfg2 = small_config(z_i=50.0, pp_autosize=True, pp_autosize_every=1,
                        verbosity=0, rebuild_policy="exit",
                        pp_dense_band=sizing["pp_dense_band"],
                        pp_dense_cap_frac=sizing["pp_dense_cap_frac"])
    sim2 = Simulation(cfg2)
    st2, _ = ck.load_native(str(path), cfg2)
    st2 = sim2.run(st2, max_steps=2, use_chunks=False)
    assert int(st2.pp_overflow) == 0
    assert sim2.cfg.pp_dense_band == sizing["pp_dense_band"]


def test_rebuild_policy_exit_presize_inplace():
    """Pre-first-sweep growth (presize_from_state) must stay in-process
    even under rebuild_policy="exit": nothing is compiled yet, so the
    rebuild is free and raising would just burn a relaunch."""
    cfg = small_config(z_i=50.0, pp_dense_band=8, pp_autosize=True,
                       verbosity=0, rebuild_policy="exit")
    sim = Simulation(cfg)
    st = _state_with_dense_cell(cfg, n_dense=20)
    sim.presize_from_state(st)  # must not raise
    assert sim.cfg.pp_dense_band > 8


def test_presize_rightsizes_ext_dense_cap():
    """The ext tail buffer costs O(tail_band * cap) per shift whether or
    not the slots are used — presize must RIGHT-SIZE it to the measured
    bound (shrink allowed only at t=0, growth preemptive after)."""
    # band 256 >> the ~64 mean 2s-block occupancy of this toy box, so
    # the dense-population bound is ~0 and the probe should shrink the
    # buffer to its floor (or at least never grow it)
    cfg = small_config(z_i=50.0, pp_ext=True, pp_ext_band=256,
                       pp_autosize=True, verbosity=0)
    sim = Simulation(cfg)
    rng = np.random.default_rng(11)
    nf = cfg.nf_physical_dim
    x = rng.uniform(0, nf, (cfg.np_total, 3)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, np.zeros_like(x))
    shared = cfg.pp_ext_dense_cap_eff
    sim.presize_from_state(st)
    assert sim.cfg.pp_ext_dense_cap_eff <= max(shared, 4096)
    st = sim.run(st, max_steps=2, use_chunks=False)
    assert all(l.bucket_overflow == 0 for l in sim.logs)
