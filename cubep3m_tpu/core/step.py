"""The fused PM sweep: drift + two-level mesh forces + pp + kicks + limiters.

Functional re-design of the reference's `particle_mesh` driver
(`source_threads/particle_mesh_threaded.f90`) and `coarse_mesh.f90`: one pure
`state -> state` function, jitted once per config.  Differences from the
reference are architectural, not numerical (see DESIGN.md):

* tile loop + linked lists -> cell-sorted particle arrays + one padded FFT;
* particle ghost passes -> periodic wrap / grid halo exchange;
* per-thread scratch -> XLA-managed temporaries.

Sweep order (reference `cubepm.f90:103-236` inner step):
  drift (dt+dt_old)/2  ->  fine NGP mass -> fine FFT force -> NGP kick
  -> pp kicks -> coarse CIC mass -> coarse FFT force -> CIC kick
  -> dt limiters for the next sweep.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig, G
from ..state import SimState
from ..ops import binning, deposit, fftconv, pp


def fold_pads(grid: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Fold `pad` ghost layers back into the periodic interior (deposit).

    Inverse of `jnp.pad(mode='wrap')`: ghost-cell mass deposited by particles
    near the boundary belongs to the opposite interior edge.
    """
    if pad == 0:
        return grid
    for ax in range(grid.ndim):
        n = grid.shape[ax] - 2 * pad

        def sl(a, b):
            idx = [slice(None)] * grid.ndim
            idx[ax] = slice(a, b)
            return tuple(idx)

        # leading ghosts -> far interior; trailing ghosts -> near interior
        grid = grid.at[sl(n, n + pad)].add(grid[sl(0, pad)])
        grid = grid.at[sl(pad, 2 * pad)].add(grid[sl(n + pad, n + 2 * pad)])
        grid = grid[sl(pad, n + pad)]
    return grid


def make_sweep(cfg: SimConfig, pp_band: int = 32):
    """Build the jitted single-device sweep function.

    Returns sweep(state, kern_f_im, kern_c_im, a_mid, dt, a_new, tau_new,
    t_new) -> state.  All config-derived sizes are baked in as static.
    """
    cfg.validate()
    if not cfg.ngp:
        raise NotImplementedError("CIC fine deposit path not yet implemented")
    nf = cfg.nf_physical_node_dim
    nf_buf = cfg.nf_buf
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    mass_p = cfg.mass_p
    ncells_fine = nf ** 3

    def sweep(state: SimState, kern_f_im, kern_c_im,
              a_mid, dt, a_new, tau_new, t_new) -> SimState:
        a_mid = jnp.asarray(a_mid, jnp.float32)
        dt = jnp.asarray(dt, jnp.float32)
        kick = a_mid * G * dt
        n_slots = state.x.shape[0]
        valid = jnp.arange(n_slots) < state.np_local

        # ---- optional mesh shake (DISP_MESH, update_position.f90:25-63) ----
        rng = state.rng
        if cfg.shake:
            rng, sub = jax.random.split(rng)
            offset = ((jax.random.uniform(sub, (3,)) - 0.5)
                      * (4.0 * ms) - state.shake_offset)
            shake_offset = state.shake_offset + offset
        else:
            offset = jnp.zeros(3, jnp.float32)
            shake_offset = state.shake_offset

        # ---- drift: x += v*(dt+dt_old)/2 (update_position.f90:69-76) ----
        x = state.x + state.v * (0.5 * (dt + state.dt_old)) + offset
        # periodic wrap over the node volume (single-device ownership)
        x = jnp.mod(x, float(nf))
        x = jnp.where(valid[:, None], x, 0.0)

        # ---- sort by fine cell (replaces link_list.f90) ----
        sp = binning.sort_by_cell(x, valid, nf)
        x = x[sp.order]
        v = state.v[sp.order]
        pid = state.pid[sp.order]
        valid = sp.cell < ncells_fine

        w = jnp.where(valid, jnp.float32(mass_p), 0.0)

        # ---- fine level (NGP, the reference's default build) ----
        rho = deposit.ngp_deposit(x, w, (nf, nf, nf), sorted_cells=True)
        rho_halo = jnp.pad(rho, nf_buf, mode="wrap")
        f_fine = fftconv.fine_force(rho_halo, kern_f_im, nf_buf, nf)
        fmax2_f = jnp.max(jnp.sum(f_fine * f_fine, axis=0))
        fp = deposit.ngp_gather(f_fine, x)
        v = v + jnp.where(valid[:, None], fp * kick, 0.0)

        # dt_f limiter (particle_mesh_threaded.f90:641-656)
        fmax_f = jnp.sqrt(fmax2_f)
        dt_f_acc = 1.0 / jnp.sqrt(jnp.maximum(1e-4, fmax_f) * a_mid * G)

        # ---- pp level ----
        pp_overflow = jnp.asarray(0, jnp.int32)
        dt_pp_acc = jnp.asarray(1000.0, jnp.float32)
        dt_pp_ext_acc = jnp.asarray(1000.0, jnp.float32)
        bucket_overflow = jnp.asarray(0, jnp.int32)
        if cfg.pp:
            res = pp.ppint_band_force(x, sp.cell, sp.rank, ncells_fine,
                                      pp_band, mass_p, cfg.rsoft, cfg.pp_bias)
            v = v + jnp.where(valid[:, None], res.force * kick, 0.0)
            dt_pp_acc = (jnp.sqrt(cfg.dt_pp_scale * cfg.rsoft)
                         / jnp.maximum(jnp.sqrt(res.fmax * a_mid * G), 1e-3))
            pp_overflow = res.overflow
        if cfg.pp_ext:
            buckets = pp.bucket_by_coarse_cell(x, valid, nc, ms,
                                               cfg.pp_coarse_capacity)
            res = pp.pp_ext_force(x, buckets, nc, ms, cfg.pp_range,
                                  cfg.nf_cutoff, mass_p, cfg.rsoft,
                                  cfg.pp_bias)
            v = v + jnp.where(valid[:, None], res.force * kick, 0.0)
            dt_pp_ext_acc = (jnp.sqrt(cfg.dt_pp_ext_scale * cfg.rsoft)
                             / jnp.maximum(jnp.sqrt(res.fmax * a_mid * G),
                                           1e-3))
            bucket_overflow = res.overflow

        # ---- coarse level (coarse_mesh.f90) ----
        ncp = nc + 2
        rho_c_pad = deposit.cic_deposit(x, w, (ncp, ncp, ncp), scale=ms,
                                        offset=-0.5, pad=1)
        rho_c = fold_pads(rho_c_pad, 1)
        f_c = fftconv.coarse_force(rho_c, kern_c_im)
        fmax_c = jnp.sqrt(jnp.max(jnp.sum(f_c * f_c, axis=0)))
        dt_c_acc = jnp.sqrt(ms / (fmax_c * a_mid * G))
        f_c_pad = jnp.pad(f_c, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap")
        fcp = deposit.cic_gather(f_c_pad, x, scale=ms, offset=-0.5, pad=1)
        v = v + jnp.where(valid[:, None], fcp * kick, 0.0)

        return SimState(
            x=x, v=v, pid=pid, np_local=state.np_local,
            a=jnp.asarray(a_new, jnp.float32),
            tau=jnp.asarray(tau_new, jnp.float32),
            t=jnp.asarray(t_new, jnp.float32),
            dt_old=dt, nts=state.nts + 1,
            dt_f_acc=dt_f_acc.astype(jnp.float32),
            dt_pp_acc=dt_pp_acc.astype(jnp.float32),
            dt_pp_ext_acc=dt_pp_ext_acc.astype(jnp.float32),
            dt_c_acc=dt_c_acc.astype(jnp.float32),
            shake_offset=shake_offset,
            pp_overflow=pp_overflow, bucket_overflow=bucket_overflow,
            rng=rng,
        )

    return jax.jit(sweep)


def compute_forces(cfg: SimConfig, state: SimState, kern_f_im, kern_c_im,
                   pp_band: int = 32) -> jnp.ndarray:
    """Total force on every particle WITHOUT kicking (for test harnesses:
    report_pair.f90 / report_force.f90 analogs).

    Returns (max_np, 3) in the particle order of `state` (not re-sorted).
    """
    nf = cfg.nf_physical_node_dim
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    mass_p = cfg.mass_p
    valid = state.valid
    x = state.x
    w = jnp.where(valid, jnp.float32(mass_p), 0.0)

    rho = deposit.ngp_deposit(x, w, (nf, nf, nf))
    rho_halo = jnp.pad(rho, cfg.nf_buf, mode="wrap")
    f_fine = fftconv.fine_force(rho_halo, kern_f_im, cfg.nf_buf, nf)
    force = deposit.ngp_gather(f_fine, x)

    if cfg.pp:
        sp = binning.sort_by_cell(x, valid, nf)
        inv = jnp.argsort(sp.order)
        res = pp.ppint_band_force(x[sp.order], sp.cell, sp.rank, nf ** 3,
                                  pp_band, mass_p, cfg.rsoft, cfg.pp_bias)
        force = force + res.force[inv]
    if cfg.pp_ext:
        buckets = pp.bucket_by_coarse_cell(x, valid, nc, ms,
                                           cfg.pp_coarse_capacity)
        res = pp.pp_ext_force(x, buckets, nc, ms, cfg.pp_range,
                              cfg.nf_cutoff, mass_p, cfg.rsoft, cfg.pp_bias)
        force = force + res.force

    ncp = nc + 2
    rho_c = fold_pads(deposit.cic_deposit(x, w, (ncp, ncp, ncp), scale=ms,
                                          offset=-0.5, pad=1), 1)
    f_c = fftconv.coarse_force(rho_c, kern_c_im)
    f_c_pad = jnp.pad(f_c, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap")
    force = force + deposit.cic_gather(f_c_pad, x, scale=ms, offset=-0.5,
                                       pad=1)
    return jnp.where(valid[:, None], force, 0.0)
