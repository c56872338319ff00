"""The fused PM sweep: drift + exchange + two-level mesh forces + pp + kicks.

Functional re-design of the reference's `particle_mesh` driver
(`source_threads/particle_mesh_threaded.f90`) and `coarse_mesh.f90`: one pure
`state -> state` function under `jit`, expressed as a `shard_map` over a 3-D
device mesh (`nodes_dim^3`, a 1^3 mesh degenerates to single-device with
periodic wrap).  Differences from the reference are architectural, not
numerical (see DESIGN.md):

* tile loop + linked lists -> cell-sorted particle arrays + one padded FFT;
* 24-cell-deep particle ghost passes -> grid halo collectives + thin
  ownership exchange (parallel/halo.py, parallel/exchange.py);
* FFTW-MPI slab transpose -> replicated coarse solve after all_gather
  (default; the coarse mesh is 64x smaller than fine) or a distributed
  all_to_all pencil FFT (cfg.coarse_pencil_fft);
* per-thread scratch -> XLA-managed temporaries.

Sweep order (reference `cubepm.f90:103-236` inner step):
  drift (dt+dt_old)/2 -> ownership exchange -> fine NGP mass -> density halo
  -> fine FFT force -> NGP kick -> pp kicks -> coarse CIC mass -> fold ->
  global coarse FFT force -> CIC kick -> dt limiters for the next sweep.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import SimConfig, G
from ..state import SimState
from ..ops import binning, deposit, dftmm, fftconv, pp, pp_lattice
from ..experiments import fine_pallas as fine_pallas_mod
from ..ops import gather_pallas as gather_pallas_mod
from ..parallel import halo as halo_mod
from ..parallel import exchange as exchange_mod
from ..parallel.mesh import AXES, make_sim_mesh


def face_buffer_size(cfg: SimConfig) -> int:
    """Exchange face-buffer capacity, sized by PHYSICS, not array capacity.

    The per-step shake delta is new_offset - old_offset with each offset in
    [-2*mesh_scale, 2*mesh_scale] (update_position.f90:57), so a particle can
    move up to 4*mesh_scale per axis per step, plus a drift margin; at most a
    ~(4*ms + margin)/nf-thick face layer leaves per face.  Scaled by
    density_buffer as a clustering floor (face slabs are not average-density
    at z~0).  A capacity-derived size (max_np//16) under-provisions when
    density_buffer is tight and silently drops particles.
    """
    nf = cfg.nf_physical_node_dim
    ms = cfg.mesh_scale
    frac = min(1.0, (4.0 * ms + 4.0) / nf) * max(1.0, cfg.density_buffer)
    return max(256, int(cfg.np_node_avg * min(1.0, frac)))


def fold_pads(grid: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Fold `pad` ghost layers back into the periodic interior (deposit);
    single-device counterpart of parallel.halo.halo_fold."""
    if pad == 0:
        return grid
    for ax in range(grid.ndim):
        n = grid.shape[ax] - 2 * pad

        def sl(a, b):
            idx = [slice(None)] * grid.ndim
            idx[ax] = slice(a, b)
            return tuple(idx)

        grid = grid.at[sl(n, n + pad)].add(grid[sl(0, pad)])
        grid = grid.at[sl(pad, 2 * pad)].add(grid[sl(n + pad, n + 2 * pad)])
        grid = grid[sl(pad, n + pad)]
    return grid


def state_specs(mhd: bool = False) -> SimState:
    """PartitionSpec pytree for SimState: particle arrays sharded on the
    leading axis over all mesh axes, gas fields sharded spatially, scalars
    replicated."""
    pa = P(AXES)
    r = P()
    gas = P(None, *AXES) if mhd else r
    return SimState(
        x=pa, v=pa, pid=pa, np_local=pa,
        a=r, tau=r, t=r, dt_old=r, nts=r,
        dt_f_acc=r, dt_pp_acc=r, dt_pp_ext_acc=r, dt_c_acc=r,
        dt_gas_acc=r,
        shake_offset=r, pp_overflow=r, exchange_overflow=r,
        bucket_overflow=r, clamp_count=r,
        rng=r, gas_u=gas, gas_b=gas)


def shard_state(state: SimState, mesh: Mesh) -> SimState:
    """Place a SimState according to state_specs on the mesh."""
    specs = state_specs(mhd=state.gas_u.ndim == 4)
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        state, specs,
        is_leaf=lambda x: isinstance(x, P))


def make_occupancy_probe(cfg: SimConfig, mesh: Mesh, band: int = 0):
    """Jitted PP sizing probe: probe(x, np_local) -> (occ_bound,
    n_dense_bound) — SHAKE-INVARIANT upper bounds.

    `occ_bound` bounds the max same-fine-cell occupancy at ANY grid
    alignment; `n_dense_bound` bounds the largest PER-DEVICE count of
    particles living in cells with occupancy > band+1 — i.e. the
    population the dense-tail compaction buffer must hold (its capacity
    is per-device, so the max matters, not the sum).  The driver's
    `pp_autosize` uses both to grow `pp_dense_band` /
    `pp_dense_cap_frac` BEFORE the dense-tail window or buffer overflows
    (the reference instead sizes its per-cell list `max_llf` statically
    and aborts on overflow, `particle_mesh_threaded.f90:280-284`).

    Why bounds and not the current occupancy: the per-sweep DISP_MESH
    shake re-aligns the grid by a random continuous offset, so a dense
    clump's single-cell occupancy swings several-fold sweep to sweep —
    a point sample at the probe sweep's alignment undershoots the worst
    alignment of the next probe period and the autosize reacts a whole
    period late (observed: a 64^3 validation dropped pairs across ~80
    sweeps while 4 probes in a row sampled lucky alignments).  Any unit
    cell at any alignment is contained in an axis-aligned 2-cell block
    at one of the 8 parities, so the max 2^3-block particle count over
    all parities bounds every alignment's occupancy; blocks straddling
    device faces are completed with one halo fold+pad round.  Cost: 8
    small scatter/gather passes over the local particles — run every few
    tens of steps, not per sweep.
    """
    nf = cfg.nf_physical_node_dim
    nb = nf // 2  # block grid (blocks of 2^3 fine cells)

    def local(x, np_local):
        valid = jnp.arange(x.shape[0]) < np_local[0]
        ci = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nf - 1)
        occ_bound = jnp.asarray(0, jnp.int32)
        n_dense_bound = jnp.asarray(0, jnp.int32)
        npd = nb + 2  # +1-block halo each side (face-straddling blocks)
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    b = (ci + jnp.array([[ox, oy, oz]], jnp.int32)) >> 1
                    key = (((b[:, 0] + 1) * npd + (b[:, 1] + 1)) * npd
                           + (b[:, 2] + 1))
                    key = jnp.where(valid, key, npd ** 3)  # dump slot
                    cnt = jnp.zeros((npd ** 3 + 1,), jnp.int32
                                    ).at[key].add(1)
                    folded = halo_mod.halo_fold(
                        cnt[:-1].reshape(npd, npd, npd), 1)
                    occ_bound = jnp.maximum(occ_bound, jnp.max(folded))
                    # per-particle completed block count (straddling
                    # blocks live on the neighbor after the fold)
                    full = halo_mod.halo_pad(folded, 1).reshape(-1)
                    pc = full[jnp.where(valid, key, 0)]
                    nd = jnp.sum((valid & (pc > band + 1))
                                 .astype(jnp.int32))
                    n_dense_bound = jnp.maximum(n_dense_bound, nd)
        return (jax.lax.pmax(occ_bound, AXES),
                jax.lax.pmax(n_dense_bound, AXES))

    return jax.jit(shard_map(local, mesh=mesh, in_specs=(P(AXES), P(AXES)),
                             out_specs=(P(), P()), check_vma=False))


def make_pp_ext_probe(cfg: SimConfig, mesh: Mesh):
    """Jitted lattice-PP_EXT sizing probe: probe(x, np_local) ->
    (ext_occ_bound, ext_dense_bound, skin_bound) — shake-invariant upper
    bounds that let the driver grow `pp_ext_band` / `pp_ext_ghost_cap` /
    the dense tail BEFORE the lattice pass drops a single pair.

    The lattice growth trigger was previously REACTIVE only: the one
    detecting sweep retained its counted drops (~0.1% of particles
    missing some sub-cutoff pair forces for one sweep at each band
    growth of the 128^3 ratchet) — a weaker contract than the reference,
    which aborts outright on list overflow
    (`particle_pass.f90:96-99`).  This probe restores the
    no-silent-physics-loss contract preemptively, like the dense-band
    probe (`make_occupancy_probe`).

    Bounds:
    * `ext_occ_bound` >= the max super-cell occupancy over ALL 8 shifted
      lattices at ANY grid alignment (shake re-aligns the lattice every
      sweep).  Super cells have edge s = 2*pp_range; any axis-aligned
      cube of edge s at any alignment is contained in a 2s-edge block at
      one of the 8 {0, s}-parity offsets, so the max 2s-block count over
      parities bounds every shift's occupancy.  Counts include ghost
      copies: blocks straddling device faces are completed by one halo
      fold+pad round (periodic wrap on a 1^3 mesh).
    * `ext_dense_bound` >= the per-device population of super cells
      denser than pp_ext_band_eff+1 (what the shared dense-tail buffer
      must hold for the ext pass).
    * `skin_bound` >= the per-face ghost-copy population
      (`ghost_copies_t` cap) for any sweep in the next probe period: the
      resident count in a face skin of depth pp_range + margin, where
      margin = 4*mesh_scale + 8 covers the bounded shake swing
      (cumulative offset lives in +-2*mesh_scale, update_position.f90:57)
      plus drift between probes.  The later-axis re-pass of received
      ghosts adds a (1 + 2*pp_range/nf)^2 factor, folded into the same
      margin.
    """
    nf = cfg.nf_physical_node_dim
    s = 2 * cfg.pp_range
    bs = 2 * s                      # probe block edge (2 super cells)
    if nf % bs != 0:
        return None                 # driver keeps the reactive backstop
    nb = nf // bs
    npd = nb + 2
    band = cfg.pp_ext_band_eff
    skin = min(nf // 2, cfg.pp_range + 4 * cfg.mesh_scale + 8)

    def local(x, np_local):
        valid = jnp.arange(x.shape[0]) < np_local[0]
        ci = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nf - 1)
        occ_bound = jnp.asarray(0, jnp.int32)
        dense_bound = jnp.asarray(0, jnp.int32)
        for ox in (0, s):
            for oy in (0, s):
                for oz in (0, s):
                    b = (ci + jnp.array([[ox, oy, oz]], jnp.int32)) // bs
                    key = (((b[:, 0] + 1) * npd + (b[:, 1] + 1)) * npd
                           + (b[:, 2] + 1))
                    key = jnp.where(valid, key, npd ** 3)
                    cnt = jnp.zeros((npd ** 3 + 1,), jnp.int32
                                    ).at[key].add(1)
                    folded = halo_mod.halo_fold(
                        cnt[:-1].reshape(npd, npd, npd), 1)
                    occ_bound = jnp.maximum(occ_bound, jnp.max(folded))
                    full = halo_mod.halo_pad(folded, 1).reshape(-1)
                    pc = full[jnp.where(valid, key, 0)]
                    nd = jnp.sum((valid & (pc > band + 1))
                                 .astype(jnp.int32))
                    dense_bound = jnp.maximum(dense_bound, nd)
        # face-skin population (ghost buffer bound), max over 6 faces
        skin_bound = jnp.asarray(0, jnp.int32)
        for ax in range(3):
            c = x[:, ax]
            lo = jnp.sum((valid & (c < skin)).astype(jnp.int32))
            hi = jnp.sum((valid & (c >= nf - skin)).astype(jnp.int32))
            skin_bound = jnp.maximum(skin_bound, jnp.maximum(lo, hi))
        return (jax.lax.pmax(occ_bound, AXES),
                jax.lax.pmax(dense_bound, AXES),
                jax.lax.pmax(skin_bound, AXES))

    return jax.jit(shard_map(local, mesh=mesh, in_specs=(P(AXES), P(AXES)),
                             out_specs=(P(), P(), P()), check_vma=False))


def make_sweep(cfg: SimConfig, mesh: Mesh, pp_band: int = 32):
    """Build the jitted sweep over `mesh` (shape (nd, nd, nd), axes x/y/z).

    Returns sweep(state, kern_f_im, kern_c_im, a_mid, dt, a_new, tau_new,
    t_new) -> state.
    """
    cfg.validate()
    nf = cfg.nf_physical_node_dim
    nf_buf = cfg.nf_buf
    nc = cfg.nc_node_dim
    nc_glob = cfg.nc_dim
    ms = cfg.mesh_scale
    mass_p = cfg.mass_p
    ncells_fine = nf ** 3
    max_buf = face_buffer_size(cfg)
    use_pp_pallas = (cfg.pp_pallas if cfg.pp_pallas is not None
                     else jax.default_backend() == "tpu")
    use_fft_mm = (cfg.fft_matmul if cfg.fft_matmul is not None
                  else dftmm.auto_enabled())
    # ranked streaming-window fine NGP deposit/gather (ops/fine_pallas.py)
    use_fine_pallas = cfg.ngp and (
        cfg.fine_pallas if cfg.fine_pallas is not None
        else fine_pallas_mod.auto_enabled())
    # Pallas segmented coarse deposit: opt-in only (fails Mosaic lowering
    # on real TPUs — dynamic lane-dim column RMW; see config.py)
    use_coarse_pallas = (cfg.coarse_sort and not cfg.coarse_from_fine
                         and bool(cfg.coarse_pallas))
    # XLA segmented-sum coarse deposit (compensated cumsum + boundary
    # gathers): the default sorted path (coarse_deposit_probe.py)
    use_coarse_csum = (cfg.coarse_sort and not cfg.coarse_from_fine
                       and not use_coarse_pallas
                       and (cfg.coarse_csum
                            if cfg.coarse_csum is not None else True))
    if cfg.coarse_gather_pallas and not (
            cfg.coarse_sort and not cfg.coarse_from_fine and cfg.ngp
            and use_coarse_csum):
        raise ValueError(
            "coarse_gather_pallas=True requires coarse_sort (sorted keys) "
            "+ ngp + the csum deposit (per-cell counts come from the fine "
            "NGP histogram); a silent XLA fallback would misattribute the "
            "gather cost")

    fb = cfg.cosmo.omega_b / cfg.cosmo.omega_m if cfg.mhd else 0.0
    gas_pad = 8  # TVD stencil reach over a fwd+bwd pass (2 sweeps x radius 3)

    def _gas_halfstep(u, b, dt):
        """One forward+backward gas pass over halo-padded fields
        (sweep + comm_bufferupdate roles, cubepm.f90:113-131)."""
        from ..mhd import tvd as tvd_mod
        up = halo_mod.halo_pad(u, gas_pad)
        bp = halo_mod.halo_pad(b, gas_pad)
        up, bp = tvd_mod.gas_step(up, bp, dt / 4.0, gamma=cfg.gas_gamma)
        sl = (slice(None),) + (slice(gas_pad, -gas_pad),) * 3
        return up[sl], bp[sl]

    def sweep_local(state: SimState, kern_f_im, kern_c_im,
                    a_mid, dt, a_new, tau_new, t_new) -> SimState:
        a_mid = jnp.asarray(a_mid, jnp.float32)
        dt = jnp.asarray(dt, jnp.float32)
        kick = a_mid * G * dt
        n_slots = state.x.shape[0]
        np_local = state.np_local[0]
        valid = jnp.arange(n_slots) < np_local

        gas_u, gas_b = state.gas_u, state.gas_b
        dt_gas_acc = jnp.asarray(1000.0, jnp.float32)
        if cfg.mhd:
            # first gas pass (fwd xyz + bwd zyx, dt_gas = dt/4 each sweep)
            gas_u, gas_b = _gas_halfstep(gas_u, gas_b, dt)

        # ---- optional mesh shake (DISP_MESH, update_position.f90:25-63) ---
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
        x = jnp.where(valid[:, None], x, 0.0)

        # ---- ownership exchange (particle_pass/delete_particles role) ----
        if cfg.nodes_dim == 1 and cfg.single_node_wrap:
            # single-node fast path: ownership never changes, so the whole
            # 26-class exchange (class keys + sort + ppermutes, ~0.5 s at
            # 256^3) reduces to the periodic wrap `x mod nf` — exact for
            # ANY drift+shake distance, with nothing to drop or clamp
            # (the reference's single-node build still runs its buffer
            # passes; this is a TPU-first simplification, not a port)
            x = jnp.where(valid[:, None], jnp.mod(x, nf), 0.0)
            clamp_count = jnp.asarray(0, jnp.int32)
            np_local = state.np_local[0]
            ex_overflow_local = jnp.asarray(0, jnp.int32)
            v, pid = state.v, state.pid
            sp_full = binning.sort_by_cell(x, valid, nf)
            packed = jnp.concatenate(
                [x.T, v.T, exchange_mod.pid_to_f32(pid)[None, :]],
                axis=0)[:, sp_full.order[:n_slots]]
            sp = binning.SortedParticles(order=None,
                                         cell=sp_full.cell[:n_slots],
                                         rank=sp_full.rank[:n_slots])
        elif cfg.merged_exchange_sort:
            # ONE big argsort: combined keys sort residents by cell AND
            # group leaver classes; arrivals merge by per-cell counting
            exs = exchange_mod.exchange_cell_sorted(
                x, state.v, state.pid, valid, nf, max_buf)
            clamp_count = jax.lax.psum(exs.clamp_count, AXES)
            np_local = jnp.minimum(exs.n_valid, n_slots)
            ex_overflow_local = exs.overflow   # includes capacity drop
            packed = exs.packed
            sp = binning.SortedParticles(
                order=None, cell=exs.cell,
                rank=binning.rank_from_sorted(exs.cell))
        else:
            # compact=False: the cell sort below orders invalid slots last
            # anyway, so the exchange skips its compaction argsort+gather
            ex = exchange_mod.exchange_particles(
                x, state.v, state.pid, valid, nf, max_buf, compact=False)
            x, v, pid, valid = ex.x, ex.v, ex.pid, ex.valid
            # guard residual out-of-range coords (shake can exceed one
            # node width only if nf is tiny; clamp defensively but COUNT
            # it — a nonzero clamp_count means a particle crossed more
            # than one node width in a step, which the single-hop
            # exchange cannot route)
            # strict > nf: a sub-ulp negative coordinate wraps to exactly
            # nf in fp32 (inexact xT + nf); that is a representation
            # artifact for the clip, not a multi-hop mover
            out_of_range = valid & jnp.any((x < 0.0) | (x > nf), axis=-1)
            clamp_count = jax.lax.psum(
                jnp.sum(out_of_range.astype(jnp.int32)), AXES)
            x = jnp.clip(x, 0.0, nf - 1e-4)
            n_valid_ex = jnp.sum(valid.astype(jnp.int32))
            # capacity: valid slots beyond max_np fall off the sorted tail
            capacity_drop = jnp.maximum(n_valid_ex - n_slots, 0)
            np_local = jnp.minimum(n_valid_ex, n_slots)
            ex_overflow_local = ex.overflow + capacity_drop

            # ---- sort by fine cell (replaces link_list.f90) ----
            # sorts the UNCOMPACTED exchange output (invalid slots carry
            # the sentinel key and sort last); truncating the permutation
            # to n_slots both compacts and restores the state capacity
            sp_full = binning.sort_by_cell(x, valid, nf)
            # one packed column gather instead of three row gathers (index
            # traversal dominates TPU gather cost, payload width is nearly
            # free; the (7, N) sublane-major pack avoids the lane-padded
            # relayout a (N, 7) minor-axis concat triggers — scatter_bench)
            packed = jnp.concatenate(
                [x.T, v.T, exchange_mod.pid_to_f32(pid)[None, :]],
                axis=0)[:, sp_full.order[:n_slots]]
            sp = binning.SortedParticles(order=None,
                                         cell=sp_full.cell[:n_slots],
                                         rank=sp_full.rank[:n_slots])
        x = exchange_mod.colmajor(packed[0:3].T)
        v = exchange_mod.colmajor(packed[3:6].T)
        pid = exchange_mod.pid_from_f32(packed[6])
        valid = sp.cell < ncells_fine

        # dark matter carries (1 - omega_b/omega_m) of the mass in MHD runs
        # (particle_mesh_threaded.f90:108-115, coarse_mass.f90:67-78)
        w = jnp.where(valid, jnp.float32(mass_p * (1.0 - fb)), 0.0)

        # ---- fine level (NGP/CIC deposit, halo, FFT force, kick) ----
        fine_plan = None
        if cfg.ngp and use_fine_pallas:
            # ranked streaming-window kernels: the plan (per-rank sums +
            # occupied keys) is shared by the deposit and the gather
            fine_plan = fine_pallas_mod.make_plan(sp.cell, w, ncells_fine)
            rho = fine_pallas_mod.deposit_from_plan(fine_plan,
                                                    (nf, nf, nf))
        elif cfg.ngp:
            rho = deposit.ngp_deposit(x, w, (nf, nf, nf), sorted_cells=True)
        else:
            # CIC fine build (the reference's non-NGP makefile variant)
            rho = halo_mod.halo_fold(deposit.cic_deposit(
                x, w, (nf + 2, nf + 2, nf + 2), scale=1.0, offset=-0.5,
                pad=1), 1)
        # the unit-weight fine NGP histogram doubles as the coarse
        # deposit's run-boundary source (counts per coarse base key pool
        # exactly from per-fine-cell counts; deposit.py)
        rho_dm = rho if (use_coarse_csum and cfg.ngp) else None
        if cfg.mhd:
            rho = rho + jnp.float32(fb) * gas_u[0]
        rho_halo = halo_mod.halo_pad(rho, nf_buf)
        if cfg.fine_fft_tiles > 1:
            if cfg.fine_potential:
                f_fine = fftconv.fine_force_potential_tiled(
                    rho_halo, kern_f_im, nf_buf, nf, cfg.fine_fft_tiles,
                    use_mm=use_fft_mm)
            else:
                f_fine = fftconv.fine_force_tiled(
                    rho_halo, kern_f_im, nf_buf, nf, cfg.fine_fft_tiles,
                    use_mm=use_fft_mm)
        elif cfg.fine_potential:
            f_fine = fftconv.fine_force_potential(rho_halo, kern_f_im,
                                                  nf_buf, nf,
                                                  use_mm=use_fft_mm)
        else:
            f_fine = fftconv.fine_force(rho_halo, kern_f_im, nf_buf, nf,
                                        use_mm=use_fft_mm)
        fmax2_f = jnp.max(jnp.sum(f_fine * f_fine, axis=0))
        if fine_plan is not None:
            fp = exchange_mod.colmajor(
                fine_pallas_mod.gather_from_plan(fine_plan, f_fine).T)
        elif cfg.ngp:
            fp = deposit.ngp_gather(
                f_fine, x, flat_cells=jnp.clip(sp.cell, 0, ncells_fine - 1))
        else:
            fp = deposit.cic_gather(halo_mod.halo_pad(f_fine, 1), x,
                                    scale=1.0, offset=-0.5, pad=1)
        v = v + jnp.where(valid[:, None], fp * kick, 0.0)

        if cfg.mhd:
            # gravity kick on the gas at fine-cell centers
            # (fine_velocity.f90:75-92): dv = a_mid G dt F; E += (m+rho dv/2)dv
            dv = kick * f_fine                       # (3, nf, nf, nf)
            mom = gas_u[1:4]
            de = jnp.sum((mom + 0.5 * gas_u[0] * dv) * dv, axis=0)
            gas_u = gas_u.at[1:4].add(gas_u[0] * dv)
            gas_u = gas_u.at[4].add(de)

        # dt_f limiter (particle_mesh_threaded.f90:641-656)
        fmax_f = jnp.sqrt(jax.lax.pmax(fmax2_f, AXES))
        dt_f_acc = 1.0 / jnp.sqrt(jnp.maximum(1e-4, fmax_f) * a_mid * G)

        # ---- pp level ----
        pp_overflow = jnp.asarray(0, jnp.int32)
        dt_pp_acc = jnp.asarray(1000.0, jnp.float32)
        dt_pp_ext_acc = jnp.asarray(1000.0, jnp.float32)
        bucket_overflow = jnp.asarray(0, jnp.int32)
        # DM-DM pair forces scale by the dark-matter mass fraction in MHD
        # runs, like the mesh deposit weight (the reference applies the
        # (1 - omega_b/omega_m) factor in both the PPINT and PP_EXT MHD
        # branches of particle_mesh_threaded.f90)
        mass_pp = mass_p * (1.0 - fb)
        if cfg.pp:
            # same-fine-cell pairs are always device-local (cells are
            # wholly owned), so no ghost layer is needed.
            dense_cap = max(64, int(cfg.max_np * cfg.pp_dense_cap_frac))
            res = pp.ppint_force(x, sp.cell, sp.rank, ncells_fine,
                                 pp_band, cfg.pp_dense_band, dense_cap,
                                 mass_pp, cfg.rsoft, cfg.pp_bias,
                                 use_pallas=use_pp_pallas)
            v = v + jnp.where(valid[:, None], res.force * kick, 0.0)
            fmax_pp = jax.lax.pmax(res.fmax, AXES)
            dt_pp_acc = (jnp.sqrt(cfg.dt_pp_scale * cfg.rsoft)
                         / jnp.maximum(jnp.sqrt(fmax_pp * a_mid * G), 1e-3))
            pp_overflow = jax.lax.psum(res.overflow, AXES)
        if cfg.pp_ext:
            if cfg.pp_ext_impl == "lattice":
                dense_cap = cfg.pp_ext_dense_cap_eff
                ghost_cap = (cfg.pp_ext_ghost_cap
                             or cfg.pp_ext_ghost_cap_auto())
                res = pp_lattice.pp_ext_lattice_force(
                    x, valid, nf, cfg.pp_range, cfg.nf_cutoff, mass_pp,
                    cfg.rsoft, cfg.pp_bias, cfg.pp_ext_band_eff,
                    cfg.pp_ext_tail_band_eff, dense_cap, ghost_cap)
            else:
                buckets = pp.bucket_by_coarse_cell(x, valid, nc, ms,
                                                   cfg.pp_coarse_capacity)
                res = pp.pp_ext_force(x, buckets, nc, ms, cfg.pp_range,
                                      cfg.nf_cutoff, mass_pp, cfg.rsoft,
                                      cfg.pp_bias)
            v = v + jnp.where(valid[:, None], res.force * kick, 0.0)
            fmax_ppe = jax.lax.pmax(res.fmax, AXES)
            dt_pp_ext_acc = (jnp.sqrt(cfg.dt_pp_ext_scale * cfg.rsoft)
                             / jnp.maximum(jnp.sqrt(fmax_ppe * a_mid * G),
                                           1e-3))
            bucket_overflow = jax.lax.psum(res.overflow, AXES)

        # ---- coarse level (coarse_mesh.f90) ----
        ncp = nc + 2
        coarse_sorted = cfg.coarse_sort and not cfg.coarse_from_fine
        if coarse_sorted:
            # re-sort by the coarse base-cell key: the corner deposit's
            # scatter and the force gather become monotone (sorted-scatter
            # economics — profile_step.py measured the unsorted corner
            # scatter at ~3x the sorted floor at 256^3).  Particles simply
            # STAY in coarse order through the sweep tail: identity is in
            # pid, and the next sweep's fine-cell sort reorders anyway.
            ckey = deposit.cic_base_key(x, (ncp, ncp, ncp), scale=ms,
                                        offset=-0.5, pad=1, valid=valid)
            corder = jnp.argsort(ckey)
            cpacked = jnp.concatenate(
                [x.T, v.T, exchange_mod.pid_to_f32(pid)[None, :]],
                axis=0)[:, corder]
            xT_c = cpacked[0:3]
            ckey_s = ckey[corder]
            x = exchange_mod.colmajor(cpacked[0:3].T)
            v = exchange_mod.colmajor(cpacked[3:6].T)
            pid = exchange_mod.pid_from_f32(cpacked[6])
            valid = ckey_s < ncp ** 3
            w = jnp.where(valid, jnp.float32(mass_p * (1.0 - fb)), 0.0)
        # per-base-cell counts pool for free from the fine NGP histogram
        # (deposit.coarse_counts_from_fine_hist); both the segmented-sum
        # deposit and the Pallas ranked gather key off them
        ccounts = None
        if coarse_sorted and rho_dm is not None:
            ccounts = deposit.coarse_counts_from_fine_hist(
                rho_dm / jnp.float32(mass_p * (1.0 - fb)),
                ms, 1).reshape(-1)
        use_gather_pallas = (
            coarse_sorted and ccounts is not None
            and (cfg.coarse_gather_pallas
                 if cfg.coarse_gather_pallas is not None
                 else gather_pallas_mod.auto_enabled()))
        if cfg.coarse_from_fine:
            # regular-stencil deposit from the fine NGP grid (includes the
            # gas contribution already folded into rho)
            from ..ops import coarse_stencil as cst
            rho_c_pad = cst.coarse_deposit_from_fine(rho, ms)
            rho_c = halo_mod.halo_fold(rho_c_pad, 1)
        else:
            if coarse_sorted and use_coarse_pallas:
                # segmented Pallas reduction over the sorted runs (the
                # XLA scatter ignores sortedness; ops/deposit_pallas.py)
                from ..experiments import deposit_pallas as dpp
                rho_c_pad = dpp.cic_deposit_corner_seg(
                    xT_c, w, (ncp, ncp, ncp), scale=ms, offset=-0.5,
                    pad=1)
            elif coarse_sorted and use_coarse_csum:
                # segmented-sum deposit over the sorted runs: compensated
                # cumsum + boundary gathers, ~N/8 indices
                rho_c_pad = deposit.cic_deposit_corner_csum_t(
                    xT_c, w, (ncp, ncp, ncp), scale=ms, offset=-0.5,
                    pad=1, counts=ccounts)
            elif coarse_sorted:
                # indices just sorted above: hint is genuine
                rho_c_pad = deposit.cic_deposit_corner(
                    x, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1,
                    valid=valid, sorted_cells=True)
            elif cfg.coarse_corner_deposit:
                # corner-split single-scatter CIC (fast steady state,
                # ~330 s extra XLA compile — see config.py)
                rho_c_pad = deposit.cic_deposit_corner(
                    x, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1)
            else:
                # NOTE: no sorted-indices hint here — fine-cell sort order
                # is NOT monotone in the coarse corner keys (the -0.5
                # offset straddles coarse cells within a fine cell), and an
                # unsorted hint is undefined behavior in XLA scatter
                rho_c_pad = deposit.cic_deposit(
                    x, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1)
            rho_c = halo_mod.halo_fold(rho_c_pad, 1)
            if cfg.mhd:
                # gas mass: sum-pool mesh_scale^3 gas cells
                # (coarse_mass.f90:67-78); strided slice-adds, never the
                # 6-D reshape (TPU tile padding — see deposit.sum_pool3)
                rho_c = rho_c + jnp.float32(fb) * deposit.sum_pool3(
                    gas_u[0], ms)
        if cfg.coarse_pencil_fft:
            # distributed pencil FFT (p3dfft_coarse role); 1-cell force halo
            # exchange (coarse_force_buffer role)
            from ..parallel import pfft as pfft_mod
            f_c_local = pfft_mod.coarse_force_pencil(rho_c, kern_c_im, nc)
            f_c_pad = halo_mod.halo_pad(f_c_local, 1)
        else:
            # replicated global solve after all_gather (cheap at coarse size)
            rho_c_glob = halo_mod.all_gather_grid(rho_c)
            f_c_glob = fftconv.coarse_force(rho_c_glob, kern_c_im,
                                            use_mm=use_fft_mm)
            # my padded block of the global field (coarse_force_buffer role)
            cx, cy, cz = halo_mod.device_coords()
            f_c_wrap = jnp.pad(f_c_glob, ((0, 0), (1, 1), (1, 1), (1, 1)),
                               mode="wrap")
            f_c_pad = jax.lax.dynamic_slice(
                f_c_wrap, (0, cx * nc, cy * nc, cz * nc),
                (3, ncp, ncp, ncp))
        fmax_c_local = jnp.max(jnp.sum(
            f_c_pad[:, 1:-1, 1:-1, 1:-1] ** 2, axis=0))
        fmax_c = jnp.sqrt(jax.lax.pmax(fmax_c_local, AXES))
        dt_c_acc = jnp.sqrt(ms / (fmax_c * a_mid * G))
        if cfg.coarse_from_fine:
            # trilinear coarse->fine upsample + the already-computed NGP
            # gather indices: one fused per-particle force read
            from ..ops import coarse_stencil as cst
            f_c_fine = cst.coarse_gather_to_fine(f_c_pad, ms)
            fcp = deposit.ngp_gather(
                f_c_fine, x, flat_cells=jnp.clip(sp.cell, 0,
                                                 ncells_fine - 1))
        elif use_gather_pallas:
            # ranked-window Pallas gather (exact vs the XLA corner gather)
            from ..ops import gather_pallas as gpp
            fcp = exchange_mod.colmajor(gpp.cic_gather_corner_ranked(
                f_c_pad, xT_c, ckey_s, ccounts, scale=ms,
                offset=-0.5).T)
        else:
            fcp = deposit.cic_gather_corner(f_c_pad, x, scale=ms,
                                            offset=-0.5, pad=1,
                                            valid=valid if coarse_sorted
                                            else None,
                                            sorted_cells=coarse_sorted)
        v = v + jnp.where(valid[:, None], fcp * kick, 0.0)

        if cfg.mhd:
            # coarse gravity kick on the gas (coarse_velocity.f90 MHD
            # branch): trilinear coarse->fine interpolation == CIC at
            # fine-cell centers; padded so edges wrap/exchange correctly
            f_c_fine = jax.image.resize(
                f_c_pad, (3, ncp * ms, ncp * ms, ncp * ms), method="linear")
            sl = (slice(None),) + (slice(ms, ms + nf),) * 3
            dvc = kick * f_c_fine[sl]
            mom = gas_u[1:4]
            de = jnp.sum((mom + 0.5 * gas_u[0] * dvc) * dvc, axis=0)
            gas_u = gas_u.at[1:4].add(gas_u[0] * dvc)
            gas_u = gas_u.at[4].add(de)
            # second gas pass (cubepm.f90:148-165)
            gas_u, gas_b = _gas_halfstep(gas_u, gas_b, dt)
            from ..mhd import tvd as tvd_mod
            # dt_gas = dt/4 must satisfy the CFL bound (calcfl role)
            dt_gas_acc = 4.0 * jax.lax.pmin(
                tvd_mod.calcfl(gas_u, gas_b, gamma=cfg.gas_gamma), AXES)

        exchange_overflow = jax.lax.psum(ex_overflow_local, AXES)

        return SimState(
            x=x, v=v, pid=pid,
            np_local=np_local[None],
            a=jnp.asarray(a_new, jnp.float32),
            tau=jnp.asarray(tau_new, jnp.float32),
            t=jnp.asarray(t_new, jnp.float32),
            dt_old=dt, nts=state.nts + 1,
            dt_f_acc=dt_f_acc.astype(jnp.float32),
            dt_pp_acc=dt_pp_acc.astype(jnp.float32),
            dt_pp_ext_acc=dt_pp_ext_acc.astype(jnp.float32),
            dt_c_acc=dt_c_acc.astype(jnp.float32),
            dt_gas_acc=dt_gas_acc.astype(jnp.float32),
            shake_offset=shake_offset,
            pp_overflow=pp_overflow,
            exchange_overflow=exchange_overflow,
            bucket_overflow=bucket_overflow,
            clamp_count=clamp_count,
            rng=rng,
            gas_u=gas_u, gas_b=gas_b,
        )

    specs = state_specs(mhd=cfg.mhd)
    rspec = P()
    mapped = shard_map(
        sweep_local, mesh=mesh,
        in_specs=(specs, rspec, rspec, rspec, rspec, rspec, rspec, rspec),
        out_specs=specs,
        check_vma=False)
    jitted = jax.jit(mapped)
    jitted._sweep_local = sweep_local  # for make_chunked_sweep
    return jitted


def make_staged_sweep(cfg: SimConfig, mesh: Mesh, pp_band: int = 32):
    """The sweep as MANY small separately-compiled shard_map programs.

    Numerically identical to `make_sweep` for non-MHD configs (pinned by
    tests/test_staged.py).  Exists because AOT/remote compilers are
    host-RAM bound PER MODULE — the fused 512^3-mesh sweep (and even the
    round-2 3-stage split) SIGKILLs the TPU tunnel's compile helper —
    while each of these stages is dominated by ONE large op.  Stage
    boundaries materialize particle arrays in HBM (~100s of MB at 256^3,
    ~ms of bandwidth) that XLA would otherwise fuse through.

    Stages (each its own jit; every one dominated by a single big op):
      A1  shake + drift + 26-class exchange
      A2a fine-cell key + argsort (+ rank scan)
      A2b the ONE packed (7, N) payload reorder gather
      B1  fine NGP/CIC deposit + density halo (also allocates f_fine)
      B2  ONE compiled tile-FFT program, executed tiles^3 times from the
          host at dynamic offsets (the reference's own per-tile strategy,
          particle_mesh_threaded.f90:72-628: one small program, t^3
          executions — here one COMPILE, t^3 dispatches)
      B3  fine force gather + kick + dt_f
      B4  PPINT band + dense tail + kick + dt_pp        (if cfg.pp)
      B5  PP_EXT bucket build + neighborhood scan + kick (if cfg.pp_ext)
      C1  coarse CIC deposit + fold + global FFT force + dt_c
      C2  coarse CIC gather + kick
      G1-G3 (cfg.mhd) first gas TVD pass / fine gravity kick on gas /
          coarse gas kick + second pass + CFL — the fused sweep's three
          coupling points (cubepm.f90:113-165) as stencil-only modules

    Returns staged_sweep(state, kern_f_im, kern_c_im, a_mid, dt, a_new,
    tau_new, t_new) -> state, like make_sweep.
    """
    cfg.validate()
    nf = cfg.nf_physical_node_dim
    nf_buf = cfg.nf_buf
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    mass_p = cfg.mass_p
    ncells_fine = nf ** 3
    max_buf = face_buffer_size(cfg)
    # MHD coupling constants (same as make_sweep: dark matter carries
    # (1 - omega_b/omega_m) of the mass, particle_mesh_threaded.f90:108-115)
    fb = cfg.cosmo.omega_b / cfg.cosmo.omega_m if cfg.mhd else 0.0
    mass_dm = mass_p * (1.0 - fb)
    gas_pad = 8  # TVD stencil reach over a fwd+bwd pass
    use_pp_pallas = (cfg.pp_pallas if cfg.pp_pallas is not None
                     else jax.default_backend() == "tpu")
    use_fft_mm = (cfg.fft_matmul if cfg.fft_matmul is not None
                  else dftmm.auto_enabled())
    use_fine_pallas = cfg.ngp and (
        cfg.fine_pallas if cfg.fine_pallas is not None
        else fine_pallas_mod.auto_enabled())
    use_coarse_pallas = (cfg.coarse_sort and not cfg.coarse_from_fine
                         and bool(cfg.coarse_pallas))
    use_coarse_csum = (cfg.coarse_sort and not cfg.coarse_from_fine
                       and not use_coarse_pallas
                       and (cfg.coarse_csum
                            if cfg.coarse_csum is not None else True))
    use_gather_pallas = (cfg.coarse_sort and not cfg.coarse_from_fine
                         and (cfg.coarse_gather_pallas
                              if cfg.coarse_gather_pallas is not None
                              else gather_pallas_mod.auto_enabled()))
    if cfg.coarse_gather_pallas and not (
            cfg.coarse_sort and not cfg.coarse_from_fine
            and use_coarse_csum):
        raise ValueError(
            "coarse_gather_pallas=True requires coarse_sort + the csum "
            "deposit (stage c1 threads its sorted-key counts to the "
            "gather); a silent XLA fallback would misattribute the cost")

    n_slots_cap = cfg.max_np

    # ALL particle arrays in the staged stages are SoA (3, N)/(7, N):
    # every (M, small-k) materialization on TPU lane-pads 42x (a single
    # (32M, 3) temp is 15.4 GB), and XLA inserts such copies around
    # transposes/minor-axis concats no matter what layout constraints ask.

    def a1_local(state: SimState, a_mid, dt):
        dt = jnp.asarray(dt, jnp.float32)
        n_slots = state.x.shape[0]
        valid = jnp.arange(n_slots) < state.np_local[0]
        rng = state.rng
        if cfg.shake:
            rng, sub = jax.random.split(rng)
            offset = ((jax.random.uniform(sub, (3,)) - 0.5)
                      * (4.0 * ms) - state.shake_offset)
            shake_offset = state.shake_offset + offset
        else:
            offset = jnp.zeros(3, jnp.float32)
            shake_offset = state.shake_offset
        # (N,3) -> (3,N) transposes are the CHEAP direction (compact out)
        xT = (state.x.T + state.v.T * (0.5 * (dt + state.dt_old))
              + offset[:, None])
        xT = jnp.where(valid[None, :], xT, 0.0)
        if cfg.nodes_dim == 1 and cfg.single_node_wrap:
            # single-node fast path (see make_sweep): exchange == periodic
            # wrap, exact for any displacement, nothing dropped
            xT = jnp.where(valid[None, :], jnp.mod(xT, nf), 0.0)
            return (xT, state.v.T, state.pid, valid, rng, shake_offset,
                    jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        ex = exchange_mod.exchange_particles(
            xT, state.v.T, state.pid, valid, nf, max_buf,
            compact=False, soa=True)
        xT, vT, pid, valid = ex.x, ex.v, ex.pid, ex.valid
        # strict > nf: see the fused path's sub-ulp wrap note
        out_of_range = valid & jnp.any((xT < 0.0) | (xT > nf), axis=0)
        clamp_count = jax.lax.psum(
            jnp.sum(out_of_range.astype(jnp.int32)), AXES)
        xT = jnp.clip(xT, 0.0, nf - 1e-4)
        return (xT, vT, pid, valid, rng, shake_offset, clamp_count,
                jax.lax.psum(ex.overflow, AXES))

    def a2a_local(xT, valid):
        """Fine-cell key + argsort + in-cell rank (ops/binning core)."""
        sp_full = binning.sort_by_cell_t(xT, valid, nf)
        n_valid_ex = jnp.sum(valid.astype(jnp.int32))
        capacity_drop = jax.lax.psum(
            jnp.maximum(n_valid_ex - n_slots_cap, 0), AXES)
        np_local = jnp.minimum(n_valid_ex, n_slots_cap)
        return (sp_full.order[:n_slots_cap], sp_full.cell[:n_slots_cap],
                sp_full.rank[:n_slots_cap], np_local[None], capacity_drop)

    def a2b_local(xT, vT, pid, order):
        """The one big payload gather: (7, N+R) -> sorted (7, max_np)."""
        packed = jnp.concatenate(
            [xT, vT, exchange_mod.pid_to_f32(pid)[None, :]],
            axis=0)[:, order]
        return packed

    tp = nf // cfg.fine_fft_tiles       # physical tile size
    tpad = tp + 2 * nf_buf              # FFT size per tile

    def b1_local(packed, cell, *gas):
        """Fine deposit + density halo; allocates the f_fine buffer that
        the B2 tile program fills in place.  MHD runs pass gas_u and the
        baryon density joins the source (particle_mesh_threaded.f90's
        rho += omega_b/omega_m gas branch)."""
        xT = packed[0:3]
        valid = cell < ncells_fine
        w = jnp.where(valid, jnp.float32(mass_dm), 0.0)
        if cfg.ngp and use_fine_pallas:
            # single-op stages can't share the rank plan with B3 without
            # widening the stage interface by ~3 rank arrays; the dup'd
            # plan build is ~1/4 of the kernel's own cost
            rho = fine_pallas_mod.ngp_deposit_ranked(cell, w,
                                                     (nf, nf, nf))
        elif cfg.ngp:
            rho = deposit.ngp_deposit_t(xT, w, (nf, nf, nf),
                                        sorted_cells=True)
        else:
            rho = halo_mod.halo_fold(deposit.cic_deposit_t(
                xT, w, (nf + 2, nf + 2, nf + 2), scale=1.0, offset=-0.5,
                pad=1), 1)
        if cfg.mhd:
            rho = rho + jnp.float32(fb) * gas[0][0]
        rho_halo = halo_mod.halo_pad(rho, nf_buf)
        f_fine = jnp.zeros((3, nf, nf, nf), jnp.float32)
        # rho itself is only consumed by the coarse_from_fine stencil path;
        # don't materialize an extra nf^3 stage output otherwise
        rho_out = rho if cfg.coarse_from_fine else jnp.zeros(
            (1, 1, 1), jnp.float32)
        return rho_out, rho_halo, f_fine

    def b2_local(f_fine, rho_halo, kern_f_im, sx, sy, sz):
        """ONE tile's FFT force solve at a dynamic offset, written into the
        donated f_fine buffer.  Compiled once; dispatched tiles^3 times."""
        tile = jax.lax.dynamic_slice(rho_halo, (sx, sy, sz),
                                     (tpad, tpad, tpad))
        if cfg.fine_potential:
            ft = fftconv.fine_force_potential(tile, kern_f_im, nf_buf, tp,
                                              use_mm=use_fft_mm)
        else:
            ft = fftconv.fine_force(tile, kern_f_im, nf_buf, tp,
                                    use_mm=use_fft_mm)
        return jax.lax.dynamic_update_slice(f_fine, ft, (0, sx, sy, sz))

    def b3_local(packed, cell, f_fine, a_mid, dt):
        """Fine force gather + kick + dt_f limiter."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        kick = a_mid * G * jnp.asarray(dt, jnp.float32)
        xT = packed[0:3]
        vT = packed[3:6]
        valid = cell < ncells_fine
        fmax2_f = jnp.max(jnp.sum(f_fine * f_fine, axis=0))
        flat_cells = jnp.clip(cell, 0, ncells_fine - 1)
        if cfg.ngp and use_fine_pallas:
            fpT = fine_pallas_mod.ngp_gather_ranked(
                f_fine, cell, valid.astype(jnp.float32))
        elif cfg.ngp:
            fpT = deposit.ngp_gather_t(f_fine, flat_cells)
        else:
            fpT = deposit.cic_gather_t(halo_mod.halo_pad(f_fine, 1), xT,
                                       scale=1.0, offset=-0.5, pad=1)
        vT = vT + jnp.where(valid[None, :], fpT * kick, 0.0)
        fmax_f = jnp.sqrt(jax.lax.pmax(fmax2_f, AXES))
        dt_f_acc = 1.0 / jnp.sqrt(jnp.maximum(1e-4, fmax_f) * a_mid * G)
        return vT, dt_f_acc.astype(jnp.float32)

    def b4_local(packed, cell, rank, vT, a_mid, dt):
        """PPINT band + dense tail + kick + dt_pp limiter."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        kick = a_mid * G * jnp.asarray(dt, jnp.float32)
        xT = packed[0:3]
        valid = cell < ncells_fine
        dense_cap = max(64, int(cfg.max_np * cfg.pp_dense_cap_frac))
        res = pp.ppint_force_t(xT, cell, rank, ncells_fine, pp_band,
                               cfg.pp_dense_band, dense_cap, mass_dm,
                               cfg.rsoft, cfg.pp_bias,
                               use_pallas=use_pp_pallas)
        vT = vT + jnp.where(valid[None, :], res.force * kick, 0.0)
        fmax_pp = jax.lax.pmax(res.fmax, AXES)
        dt_pp_acc = (jnp.sqrt(cfg.dt_pp_scale * cfg.rsoft)
                     / jnp.maximum(jnp.sqrt(fmax_pp * a_mid * G), 1e-3))
        return (vT, dt_pp_acc.astype(jnp.float32),
                jax.lax.psum(res.overflow, AXES))

    def b5_local(packed, cell, vT, a_mid, dt):
        """PP_EXT extended-range pair force + kick (SoA; the reference's
        extended-range pair loop,
        particle_mesh_threaded.f90:488-615) — dense bucket scan (small
        boxes; the lattice impl runs as the b5g/b5s/b5k split below)."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        kick = a_mid * G * jnp.asarray(dt, jnp.float32)
        xT = packed[0:3]
        valid = cell < ncells_fine
        buckets = pp.bucket_by_coarse_cell_t(xT, valid, nc, ms,
                                             cfg.pp_coarse_capacity)
        res = pp.pp_ext_force_t(xT, buckets, nc, ms, cfg.pp_range,
                                cfg.nf_cutoff, mass_dm, cfg.rsoft,
                                cfg.pp_bias)
        vT = vT + jnp.where(valid[None, :], res.force * kick, 0.0)
        fmax_ppe = jax.lax.pmax(res.fmax, AXES)
        dt_pp_ext_acc = (jnp.sqrt(cfg.dt_pp_ext_scale * cfg.rsoft)
                         / jnp.maximum(jnp.sqrt(fmax_ppe * a_mid * G),
                                       1e-3))
        return (vT, dt_pp_ext_acc.astype(jnp.float32),
                jax.lax.psum(res.overflow, AXES))

    # lattice PP_EXT as THREE small modules — ghosts once, then ONE
    # compiled per-shift program dispatched 8 times, then the kick.
    # The all-8-shifts-in-one-module form at a grown band was the
    # r7/r8 TPU-worker-crash site (a single dispatch's wall time scales
    # as 8*band*N and the tunnel kills executions beyond ~30 s;
    # bench_logs/r8_ppext128_leg1.log stage b5): the split keeps every
    # dispatch at 1/8 of that and compiles ~8x less code.
    ext_ghost_cap = (cfg.pp_ext_ghost_cap or cfg.pp_ext_ghost_cap_auto())
    ext_dense_cap = cfg.pp_ext_dense_cap_eff

    def b5g_local(packed, cell):
        """Ghost-skin build + force accumulator allocation."""
        xT = packed[0:3]
        valid = cell < ncells_fine
        ax, aval, g_ovfl = pp_lattice.ghosted_positions_t(
            xT, valid, nf, cfg.pp_range, ext_ghost_cap)
        facc = jnp.zeros((3, n_slots_cap), jnp.float32)
        return (ax, aval, facc, jax.lax.psum(g_ovfl, AXES))

    def b5s_local(ax, aval, facc, ovfl, shift):
        """One shifted lattice's band+tail pair forces, accumulated into
        the donated resident-slot accumulator."""
        f, ov = pp_lattice.pp_ext_shift_force_t(
            ax, aval, shift, nf, cfg.pp_range, cfg.nf_cutoff, mass_dm,
            cfg.rsoft, cfg.pp_bias, cfg.pp_ext_band_eff,
            cfg.pp_ext_tail_band_eff, ext_dense_cap)
        return (facc + f[:, :n_slots_cap],
                jnp.maximum(ovfl, jax.lax.psum(ov, AXES)))

    # chunked dense tail (cfg.pp_ext_tail_chunk): the per-shift program
    # splits further into band-only b5s + ceil(n_dense/chunk) bounded
    # b5t dispatches — the single-dispatch tail is O(dense_cap *
    # tail_band) pair lanes (~6e11 at 256³ z<=1 clustering) and crashed
    # the worker at production scale (campaign_r9.log ppext256-demo)
    tail_chunk = int(cfg.pp_ext_tail_chunk or 0)
    tail_w = cfg.pp_ext_tail_band_eff

    def b5sb_local(ax, aval, facc, ovfl, shift):
        """Band pass + dense compaction only (tail runs as b5t chunks)."""
        (f, dsx, dsy, dsz, dcl, gidx, n_dense,
         ov) = pp_lattice.pp_ext_shift_band_t(
            ax, aval, shift, nf, cfg.pp_range, cfg.nf_cutoff, mass_dm,
            cfg.rsoft, cfg.pp_bias, cfg.pp_ext_band_eff,
            tail_w, ext_dense_cap, pad_extra=tail_chunk)
        return (facc + f[:, :n_slots_cap], dsx, dsy, dsz, dcl, gidx,
                jax.lax.pmax(n_dense, AXES),
                jnp.maximum(ovfl, jax.lax.psum(ov, AXES)))

    def b5t_local(facc, dsx, dsy, dsz, dcl, gidx, c0):
        """One bounded dense-tail chunk, scattered into the donated
        accumulator (both partners of each owned pair; ghost-partner
        entries masked like the single-dispatch truncation)."""
        f = pp_lattice.pp_ext_tail_chunk_t(
            dsx, dsy, dsz, dcl, c0, tail_chunk, cfg.pp_ext_band_eff,
            tail_w, cfg.pp_range, cfg.nf_cutoff, mass_dm, cfg.rsoft,
            cfg.pp_bias)
        gi = jax.lax.dynamic_slice(gidx, (c0,), (tail_chunk + tail_w,))
        ok = gi < n_slots_cap
        f = jnp.where(ok[None, :], f, 0.0)
        return facc.at[:, jnp.where(ok, gi, 0)].add(f)

    def b5k_local(cell, vT, facc, a_mid, dt):
        """PP_EXT kick + dt limiter from the accumulated shift forces."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        kick = a_mid * G * jnp.asarray(dt, jnp.float32)
        valid = cell < ncells_fine
        force = jnp.where(valid[None, :], facc, 0.0)
        vT = vT + force * kick
        fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=0)))
        fmax_ppe = jax.lax.pmax(fmax, AXES)
        dt_pp_ext_acc = (jnp.sqrt(cfg.dt_pp_ext_scale * cfg.rsoft)
                         / jnp.maximum(jnp.sqrt(fmax_ppe * a_mid * G),
                                       1e-3))
        return vT, dt_pp_ext_acc.astype(jnp.float32)

    csort = cfg.coarse_sort and not cfg.coarse_from_fine
    ncp_cells = (nc + 2) ** 3

    def c0a_local(packed, cell):
        """Coarse base-key argsort (cfg.coarse_sort): makes the c1 scatter
        and c2 gather monotone (sorted-scatter economics)."""
        ncp = nc + 2
        xT = packed[0:3]
        valid = cell < ncells_fine
        ckey = deposit.cic_base_key_t(xT, (ncp, ncp, ncp), scale=ms,
                                      offset=-0.5, pad=1, valid=valid)
        corder = jnp.argsort(ckey)
        return corder.astype(jnp.int32), ckey[corder]

    def c0b_local(packed, vT2, corder):
        """ONE (10, N) payload gather into coarse order (payload width is
        nearly free; index traversal dominates)."""
        big = jnp.concatenate([packed, vT2], axis=0)[:, corder]
        return big[0:7], big[7:10]

    def c1_local(packed, cell, rho, kern_c_im, a_mid, *gas):
        """Coarse deposit + fold + global FFT force + dt_c limiter.
        With cfg.coarse_sort, `cell` is the SORTED coarse base key from
        c0a (validity sentinel ncp^3); otherwise the fine cell key.
        MHD runs pass gas_u: the sum-pooled baryon mass joins the coarse
        density (coarse_mass.f90:67-78)."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        xT = packed[0:3]
        valid = cell < (ncp_cells if csort else ncells_fine)
        w = jnp.where(valid, jnp.float32(mass_dm), 0.0)
        ncp = nc + 2
        if cfg.coarse_from_fine:
            from ..ops import coarse_stencil as cst
            rho_c_pad = cst.coarse_deposit_from_fine(rho, ms)
            rho_c = halo_mod.halo_fold(rho_c_pad, 1)
        elif csort and use_coarse_pallas:
            from ..experiments import deposit_pallas as dpp
            rho_c = halo_mod.halo_fold(dpp.cic_deposit_corner_seg(
                xT, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1), 1)
        elif csort and use_coarse_csum:
            # segmented-sum deposit; run boundaries from ONE 1-payload
            # sorted histogram (b1 does not carry the fine histogram
            # between stages — grid bytes), shared with c2's gather
            counts = deposit.sorted_key_counts(cell, w, ncp_cells)
            rho_c = halo_mod.halo_fold(deposit.cic_deposit_corner_csum_t(
                xT, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1,
                counts=counts), 1)
        elif csort:
            rho_c = halo_mod.halo_fold(deposit.cic_deposit_corner_t(
                xT, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1,
                valid=valid, sorted_cells=True), 1)
        elif cfg.coarse_corner_deposit:
            rho_c = halo_mod.halo_fold(deposit.cic_deposit_corner_t(
                xT, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1), 1)
        else:
            # no sorted-indices hint: coarse corner keys are not monotone
            # in fine-cell sort order (see the fused-path note)
            rho_c = halo_mod.halo_fold(deposit.cic_deposit_t(
                xT, w, (ncp, ncp, ncp), scale=ms, offset=-0.5, pad=1), 1)
        if cfg.mhd and not cfg.coarse_from_fine:
            # gas mass: sum-pool mesh_scale^3 gas cells (coarse_mass.f90;
            # the coarse_from_fine stencil already sees gas via b1's rho)
            rho_c = rho_c + jnp.float32(fb) * deposit.sum_pool3(
                gas[0][0], ms)
        if cfg.coarse_pencil_fft:
            from ..parallel import pfft as pfft_mod
            f_c_local = pfft_mod.coarse_force_pencil(rho_c, kern_c_im, nc)
            f_c_pad = halo_mod.halo_pad(f_c_local, 1)
        else:
            rho_c_glob = halo_mod.all_gather_grid(rho_c)
            f_c_glob = fftconv.coarse_force(rho_c_glob, kern_c_im,
                                            use_mm=use_fft_mm)
            cx, cy, cz = halo_mod.device_coords()
            f_c_wrap = jnp.pad(f_c_glob, ((0, 0), (1, 1), (1, 1), (1, 1)),
                               mode="wrap")
            f_c_pad = jax.lax.dynamic_slice(
                f_c_wrap, (0, cx * nc, cy * nc, cz * nc),
                (3, ncp, ncp, ncp))
        fmax_c_local = jnp.max(jnp.sum(
            f_c_pad[:, 1:-1, 1:-1, 1:-1] ** 2, axis=0))
        fmax_c = jnp.sqrt(jax.lax.pmax(fmax_c_local, AXES))
        dt_c_acc = jnp.sqrt(ms / (fmax_c * a_mid * G))
        if use_gather_pallas and use_coarse_csum:
            return f_c_pad, dt_c_acc.astype(jnp.float32), counts
        return f_c_pad, dt_c_acc.astype(jnp.float32)

    def c2_local(packed, cell, vT, f_c_pad, a_mid, dt, counts=None):
        """Coarse force gather + kick (`cell` semantics as in c1)."""
        a_mid = jnp.asarray(a_mid, jnp.float32)
        kick = a_mid * G * jnp.asarray(dt, jnp.float32)
        xT = packed[0:3]
        valid = cell < (ncp_cells if csort else ncells_fine)
        if cfg.coarse_from_fine:
            from ..ops import coarse_stencil as cst
            f_c_fine = cst.coarse_gather_to_fine(f_c_pad, ms)
            fcpT = deposit.ngp_gather_t(
                f_c_fine, jnp.clip(cell, 0, ncells_fine - 1))
        elif csort and counts is not None:
            # ranked-window Pallas gather (exact vs the XLA corner gather)
            from ..ops import gather_pallas as gpp
            fcpT = gpp.cic_gather_corner_ranked(
                f_c_pad, xT, cell, counts, scale=ms, offset=-0.5)
        elif csort:
            fcpT = deposit.cic_gather_corner_t(f_c_pad, xT, scale=ms,
                                               offset=-0.5, pad=1,
                                               valid=valid,
                                               sorted_cells=True)
        else:
            fcpT = deposit.cic_gather_corner_t(f_c_pad, xT, scale=ms,
                                               offset=-0.5, pad=1)
        return vT + jnp.where(valid[None, :], fcpT * kick, 0.0)

    # ---- MHD gas stages (cubepm.f90:113-165 coupling points; each is a
    # small stencil-dominated compile unit like the particle stages) ----
    if cfg.mhd:
        from ..mhd import tvd as tvd_mod

        def _gas_halfstep(u, b, dt):
            """Forward+backward TVD pass over halo-padded fields (sweep +
            comm_bufferupdate roles)."""
            up = halo_mod.halo_pad(u, gas_pad)
            bp = halo_mod.halo_pad(b, gas_pad)
            up, bp = tvd_mod.gas_step(up, bp, dt / 4.0,
                                      gamma=cfg.gas_gamma)
            sl = (slice(None),) + (slice(gas_pad, -gas_pad),) * 3
            return up[sl], bp[sl]

        def g1_local(gas_u, gas_b, dt):
            """First gas pass (fwd xyz + bwd zyx, dt/4 each sweep)."""
            return _gas_halfstep(gas_u, gas_b,
                                 jnp.asarray(dt, jnp.float32))

        def g2_local(gas_u, f_fine, a_mid, dt):
            """Fine gravity kick on the gas (fine_velocity.f90:75-92):
            dv = a_mid G dt F; E += (m + rho dv/2) dv."""
            kick = (jnp.asarray(a_mid, jnp.float32) * G
                    * jnp.asarray(dt, jnp.float32))
            dv = kick * f_fine
            mom = gas_u[1:4]
            de = jnp.sum((mom + 0.5 * gas_u[0] * dv) * dv, axis=0)
            gas_u = gas_u.at[1:4].add(gas_u[0] * dv)
            return gas_u.at[4].add(de)

        def g3_local(gas_u, gas_b, f_c_pad, a_mid, dt):
            """Coarse gravity kick on the gas (coarse_velocity.f90 MHD
            branch) + second gas pass + CFL limiter (calcfl role)."""
            kick = (jnp.asarray(a_mid, jnp.float32) * G
                    * jnp.asarray(dt, jnp.float32))
            ncp = nc + 2
            f_c_fine = jax.image.resize(
                f_c_pad, (3, ncp * ms, ncp * ms, ncp * ms),
                method="linear")
            sl = (slice(None),) + (slice(ms, ms + nf),) * 3
            dvc = kick * f_c_fine[sl]
            mom = gas_u[1:4]
            de = jnp.sum((mom + 0.5 * gas_u[0] * dvc) * dvc, axis=0)
            gas_u = gas_u.at[1:4].add(gas_u[0] * dvc)
            gas_u = gas_u.at[4].add(de)
            gas_u, gas_b = _gas_halfstep(gas_u, gas_b,
                                         jnp.asarray(dt, jnp.float32))
            dt_gas_acc = 4.0 * jax.lax.pmin(
                tvd_mod.calcfl(gas_u, gas_b, gamma=cfg.gas_gamma), AXES)
            return gas_u, gas_b, dt_gas_acc.astype(jnp.float32)

    pa = P(AXES)
    r = P()
    grid_spec = P(*AXES)
    grid4_spec = P(None, *AXES)
    prow = P(None, AXES)       # SoA (k, N) arrays: particles on dim 1
    specs = state_specs(mhd=cfg.mhd)
    a1_jit = jax.jit(shard_map(
        a1_local, mesh=mesh, in_specs=(specs, r, r),
        out_specs=(prow, prow, pa, pa, r, r, r, r), check_vma=False))
    a2a_jit = jax.jit(shard_map(
        a2a_local, mesh=mesh, in_specs=(prow, pa),
        out_specs=(pa, pa, pa, pa, r), check_vma=False))
    a2b_jit = jax.jit(shard_map(
        a2b_local, mesh=mesh, in_specs=(prow, prow, pa, pa),
        out_specs=prow, check_vma=False))
    b1_jit = jax.jit(shard_map(
        b1_local, mesh=mesh,
        in_specs=((prow, pa, grid4_spec) if cfg.mhd else (prow, pa)),
        out_specs=(grid_spec, grid_spec, grid4_spec), check_vma=False))
    b2_jit = jax.jit(shard_map(
        b2_local, mesh=mesh,
        in_specs=(grid4_spec, grid_spec, r, r, r, r),
        out_specs=grid4_spec, check_vma=False), donate_argnums=(0,))
    b3_jit = jax.jit(shard_map(
        b3_local, mesh=mesh, in_specs=(prow, pa, grid4_spec, r, r),
        out_specs=(prow, r), check_vma=False))
    b4_jit = jax.jit(shard_map(
        b4_local, mesh=mesh, in_specs=(prow, pa, pa, prow, r, r),
        out_specs=(prow, r, r), check_vma=False))
    b5_jit = jax.jit(shard_map(
        b5_local, mesh=mesh, in_specs=(prow, pa, prow, r, r),
        out_specs=(prow, r, r), check_vma=False))
    b5g_jit = jax.jit(shard_map(
        b5g_local, mesh=mesh, in_specs=(prow, pa),
        out_specs=(prow, pa, prow, r), check_vma=False))
    b5s_jit = jax.jit(shard_map(
        b5s_local, mesh=mesh, in_specs=(prow, pa, prow, r, r),
        out_specs=(prow, r), check_vma=False), donate_argnums=(2,))
    b5t_jit = None
    if tail_chunk:
        b5s_jit = jax.jit(shard_map(
            b5sb_local, mesh=mesh, in_specs=(prow, pa, prow, r, r),
            out_specs=(prow, pa, pa, pa, pa, pa, r, r),
            check_vma=False), donate_argnums=(2,))
        b5t_jit = jax.jit(shard_map(
            b5t_local, mesh=mesh,
            in_specs=(prow, pa, pa, pa, pa, pa, r),
            out_specs=prow, check_vma=False), donate_argnums=(0,))
    b5k_jit = jax.jit(shard_map(
        b5k_local, mesh=mesh, in_specs=(pa, prow, prow, r, r),
        out_specs=(prow, r), check_vma=False))
    c0a_jit = jax.jit(shard_map(
        c0a_local, mesh=mesh, in_specs=(prow, pa),
        out_specs=(pa, pa), check_vma=False))
    c0b_jit = jax.jit(shard_map(
        c0b_local, mesh=mesh, in_specs=(prow, prow, pa),
        out_specs=(prow, prow), check_vma=False))
    counts_thread = use_gather_pallas and use_coarse_csum
    c1_in = (prow, pa, grid_spec, r, r)
    if cfg.mhd:
        c1_in = c1_in + (grid4_spec,)
    c1_jit = jax.jit(shard_map(
        c1_local, mesh=mesh, in_specs=c1_in,
        out_specs=((grid4_spec, r, pa) if counts_thread
                   else (grid4_spec, r)), check_vma=False))
    c2_jit = jax.jit(shard_map(
        c2_local, mesh=mesh,
        in_specs=((prow, pa, prow, grid4_spec, r, r, pa) if counts_thread
                  else (prow, pa, prow, grid4_spec, r, r)),
        out_specs=prow, check_vma=False))
    if cfg.mhd:
        g1_jit = jax.jit(shard_map(
            g1_local, mesh=mesh, in_specs=(grid4_spec, grid4_spec, r),
            out_specs=(grid4_spec, grid4_spec), check_vma=False))
        g2_jit = jax.jit(shard_map(
            g2_local, mesh=mesh,
            in_specs=(grid4_spec, grid4_spec, r, r),
            out_specs=grid4_spec, check_vma=False))
        g3_jit = jax.jit(shard_map(
            g3_local, mesh=mesh,
            in_specs=(grid4_spec, grid4_spec, grid4_spec, r, r),
            out_specs=(grid4_spec, grid4_spec, r), check_vma=False))
    # the ONLY (N, 3) materializations: the final state arrays, produced
    # by a transpose-only module whose output layout is pinned column-major
    # (same bytes as the SoA input -> a relayout, never a padded copy)
    from jax.experimental.layout import Format, Layout
    f3 = Format(Layout((1, 0)), NamedSharding(mesh, pa))
    to_rows = jax.jit(lambda t: t.T, out_shardings=f3)

    import os as _os
    if _os.environ.get("CUBEP3M_LOG_STAGES"):
        # per-stage dispatch timing (first call ~= compile time; jit
        # compiles synchronously at dispatch) for tunnel campaign logs
        import sys as _sys
        import time as _time

        def _logged(name, fn):
            def wrap(*a, **kw):
                t0 = _time.time()
                out = fn(*a, **kw)
                jax.block_until_ready(out)
                print(f"# stage {name}: {_time.time() - t0:.1f}s",
                      file=_sys.stderr, flush=True)
                return out
            return wrap

        a1_jit = _logged("a1", a1_jit)
        a2a_jit = _logged("a2a", a2a_jit)
        a2b_jit = _logged("a2b", a2b_jit)
        b1_jit = _logged("b1", b1_jit)
        b2_jit = _logged("b2", b2_jit)
        b3_jit = _logged("b3", b3_jit)
        b4_jit = _logged("b4", b4_jit)
        b5_jit = _logged("b5", b5_jit)
        b5g_jit = _logged("b5g", b5g_jit)
        b5s_jit = _logged("b5s", b5s_jit)
        if b5t_jit is not None:
            b5t_jit = _logged("b5t", b5t_jit)
        b5k_jit = _logged("b5k", b5k_jit)
        c0a_jit = _logged("c0a", c0a_jit)
        c0b_jit = _logged("c0b", c0b_jit)
        c1_jit = _logged("c1", c1_jit)
        c2_jit = _logged("c2", c2_jit)
        if cfg.mhd:
            g1_jit = _logged("g1", g1_jit)
            g2_jit = _logged("g2", g2_jit)
            g3_jit = _logged("g3", g3_jit)

    # static tile-start schedule: the SAME b2 program runs at every offset
    tile_starts = [(jnp.int32(ix * tp), jnp.int32(iy * tp),
                    jnp.int32(iz * tp))
                   for ix in range(cfg.fine_fft_tiles)
                   for iy in range(cfg.fine_fft_tiles)
                   for iz in range(cfg.fine_fft_tiles)]
    # the 8 lattice shifts the ONE b5s program is dispatched with
    hh = float(cfg.pp_range)
    shift_list = [jnp.array([sx, sy, sz], jnp.float32)
                  for sx in (0.0, hh) for sy in (0.0, hh)
                  for sz in (0.0, hh)]

    def staged_sweep(state: SimState, kern_f_im, kern_c_im, a_mid, dt,
                     a_new, tau_new, t_new) -> SimState:
        (xT, vT, pide, valide, rng, shake_offset, clamp_count,
         ex_overflow) = a1_jit(state, a_mid, dt)
        gas_u, gas_b = state.gas_u, state.gas_b
        dt_gas_acc = jnp.asarray(1000.0, jnp.float32)
        if cfg.mhd:
            # first gas pass before the fine source build (cubepm.f90:113)
            gas_u, gas_b = g1_jit(gas_u, gas_b, dt)
        (order, cell, rank, np_local,
         capacity_drop) = a2a_jit(xT, valide)
        packed = a2b_jit(xT, vT, pide, order)
        exchange_overflow = ex_overflow + capacity_drop
        if cfg.mhd:
            rho, rho_halo, f_fine = b1_jit(packed, cell, gas_u)
        else:
            rho, rho_halo, f_fine = b1_jit(packed, cell)
        for sx, sy, sz in tile_starts:
            f_fine = b2_jit(f_fine, rho_halo, kern_f_im, sx, sy, sz)
        vT2, dt_f_acc = b3_jit(packed, cell, f_fine, a_mid, dt)
        if cfg.mhd:
            gas_u = g2_jit(gas_u, f_fine, a_mid, dt)
        dt_pp_acc = jnp.asarray(1000.0, jnp.float32)
        dt_pp_ext_acc = jnp.asarray(1000.0, jnp.float32)
        pp_overflow = jnp.asarray(0, jnp.int32)
        bucket_overflow = jnp.asarray(0, jnp.int32)
        if cfg.pp:
            vT2, dt_pp_acc, pp_overflow = b4_jit(packed, cell, rank, vT2,
                                                 a_mid, dt)
        if cfg.pp_ext and cfg.pp_ext_impl == "lattice":
            ax, aval, facc, g_ovfl = b5g_jit(packed, cell)
            ovfl = jnp.asarray(0, jnp.int32)
            if tail_chunk:
                # per-shift: band pass, then ceil(n_dense/chunk) bounded
                # tail dispatches (n_dense is pmax'ed so every device
                # runs the same chunk count; the int() is a scalar sync)
                for shift in shift_list:
                    (facc, dsx, dsy, dsz, dcl, gidx, nd,
                     ovfl) = b5s_jit(ax, aval, facc, ovfl, shift)
                    n_do = min(int(nd), ext_dense_cap)
                    for k in range(-(-n_do // tail_chunk)):
                        facc = b5t_jit(
                            facc, dsx, dsy, dsz, dcl, gidx,
                            jnp.asarray(k * tail_chunk, jnp.int32))
            else:
                for shift in shift_list:
                    facc, ovfl = b5s_jit(ax, aval, facc, ovfl, shift)
            vT2, dt_pp_ext_acc = b5k_jit(cell, vT2, facc, a_mid, dt)
            bucket_overflow = g_ovfl + ovfl
        elif cfg.pp_ext:
            vT2, dt_pp_ext_acc, bucket_overflow = b5_jit(packed, cell,
                                                         vT2, a_mid, dt)
        if csort:
            corder, cell = c0a_jit(packed, cell)
            packed, vT2 = c0b_jit(packed, vT2, corder)
        c1_extra = (gas_u,) if cfg.mhd else ()
        if counts_thread:
            f_c_pad, dt_c_acc, ccnt = c1_jit(packed, cell, rho, kern_c_im,
                                             a_mid, *c1_extra)
            vT3 = c2_jit(packed, cell, vT2, f_c_pad, a_mid, dt, ccnt)
        else:
            f_c_pad, dt_c_acc = c1_jit(packed, cell, rho, kern_c_im,
                                       a_mid, *c1_extra)
            vT3 = c2_jit(packed, cell, vT2, f_c_pad, a_mid, dt)
        if cfg.mhd:
            gas_u, gas_b, dt_gas_acc = g3_jit(gas_u, gas_b, f_c_pad,
                                              a_mid, dt)
        x = to_rows(packed[0:3])
        v = to_rows(vT3)
        pid = exchange_mod.pid_from_f32(packed[6])
        return SimState(
            x=x, v=v, pid=pid, np_local=np_local,
            a=jnp.asarray(a_new, jnp.float32),
            tau=jnp.asarray(tau_new, jnp.float32),
            t=jnp.asarray(t_new, jnp.float32),
            dt_old=jnp.asarray(dt, jnp.float32), nts=state.nts + 1,
            dt_f_acc=dt_f_acc, dt_pp_acc=dt_pp_acc,
            dt_pp_ext_acc=dt_pp_ext_acc, dt_c_acc=dt_c_acc,
            dt_gas_acc=dt_gas_acc,
            shake_offset=shake_offset,
            pp_overflow=pp_overflow,
            exchange_overflow=exchange_overflow,
            bucket_overflow=bucket_overflow, clamp_count=clamp_count,
            rng=rng, gas_u=gas_u, gas_b=gas_b)

    staged_sweep._stages = {
        "a1": a1_jit, "a2a": a2a_jit, "a2b": a2b_jit, "b1": b1_jit,
        "b2": b2_jit, "b3": b3_jit, "b4": b4_jit, "b5": b5_jit,
        "b5g": b5g_jit, "b5s": b5s_jit, "b5k": b5k_jit,
        "c0a": c0a_jit, "c0b": c0b_jit,
        "c1": c1_jit, "c2": c2_jit}   # for probes / precompile campaigns
    if cfg.mhd:
        staged_sweep._stages.update(
            {"g1": g1_jit, "g2": g2_jit, "g3": g3_jit})
    return staged_sweep


def make_staged_stepper(cfg: SimConfig, staged):
    """Staged sweep with ON-DEVICE dt decisions: step(state, kern_f,
    kern_c) -> state with no host reads — the host can dispatch many steps
    ahead and fence at its own cadence (the staged-mode analog of
    make_chunked_sweep; each dispatch stays small, which also avoids the
    tunnel's long-execution hangs).  `staged` is a make_staged_sweep
    product (reused, not rebuilt, so its stage compiles are shared)."""
    from . import device_timestep as dts_mod

    @jax.jit
    def decide(a, tau, t, limits):
        dt, a_mid, a_new = dts_mod.decide_dt_dev(cfg, a, limits)
        return dt, a_mid, a_new, tau + dt, t + dt

    def step(state: SimState, kern_f_im, kern_c_im) -> SimState:
        limits = (state.dt_f_acc, state.dt_pp_acc, state.dt_pp_ext_acc,
                  state.dt_c_acc, state.dt_gas_acc)
        dt, a_mid, a_new, tau_new, t_new = decide(state.a, state.tau,
                                                  state.t, limits)
        return staged(state, kern_f_im, kern_c_im, a_mid, dt, a_new,
                      tau_new, t_new)

    return step


def make_chunked_sweep(cfg: SimConfig, mesh: Mesh, sweep, chunk: int):
    """lax.scan over `chunk` sweeps with ON-DEVICE dt decisions.

    One host<->device round trip per chunk instead of per sweep — on a
    remote-tunneled TPU the per-step sync costs seconds, dominating wall
    time.  No output landing inside a chunk; the host driver sizes chunks
    to stop short of scheduled outputs (ra_max bounds per-step growth).
    """
    from . import device_timestep as dts_mod

    sweep_local = sweep._sweep_local

    import dataclasses as _dc

    def chunk_local(state: SimState, kern_f_im, kern_c_im) -> SimState:
        # counters restart each chunk: the high-water marks below must
        # reflect THIS chunk only (a stale nonzero value carried in from
        # an earlier sweep would re-trigger the driver's reactive
        # pp_autosize forever)
        z = jnp.asarray(0, jnp.int32)
        state = _dc.replace(state, pp_overflow=z, exchange_overflow=z,
                            bucket_overflow=z, clamp_count=z)

        def body(st, _):
            limits = (st.dt_f_acc, st.dt_pp_acc, st.dt_pp_ext_acc,
                      st.dt_c_acc, st.dt_gas_acc)
            dt, a_mid, a_new = dts_mod.decide_dt_dev(cfg, st.a, limits)
            st2 = sweep_local(st, kern_f_im, kern_c_im, a_mid, dt, a_new,
                              st.tau + dt, st.t + dt)
            # overflow counters become high-water marks across the chunk
            # (a single sweep's count would vanish before the host looks)
            st2 = _dc.replace(
                st2,
                pp_overflow=jnp.maximum(st2.pp_overflow, st.pp_overflow),
                exchange_overflow=jnp.maximum(st2.exchange_overflow,
                                              st.exchange_overflow),
                bucket_overflow=jnp.maximum(st2.bucket_overflow,
                                            st.bucket_overflow),
                clamp_count=jnp.maximum(st2.clamp_count, st.clamp_count))
            return st2, dt
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    specs = state_specs(mhd=cfg.mhd)
    rspec = P()
    mapped = shard_map(chunk_local, mesh=mesh,
                       in_specs=(specs, rspec, rspec),
                       out_specs=specs, check_vma=False)
    return jax.jit(mapped)


def make_fixed_chunk(cfg: SimConfig, mesh: Mesh, sweep, chunk: int):
    """lax.scan over `chunk` FIXED-dt sweeps (bench harness).

    Physics-identical to dispatching the fused sweep `chunk` times with
    the same dt (a_mid = a_new = 1, no expansion), but costs ONE tunnel
    round trip per chunk — on a remote-tunneled TPU the per-dispatch
    latency is a measurable fraction of a step.  Production runs with
    adaptive dt use make_chunked_sweep instead."""
    sweep_local = sweep._sweep_local

    import dataclasses as _dc

    def chunk_local(state: SimState, kern_f_im, kern_c_im, dt) -> SimState:
        one = jnp.float32(1.0)
        z = jnp.asarray(0, jnp.int32)
        state = _dc.replace(state, pp_overflow=z, exchange_overflow=z,
                            bucket_overflow=z, clamp_count=z)

        def body(st, _):
            st2 = sweep_local(st, kern_f_im, kern_c_im, one, dt, one,
                              st.tau + dt, st.t + dt)
            st2 = _dc.replace(
                st2,
                pp_overflow=jnp.maximum(st2.pp_overflow, st.pp_overflow),
                exchange_overflow=jnp.maximum(st2.exchange_overflow,
                                              st.exchange_overflow),
                bucket_overflow=jnp.maximum(st2.bucket_overflow,
                                            st.bucket_overflow),
                clamp_count=jnp.maximum(st2.clamp_count, st.clamp_count))
            return st2, None
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    specs = state_specs(mhd=cfg.mhd)
    rspec = P()
    mapped = shard_map(chunk_local, mesh=mesh,
                       in_specs=(specs, rspec, rspec, rspec),
                       out_specs=specs, check_vma=False)
    # donate the state: the bench loop never reuses its input, and the
    # aliasing returns ~0.6 GiB of HBM headroom at 256^3 (the fused
    # program peaks ~14/16 GiB; exe_memory.py showed aliased=0 before)
    return jax.jit(mapped, donate_argnums=0)


def compute_forces(cfg: SimConfig, state: SimState, kern_f_im, kern_c_im,
                   pp_band: int = 32) -> jnp.ndarray:
    """Total force on every particle WITHOUT kicking (single-device test
    harness: report_pair.f90 / report_force.f90 analogs).

    Returns (max_np, 3) in the particle order of `state` (not re-sorted).
    """
    nf = cfg.nf_physical_node_dim
    nc = cfg.nc_node_dim
    ms = cfg.mesh_scale
    mass_p = cfg.mass_p
    n_slots = state.x.shape[0]
    valid = jnp.arange(n_slots) < state.np_local[0]
    x = state.x
    w = jnp.where(valid, jnp.float32(mass_p), 0.0)

    if cfg.ngp:
        rho = deposit.ngp_deposit(x, w, (nf, nf, nf))
    else:
        rho = fold_pads(deposit.cic_deposit(
            x, w, (nf + 2, nf + 2, nf + 2), scale=1.0, offset=-0.5, pad=1),
            1)
    rho_halo = jnp.pad(rho, cfg.nf_buf, mode="wrap")
    if cfg.fine_fft_tiles > 1:
        if cfg.fine_potential:
            f_fine = fftconv.fine_force_potential_tiled(
                rho_halo, kern_f_im, cfg.nf_buf, nf, cfg.fine_fft_tiles)
        else:
            f_fine = fftconv.fine_force_tiled(
                rho_halo, kern_f_im, cfg.nf_buf, nf, cfg.fine_fft_tiles)
    elif cfg.fine_potential:
        f_fine = fftconv.fine_force_potential(rho_halo, kern_f_im,
                                              cfg.nf_buf, nf)
    else:
        f_fine = fftconv.fine_force(rho_halo, kern_f_im, cfg.nf_buf, nf)
    if cfg.ngp:
        force = deposit.ngp_gather(f_fine, x)
    else:
        force = deposit.cic_gather(
            jnp.pad(f_fine, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap"),
            x, scale=1.0, offset=-0.5, pad=1)

    if cfg.pp:
        sp = binning.sort_by_cell(x, valid, nf)
        inv = jnp.argsort(sp.order)
        dense_cap = max(64, int(cfg.max_np * cfg.pp_dense_cap_frac))
        res = pp.ppint_force(x[sp.order], sp.cell, sp.rank, nf ** 3,
                             pp_band, cfg.pp_dense_band, dense_cap,
                             mass_p, cfg.rsoft, cfg.pp_bias)
        force = force + res.force[inv]
    if cfg.pp_ext:
        if cfg.pp_ext_impl == "lattice":
            dense_cap = cfg.pp_ext_dense_cap_eff
            ghost_cap = (cfg.pp_ext_ghost_cap
                         or cfg.pp_ext_ghost_cap_auto())
            res = pp_lattice.pp_ext_lattice_force(
                x, valid, nf, cfg.pp_range, cfg.nf_cutoff, mass_p,
                cfg.rsoft, cfg.pp_bias, cfg.pp_ext_band_eff,
                cfg.pp_ext_tail_band_eff, dense_cap, ghost_cap)
        else:
            buckets = pp.bucket_by_coarse_cell(x, valid, nc, ms,
                                               cfg.pp_coarse_capacity)
            res = pp.pp_ext_force(x, buckets, nc, ms, cfg.pp_range,
                                  cfg.nf_cutoff, mass_p, cfg.rsoft,
                                  cfg.pp_bias)
        force = force + res.force

    ncp = nc + 2

    def fold_wrap(grid, pad):
        for ax in range(3):
            n = grid.shape[ax] - 2 * pad

            def sl(a, b):
                idx = [slice(None)] * grid.ndim
                idx[ax] = slice(a, b)
                return tuple(idx)

            grid = grid.at[sl(n, n + pad)].add(grid[sl(0, pad)])
            grid = grid.at[sl(pad, 2 * pad)].add(grid[sl(n + pad,
                                                         n + 2 * pad)])
            grid = grid[sl(pad, n + pad)]
        return grid

    rho_c = fold_wrap(deposit.cic_deposit(x, w, (ncp, ncp, ncp), scale=ms,
                                          offset=-0.5, pad=1), 1)
    f_c = fftconv.coarse_force(rho_c, kern_c_im)
    f_c_pad = jnp.pad(f_c, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap")
    force = force + deposit.cic_gather(f_c_pad, x, scale=ms, offset=-0.5,
                                       pad=1)
    return jnp.where(valid[:, None], force, 0.0)
