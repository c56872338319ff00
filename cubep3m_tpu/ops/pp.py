"""Short-range particle-particle forces.

Replaces the reference's per-coarse-cell linked-list pair loops
(`source_threads/particle_mesh_threaded.f90:322-362` PPINT,
`:488-615` PP_EXT) and the CUDA brute-force offload
(`source_threads/nbody-ueli.cu`).

Two TPU-native strategies:

* **PPINT** (pairs sharing a fine mesh cell): particles are kept sorted by
  fine-cell key (ops/binning.py), so same-cell partners are contiguous.  We
  sweep a static band of width `band` over the sorted array — a fully
  vectorized shifted-difference loop with no materialized pair matrices.
  Cells denser than the band (z~0 halo cores) are handled by a second
  *dense-tail* pass (`ppint_dense_tail`): their particles are compacted
  into a fixed-capacity buffer and swept with offsets band+1..dense_band,
  so no pair is ever dropped up to `dense_band` occupancy — the reference
  never drops pairs either (it sizes `max_llf` and aborts,
  `particle_mesh_threaded.f90:280-284`).  Residual overflow (occupancy >
  dense_band+1, or the dense buffer filling up) is counted and surfaced.

* **PP_EXT** (pairs in distinct fine cells within `pp_range`): fixed-capacity
  buckets per coarse cell; each bucket interacts with its 3^3 coarse-cell
  neighborhood (pp_range <= mesh_scale guarantees adjacency suffices),
  scanned in cell chunks to bound memory.  Same-fine-cell pairs are excluded:
  the reference covers them with untapered PPINT (its neighbor loop starts at
  ip=i+1, `:488-520`).

Force convention (reference `:340-346`): pair force on particle 1 from 2 is
`-(x1-x2)/(r*pp_bias)^3 * mass_p` for r > rsoft (zero below); PP_EXT
multiplies by the force-matching taper `1 - 7/4 s^3 + 3/4 s^5`,
`s = r*pp_bias/nf_cutoff`, for r <= nf_cutoff + sqrt(3) (`:558-565`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp


class PPResult(NamedTuple):
    force: jnp.ndarray        # (N, 3) accumulated pp force (mass_p included)
    fmax: jnp.ndarray         # scalar: max per-particle |force|
    overflow: jnp.ndarray     # scalar int32: particles whose pairs may be missed


def _pair_force(sep: jnp.ndarray, rmag: jnp.ndarray, ok: jnp.ndarray,
                mass_p: float, pp_bias: float) -> jnp.ndarray:
    """force_pp = mass_p * sep/(r*pp_bias)^3, masked by ok."""
    r3 = (rmag * pp_bias) ** 3
    r3 = jnp.where(ok, r3, 1.0)
    return jnp.where(ok[..., None], (mass_p / r3)[..., None] * sep, 0.0)


def _band_pass(pos: jnp.ndarray, cell: jnp.ndarray, lo: int, hi: int,
               mass_p: float, rsoft: float, pp_bias: float) -> jnp.ndarray:
    """Same-cell pair forces for sorted-order offsets d in [lo, hi].

    pos: (N,3) sorted by `cell`; cell: (N,) sorted keys (padding/sentinel
    slots must either carry unique keys or coincide in position so r <=
    rsoft excludes them).  Returns (N,3) accumulated force.

    Implemented as a fori_loop over band offsets on structure-of-arrays
    (three (N,) lanes) with padded Newton-3rd-law accumulators: bounded
    live memory (an unrolled roll-based version kept O(band) (N,3) slices
    alive and OOMed at production sizes).
    """
    return _band_pass_cols(pos[:, 0], pos[:, 1], pos[:, 2], cell, lo, hi,
                           mass_p, rsoft, pp_bias, soa_out=False)


def _band_pass_cols(cx, cy, cz, cell: jnp.ndarray, lo: int, hi: int,
                    mass_p: float, rsoft: float, pp_bias: float,
                    soa_out: bool) -> jnp.ndarray:
    """Column-lane core of `_band_pass`; soa_out returns (3, N)."""
    n = cx.shape[0]
    # SoA lanes, padded by `hi` with an unmatchable sentinel cell
    px = jnp.concatenate([cx, jnp.zeros(hi, cx.dtype)])
    py = jnp.concatenate([cy, jnp.zeros(hi, cy.dtype)])
    pz = jnp.concatenate([cz, jnp.zeros(hi, cz.dtype)])
    cl = jnp.concatenate([cell, jnp.full((hi,), -1, cell.dtype)])
    rsoft2 = rsoft * rsoft
    bias3 = pp_bias ** 3

    def body(d, acc):
        fxm, fym, fzm, fxp, fyp, fzp = acc
        cj = jax.lax.dynamic_slice(cl, (d,), (n,))
        xj = jax.lax.dynamic_slice(px, (d,), (n,))
        yj = jax.lax.dynamic_slice(py, (d,), (n,))
        zj = jax.lax.dynamic_slice(pz, (d,), (n,))
        dx = px[:n] - xj
        dy = py[:n] - yj
        dz = pz[:n] - zj
        r2 = dx * dx + dy * dy + dz * dz
        ok = (cl[:n] == cj) & (r2 > rsoft2)
        # f = mass_p * sep / (r*pp_bias)^3, as a scalar multiplier on sep
        inv = jnp.where(ok, mass_p / (bias3 * jnp.where(ok, r2, 1.0) ** 1.5),
                        0.0)
        gx, gy, gz = dx * inv, dy * inv, dz * inv
        # F_i -= g (attract toward j)
        fxm += gx
        fym += gy
        fzm += gz
        # F_j += g at j = i + d (padded accumulators)
        fxp = jax.lax.dynamic_update_slice(
            fxp, jax.lax.dynamic_slice(fxp, (d,), (n,)) + gx, (d,))
        fyp = jax.lax.dynamic_update_slice(
            fyp, jax.lax.dynamic_slice(fyp, (d,), (n,)) + gy, (d,))
        fzp = jax.lax.dynamic_update_slice(
            fzp, jax.lax.dynamic_slice(fzp, (d,), (n,)) + gz, (d,))
        return fxm, fym, fzm, fxp, fyp, fzp

    zero_n = jnp.zeros((n,), cx.dtype)
    zero_p = jnp.zeros((n + hi,), cx.dtype)
    fxm, fym, fzm, fxp, fyp, fzp = jax.lax.fori_loop(
        lo, hi + 1, body, (zero_n, zero_n, zero_n, zero_p, zero_p, zero_p))
    return jnp.stack([fxp[:n] - fxm, fyp[:n] - fym, fzp[:n] - fzm],
                     axis=0 if soa_out else -1)


def cell_occupancy(cell: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Per-particle occupancy of its own cell, from sorted keys + ranks
    (backward min-scan finds each cell run's end index)."""
    n = cell.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    endb = jnp.concatenate([cell[:-1] != cell[1:],
                            jnp.ones((1,), bool)])
    # native reverse cummin (associative_scan wedges the remote compiler
    # at production sizes — see binning.rank_from_sorted)
    end = jax.lax.cummin(jnp.where(endb, idx, n - 1), reverse=True)
    return end - (idx - rank) + 1


def ppint_band_force(pos: jnp.ndarray, cell: jnp.ndarray, rank: jnp.ndarray,
                     ncells: int, band: int, mass_p: float, rsoft: float,
                     pp_bias: float) -> PPResult:
    """Same-fine-cell pair forces over a cell-sorted particle array,
    covering pair offsets 1..band (cells denser than band+1 need
    `ppint_dense_tail` for the rest; overflow here counts the particles
    whose pairs the band alone would miss)."""
    real = cell < ncells
    force = _band_pass(pos, cell, 1, band, mass_p, rsoft, pp_bias)
    # padding slots share one sentinel key and can carry garbage copies of
    # real coordinates (uncompacted exchange buffers) — their fake mutual
    # forces must not pollute fmax/dt_pp
    force = jnp.where(real[:, None], force, 0.0)
    fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=-1)))
    overflow = jnp.sum(((rank > band) & real).astype(jnp.int32))
    return PPResult(force=force, fmax=fmax, overflow=overflow)


def ppint_dense_tail(pos: jnp.ndarray, cell: jnp.ndarray, rank: jnp.ndarray,
                     occ: jnp.ndarray, ncells: int, band: int,
                     dense_band: int, cap: int, mass_p: float, rsoft: float,
                     pp_bias: float) -> PPResult:
    """The pairs the band pass missed: same-cell pairs at sorted-order
    offset > band.

    Particles in cells with occupancy > band+1 are compacted (whole cells,
    order preserved) into a fixed `cap`-slot buffer; a second band pass with
    offsets band+1..dense_band runs there.  Overflow counts particles whose
    pairs are STILL incomplete: dense particles beyond `cap`, or occupancy
    beyond dense_band+1.  Skipped entirely (lax.cond) while no dense cells
    exist — the common case until halos collapse.
    """
    n = pos.shape[0]
    dense = (cell < ncells) & (occ > band + 1)
    n_dense = jnp.sum(dense.astype(jnp.int32))

    def run(_):
        idx = jnp.nonzero(dense, size=cap, fill_value=n)[0]
        pos_pad = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)])
        # fill slots share one sentinel key but coincide at the origin, so
        # r <= rsoft excludes their mutual "pairs"
        cell_pad = jnp.concatenate(
            [cell, jnp.full((1,), ncells + 1, cell.dtype)])
        cpos = pos_pad[idx]
        ccell = cell_pad[idx]
        fc = _band_pass(cpos, ccell, band + 1, dense_band, mass_p, rsoft,
                        pp_bias)
        fc = jnp.where((idx < n)[:, None], fc, 0.0)
        return jnp.zeros((n, 3), pos.dtype).at[jnp.clip(idx, 0, n - 1)].add(
            fc)

    force = jax.lax.cond(n_dense > 0, run,
                         lambda _: jnp.zeros((n, 3), pos.dtype), None)
    fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=-1)))
    overflow = (jnp.maximum(n_dense - cap, 0)
                + jnp.sum(((rank > dense_band) & (cell < ncells))
                          .astype(jnp.int32)))
    return PPResult(force=force, fmax=fmax, overflow=overflow)


def ppint_force(pos: jnp.ndarray, cell: jnp.ndarray, rank: jnp.ndarray,
                ncells: int, band: int, dense_band: int, dense_cap: int,
                mass_p: float, rsoft: float, pp_bias: float,
                use_pallas: bool = False,
                pallas_interpret: bool = False) -> PPResult:
    """Complete PPINT force: band pass + dense tail.  Overflow counts only
    pairs genuinely dropped (occupancy > dense_band+1 or dense buffer
    exhausted).  `use_pallas` runs the band pass as the fused Pallas TPU
    kernel (ops/pp_pallas.py) instead of the XLA fori_loop."""
    if use_pallas:
        from . import pp_pallas
        force = pp_pallas.ppint_band_force_pallas(
            pos, cell, band, mass_p, rsoft, pp_bias,
            interpret=pallas_interpret)
        real = cell < ncells
        force = jnp.where(real[:, None], force, 0.0)  # see band-force note
        res = PPResult(
            force=force,
            fmax=jnp.sqrt(jnp.max(jnp.sum(force * force, axis=-1))),
            overflow=jnp.sum(((rank > band) & real).astype(jnp.int32)))
    else:
        res = ppint_band_force(pos, cell, rank, ncells, band, mass_p,
                               rsoft, pp_bias)
    if dense_band <= band:
        return res
    occ = cell_occupancy(cell, rank)
    tail = ppint_dense_tail(pos, cell, rank, occ, ncells, band, dense_band,
                            dense_cap, mass_p, rsoft, pp_bias)
    force = res.force + tail.force
    fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=-1)))
    return PPResult(force=force, fmax=fmax, overflow=tail.overflow)


def ppint_force_t(pos_t: jnp.ndarray, cell: jnp.ndarray, rank: jnp.ndarray,
                  ncells: int, band: int, dense_band: int, dense_cap: int,
                  mass_p: float, rsoft: float, pp_bias: float,
                  use_pallas: bool = False,
                  pallas_interpret: bool = False) -> PPResult:
    """`ppint_force` for SoA (3, N) positions, returning SoA (3, N) force
    (the staged 256^3+ path: (M, 3) intermediates lane-pad 42x on TPU)."""
    real = cell < ncells
    if use_pallas:
        from . import pp_pallas
        force = pp_pallas.ppint_band_force_pallas_cols(
            pos_t[0], pos_t[1], pos_t[2], cell, band, mass_p, rsoft,
            pp_bias, interpret=pallas_interpret, soa_out=True)
    else:
        force = _band_pass_cols(pos_t[0], pos_t[1], pos_t[2], cell, 1,
                                band, mass_p, rsoft, pp_bias, soa_out=True)
    force = jnp.where(real[None, :], force, 0.0)  # see band-force note
    overflow = jnp.sum(((rank > band) & real).astype(jnp.int32))
    if dense_band > band:
        n = pos_t.shape[1]
        occ = cell_occupancy(cell, rank)
        dense = real & (occ > band + 1)
        n_dense = jnp.sum(dense.astype(jnp.int32))

        def run(_):
            idx = jnp.nonzero(dense, size=dense_cap, fill_value=n)[0]
            pos_pad = jnp.concatenate(
                [pos_t, jnp.zeros((3, 1), pos_t.dtype)], axis=1)
            cell_pad = jnp.concatenate(
                [cell, jnp.full((1,), ncells + 1, cell.dtype)])
            cpos = pos_pad[:, idx]
            ccell = cell_pad[idx]
            fc = _band_pass_cols(cpos[0], cpos[1], cpos[2], ccell,
                                 band + 1, dense_band, mass_p, rsoft,
                                 pp_bias, soa_out=True)
            fc = jnp.where((idx < n)[None, :], fc, 0.0)
            return jnp.zeros((3, n), pos_t.dtype).at[
                :, jnp.clip(idx, 0, n - 1)].add(fc)

        tail = jax.lax.cond(n_dense > 0, run,
                            lambda _: jnp.zeros((3, n), pos_t.dtype), None)
        force = force + tail
        overflow = (jnp.maximum(n_dense - dense_cap, 0)
                    + jnp.sum(((rank > dense_band) & real)
                              .astype(jnp.int32)))
    fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=0)))
    return PPResult(force=force, fmax=fmax, overflow=overflow)


# ----------------------------------------------------------------------
# PP_EXT: coarse-cell buckets x 3^3 neighborhood
# ----------------------------------------------------------------------
class Buckets(NamedTuple):
    index: jnp.ndarray       # (nc, nc, nc, cap) int32 particle ids, -1 empty
    overflow: jnp.ndarray    # scalar int32: particles dropped from buckets


def bucket_by_coarse_cell(pos: jnp.ndarray, valid: jnp.ndarray,
                          nc_node: int, mesh_scale: int,
                          capacity: int) -> Buckets:
    """Assign particles to fixed-capacity coarse-cell buckets via sort
    ((N, 3) wrapper over the SoA core)."""
    return bucket_by_coarse_cell_t(pos.T, valid, nc_node, mesh_scale,
                                   capacity)


def bucket_by_coarse_cell_t(pos_t: jnp.ndarray, valid: jnp.ndarray,
                            nc_node: int, mesh_scale: int,
                            capacity: int) -> Buckets:
    """`bucket_by_coarse_cell` for SoA (3, N) positions (the staged path —
    (M, 3) intermediates lane-pad 42x on TPU)."""
    n = pos_t.shape[1]
    c = jnp.clip(jnp.floor(pos_t / mesh_scale).astype(jnp.int32),
                 0, nc_node - 1)
    key = (c[0] * nc_node + c[1]) * nc_node + c[2]
    ncells = nc_node ** 3
    key = jnp.where(valid, key, ncells)
    order = jnp.argsort(key)
    skey = key[order]
    first = jnp.searchsorted(skey, skey, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (skey < ncells) & (rank < capacity)
    slot = jnp.where(ok, skey * capacity + rank, ncells * capacity)
    flat = jnp.full(ncells * capacity + 1, -1, dtype=jnp.int32)
    flat = flat.at[slot].set(jnp.where(ok, order.astype(jnp.int32), -1))
    overflow = jnp.sum(((skey < ncells) & (rank >= capacity)).astype(jnp.int32))
    return Buckets(index=flat[:-1].reshape(nc_node, nc_node, nc_node,
                                           capacity),
                   overflow=overflow)


def pp_ext_force(pos: jnp.ndarray, buckets: Buckets, nc_node: int,
                 mesh_scale: int, pp_range: int, nf_cutoff: int,
                 mass_p: float, rsoft: float, pp_bias: float,
                 chunk: int = 256) -> PPResult:
    """Extended pp force, (N, 3) wrapper over the SoA core below."""
    res = pp_ext_force_t(pos.T, buckets, nc_node, mesh_scale, pp_range,
                         nf_cutoff, mass_p, rsoft, pp_bias, chunk=chunk)
    return PPResult(force=res.force.T, fmax=res.fmax,
                    overflow=res.overflow)


def pp_ext_force_t(pos_t: jnp.ndarray, buckets: Buckets, nc_node: int,
                   mesh_scale: int, pp_range: int, nf_cutoff: int,
                   mass_p: float, rsoft: float, pp_bias: float,
                   chunk: int = 256) -> PPResult:
    """Extended pp force over the pp_range fine-cell neighborhood, on SoA
    (3, N) positions, returning SoA (3, N) force.

    The bucket grid is halo-padded by one coarse layer from neighbor
    devices (parallel/halo.py ppermute; periodic wrap on a single device),
    with received positions shifted into the local frame — the ghost layer
    the reference ships as buffer particles (`particle_pass.f90` +
    hoc_fine over tile+pp_range, particle_mesh_threaded.f90:393-438).
    Must run inside shard_map (or with a trivial 1^3 mesh).
    """
    from ..parallel import halo as halo_mod

    cap = buckets.index.shape[-1]
    ncells = nc_node ** 3
    nf_node = nc_node * mesh_scale
    ncp = nc_node + 2
    idx_flat = buckets.index.reshape(ncells, cap)
    bval = idx_flat >= 0
    idxc = jnp.clip(idx_flat, 0, pos_t.shape[1] - 1)
    far = 4.0 * nf_node + 1e4
    # COMPONENT-WISE throughout: any (..., cap, 3)-shaped tensor tiles its
    # last two dims on TPU and lane-pads 3 -> 128 (42x memory — the old
    # (B, cap, cap, 3) pair tensors were 8+ GB per chunk at 128^3)
    bx = jnp.where(bval, pos_t[0][idxc], far)    # (ncells, cap)
    by = jnp.where(bval, pos_t[1][idxc], far)
    bz = jnp.where(bval, pos_t[2][idxc], far)

    def to_grid(c):
        return jnp.moveaxis(
            c.reshape(nc_node, nc_node, nc_node, cap), 3, 0)

    # one halo exchange for all 3 components (3*cap, nc, nc, nc)
    gp = halo_mod.halo_pad(
        jnp.concatenate([to_grid(bx), to_grid(by), to_grid(bz)]), 1)
    gpx, gpy, gpz = gp[:cap], gp[cap:2 * cap], gp[2 * cap:]
    # shift received layers into the local coordinate frame
    edge = jnp.zeros(ncp, jnp.float32)
    edge = edge.at[0].set(-float(nf_node)).at[-1].set(float(nf_node))
    gpx = gpx + edge[None, :, None, None]
    gpy = gpy + edge[None, None, :, None]
    gpz = gpz + edge[None, None, None, :]

    taper_cut = nf_cutoff + float(np.sqrt(3.0))
    bias3 = pp_bias ** 3

    def interact(pix, piy, piz, pjx, pjy, pjz):
        """Per-component force on bucket-i particles from bucket-j ones;
        all inputs (B, cap)."""
        dx = pix[:, :, None] - pjx[:, None, :]
        dy = piy[:, :, None] - pjy[:, None, :]
        dz = piz[:, :, None] - pjz[:, None, :]
        r2 = dx * dx + dy * dy + dz * dz
        rmag = jnp.sqrt(r2)
        dcx = jnp.abs(jnp.floor(pix).astype(jnp.int32)[:, :, None]
                      - jnp.floor(pjx).astype(jnp.int32)[:, None, :])
        dcy = jnp.abs(jnp.floor(piy).astype(jnp.int32)[:, :, None]
                      - jnp.floor(pjy).astype(jnp.int32)[:, None, :])
        dcz = jnp.abs(jnp.floor(piz).astype(jnp.int32)[:, :, None]
                      - jnp.floor(pjz).astype(jnp.int32)[:, None, :])
        near = ((jnp.maximum(jnp.maximum(dcx, dcy), dcz) <= pp_range)
                & ((dcx | dcy | dcz) != 0))
        ok = near & (rmag > rsoft)
        s = rmag * pp_bias / nf_cutoff
        taper = jnp.where(rmag <= taper_cut,
                          1.0 - 1.75 * s ** 3 + 0.75 * s ** 5, 1.0)
        inv = jnp.where(
            ok, mass_p / (bias3 * jnp.where(ok, r2, 1.0) ** 1.5),
            0.0) * taper
        return (-jnp.sum(dx * inv, 2), -jnp.sum(dy * inv, 2),
                -jnp.sum(dz * inv, 2))                    # attract

    fbx = jnp.zeros((ncells, cap), dtype=jnp.float32)
    fby = jnp.zeros((ncells, cap), dtype=jnp.float32)
    fbz = jnp.zeros((ncells, cap), dtype=jnp.float32)
    nchunk = max(1, -(-ncells // chunk))
    pad_cells = nchunk * chunk - ncells

    def chunked(a):
        a = jnp.pad(a, [(0, pad_cells)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape(nchunk, chunk, *a.shape[1:])

    pix_c, piy_c, piz_c = chunked(bx), chunked(by), chunked(bz)
    n = nc_node
    for ox in (0, 1, 2):
        for oy in (0, 1, 2):
            for oz in (0, 1, 2):
                def nb(g):
                    blk = g[:, ox:ox + n, oy:oy + n, oz:oz + n]
                    return chunked(
                        jnp.moveaxis(blk, 0, 3).reshape(ncells, cap))

                def scan_body(carry, xs):
                    return carry, interact(*xs)

                _, (fx, fy, fz) = jax.lax.scan(
                    scan_body, None,
                    (pix_c, piy_c, piz_c, nb(gpx), nb(gpy), nb(gpz)))
                fbx = fbx + fx.reshape(-1, cap)[:ncells]
                fby = fby + fy.reshape(-1, cap)[:ncells]
                fbz = fbz + fz.reshape(-1, cap)[:ncells]

    # scatter bucket forces back to particle slots (per component —
    # (M, 3) update rows would lane-pad; (N,) scatters stay compact)
    flat_idx = idx_flat.reshape(-1)
    ok = flat_idx >= 0
    tgt = jnp.where(ok, flat_idx, 0)
    comps = []
    for fb in (fbx, fby, fbz):
        comps.append(jnp.zeros(pos_t.shape[1], jnp.float32).at[tgt].add(
            jnp.where(ok, fb.reshape(-1), 0.0)))
    force = jnp.stack(comps, axis=0)
    fmax = jnp.sqrt(jnp.max(comps[0] ** 2 + comps[1] ** 2
                            + comps[2] ** 2))
    return PPResult(force=force, fmax=fmax, overflow=buckets.overflow)
