"""Lattice-shift PP_EXT: extended pair forces without dense bucket grids.

The bucket implementation (ops/pp.py `pp_ext_force_t`) stores a dense
`(cap, nc, nc, nc)` position grid per component plus a one-layer halo —
at production sizes the grid alone is `cap * (nc+2)^3 * 12` bytes, and
`cap` must cover the MAX coarse-cell occupancy, which grows to thousands
in collapsed cluster cores.  The representation, not the pair count, is
what OOMs (round-3 campaign: `f32[256,64,64,64]` temps at 128^3).

This module keeps everything O(N): pairs within `pp_range` fine cells are
found by **eight shifted super-cell sorts**.  With super cells of edge
`s = 2*pp_range` fine cells and per-axis shifts {0, pp_range}, any two
particles within Chebyshev distance `pp_range` share a super cell in at
least one of the 2^3 shifted lattices (two points within s/2 along an
axis are co-celled at shift 0 or s/2).  Each shifted lattice is then
exactly the same-cell banded-pair problem PPINT already solves on TPU
(`ops/pp._band_pass_cols`): sort by super-cell key, sweep sorted-order
offsets 1..band, compact over-occupied cells into a dense tail and sweep
offsets band+1..dense_band there.  A pair co-celled in m of the 8
lattices contributes with weight 1/m — m is computed pointwise from the
two positions, so the de-duplication is exact, not statistical.

Pair force matches the reference PP_EXT convention
(`source_threads/particle_mesh_threaded.f90:488-615`): same-fine-cell
pairs are EXCLUDED (plain PPINT covers them, untapered), the force is
`-(x1-x2) mass_p / (r*pp_bias)^3` times the force-matching taper
`1 - 7/4 s^3 + 3/4 s^5`, `s = r*pp_bias/nf_cutoff`, applied for
`r <= nf_cutoff + sqrt(3)`.

Cross-device pairs use GHOST PARTICLE COPIES built by three sequential
axis passes (`ghost_copies_t`) — a one-hop ppermute per face, corners
and edges covered by re-passing received ghosts, the same scheme the
reference's particle_pass.f90 uses for its buffer layer (but shipping
only the `pp_range`-deep skin, not the nf_buf ghost zone).  On a single
device the permute degenerates to the periodic wrap.  Each device
accumulates force only into its resident slots; the mirrored pair on the
neighbor device updates the mirror copy, so nothing is double-counted.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .pp import PPResult, cell_occupancy
from ..parallel.mesh import AXES
from ..parallel.exchange import _mesh_perm


def ghost_copies_t(pos_t: jnp.ndarray, valid: jnp.ndarray, nf_node: int,
                   layer: int, cap: int, axis_names=AXES):
    """Collect ghost copies of particles within `layer` fine cells of any
    node face, shifted into the local frame ([-layer, 0) and
    [nf_node, nf_node+layer) coordinates).

    Three sequential axis passes (x, then y over x+ghosts, then z) cover
    faces, edges and corners with two fixed `cap`-slot buffers per axis.
    Returns (gpos (3, 6*cap), gvalid (6*cap,), overflow ()).
    Must run inside shard_map (or with a trivial 1^3 mesh, where the
    permute is the periodic wrap).
    """
    try:
        dims = tuple(jax.lax.axis_size(n) for n in axis_names)
    except NameError:
        dims = (1, 1, 1)
    multi = any(s > 1 for s in dims)

    lanes = [pos_t[0], pos_t[1], pos_t[2]]
    val = valid
    overflow = jnp.asarray(0, jnp.int32)
    n0 = pos_t.shape[1]

    for axis in range(3):
        n = lanes[0].shape[0]
        coord = lanes[axis]
        # pad once so the fill_value index reads zeros
        padded = [jnp.concatenate([l, jnp.zeros(1, l.dtype)]) for l in lanes]
        outs = []
        for d in (-1, +1):
            mask = val & ((coord < layer) if d < 0
                          else (coord >= nf_node - layer))
            cnt = jnp.sum(mask.astype(jnp.int32))
            overflow = overflow + jnp.maximum(cnt - cap, 0)
            idx = jnp.nonzero(mask, size=cap, fill_value=n)[0]
            ok = idx < n
            seg = [p[idx] for p in padded]
            # shift into the receiving neighbor's frame: low-face copies
            # appear ABOVE the -1 neighbor's domain (+nf), high-face
            # copies BELOW the +1 neighbor's (-nf)
            seg[axis] = seg[axis] - float(d) * float(nf_node)
            pkt = jnp.stack(seg + [ok.astype(jnp.float32)])   # (4, cap)
            if multi:
                dd = tuple(d if a == axis else 0 for a in range(3))
                pkt = jax.lax.ppermute(pkt, axis_names,
                                       _mesh_perm(dims, dd))
            outs.append(pkt)
        lanes = [jnp.concatenate([lanes[i]] + [o[i] for o in outs])
                 for i in range(3)]
        val = jnp.concatenate([val] + [o[3] > 0.0 for o in outs])

    gpos = jnp.stack([l[n0:] for l in lanes])
    return gpos, val[n0:], overflow


def _ext_band_pass_cols(cx, cy, cz, cell: jnp.ndarray, lo: int, hi: int,
                        pp_range: int, nf_cutoff: int, mass_p: float,
                        rsoft: float, pp_bias: float,
                        n_active: int = 0) -> jnp.ndarray:
    """Same-super-cell EXT pair forces for sorted-order offsets in
    [lo, hi], returning SoA (3, N) force.

    Like `ops.pp._band_pass_cols` but with the PP_EXT pair term: pairs in
    the SAME fine cell are excluded, pairs beyond `pp_range` fine cells
    (Chebyshev, from floor coords) are excluded, the force carries the
    force-matching taper, and each pair is weighted by 1/m where m is the
    number of the 8 shifted lattices in which the two particles share a
    super cell (exact de-duplication across shifts).

    `n_active` > 0 restricts the LEFT partner of each pair to the first
    `n_active` entries (rights still range over the whole input): the
    chunked tail dispatch passes an overlapping window of `chunk + hi`
    particles and owns exactly the pairs whose left index is inside its
    chunk, so consecutive chunks partition the pair set.
    """
    n = cx.shape[0]
    px = jnp.concatenate([cx, jnp.zeros(hi, cx.dtype)])
    py = jnp.concatenate([cy, jnp.zeros(hi, cy.dtype)])
    pz = jnp.concatenate([cz, jnp.zeros(hi, cz.dtype)])
    cl = jnp.concatenate([cell, jnp.full((hi,), -1, cell.dtype)])
    # fine-cell floors, precomputed once per pass
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    rsoft2 = rsoft * rsoft
    bias3 = pp_bias ** 3
    h = float(pp_range)
    s = 2.0 * h
    taper_cut = nf_cutoff + float(np.sqrt(3.0))
    tscale = pp_bias / nf_cutoff
    active = (jnp.arange(n) < n_active) if n_active else None

    def maxis(f1, f2):
        """Per-axis count of shifts {0, h} where the two fine coords are
        co-celled in super cells of edge s."""
        return ((jnp.floor(f1 / s) == jnp.floor(f2 / s)).astype(jnp.float32)
                + (jnp.floor((f1 - h) / s)
                   == jnp.floor((f2 - h) / s)).astype(jnp.float32))

    def body(d, acc):
        fxm, fym, fzm, fxp, fyp, fzp = acc
        cj = jax.lax.dynamic_slice(cl, (d,), (n,))
        xj = jax.lax.dynamic_slice(px, (d,), (n,))
        yj = jax.lax.dynamic_slice(py, (d,), (n,))
        zj = jax.lax.dynamic_slice(pz, (d,), (n,))
        fxj = jax.lax.dynamic_slice(fx, (d,), (n,))
        fyj = jax.lax.dynamic_slice(fy, (d,), (n,))
        fzj = jax.lax.dynamic_slice(fz, (d,), (n,))
        dx = px[:n] - xj
        dy = py[:n] - yj
        dz = pz[:n] - zj
        r2 = dx * dx + dy * dy + dz * dz
        dcx = jnp.abs(fx[:n] - fxj)
        dcy = jnp.abs(fy[:n] - fyj)
        dcz = jnp.abs(fz[:n] - fzj)
        dcm = jnp.maximum(jnp.maximum(dcx, dcy), dcz)
        near = (dcm <= h) & (dcm > 0.0)
        ok = (cl[:n] == cj) & near & (r2 > rsoft2)
        if n_active:
            ok = ok & active
        m = jnp.maximum(maxis(fx[:n], fxj) * maxis(fy[:n], fyj)
                        * maxis(fz[:n], fzj), 1.0)
        rmag = jnp.sqrt(r2)
        ts = rmag * tscale
        taper = jnp.where(rmag <= taper_cut,
                          1.0 - 1.75 * ts ** 3 + 0.75 * ts ** 5, 1.0)
        inv = jnp.where(
            ok, mass_p * taper
            / (m * bias3 * jnp.where(ok, r2, 1.0) ** 1.5), 0.0)
        gx, gy, gz = dx * inv, dy * inv, dz * inv
        fxm += gx
        fym += gy
        fzm += gz
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
    return jnp.stack([fxp[:n] - fxm, fyp[:n] - fym, fzp[:n] - fzm])


def ghosted_positions_t(pos_t: jnp.ndarray, valid: jnp.ndarray,
                        nf_node: int, pp_range: int, ghost_cap: int,
                        axis_names=AXES):
    """Wrap resident positions into [0, nf_node) and append ghost copies
    of the pp_range-deep face skin: (ax (3, N+6*cap), aval, g_ovfl).

    Contract: resident positions live in [0, nf_node) — the sweep wraps
    (1 device) or exchanges (multi-device) before forces.  Wrap anyway:
    it is the identity for in-contract input, makes the single-device
    path exact for ANY periodic input (e.g. compute_forces on raw user
    positions, where a particle at y=-0.45 needs partners one cell
    deeper than the pp_range ghost skin), and guards the f32 mod edge
    where -eps wraps to exactly nf."""
    nff = float(nf_node)
    xw = jnp.mod(pos_t, nff)
    xw = jnp.where(xw >= nff, xw - nff, xw)
    pos_t = jnp.where(valid[None, :], xw, 0.0)
    gpos, gval, g_ovfl = ghost_copies_t(pos_t, valid, nf_node, pp_range,
                                        ghost_cap, axis_names)
    ax = jnp.concatenate([pos_t, gpos], axis=1)          # (3, M)
    aval = jnp.concatenate([valid, gval])
    return ax, aval, g_ovfl


def pp_ext_shift_force_t(ax: jnp.ndarray, aval: jnp.ndarray,
                         shift, nf_node: int, pp_range: int,
                         nf_cutoff: int, mass_p: float, rsoft: float,
                         pp_bias: float, band: int, dense_band: int,
                         dense_cap: int):
    """ONE shifted lattice's contribution to the PP_EXT force, on the
    ghost-augmented SoA positions from `ghosted_positions_t`.

    `shift` is a (3,) per-axis lattice offset (each 0 or pp_range) and
    may be a TRACED array: the staged sweep compiles this ONCE and
    dispatches it 8 times with different shift values, keeping every
    dispatch under the tunnel's per-execution wall-time ceiling (the
    all-8-shifts-in-one-module form at a grown band was the r7/r8
    TPU-worker-crash site, bench_logs/r8_ppext128_leg1.log: stage b5).

    Returns (force (3, M) in input order, tail_ovfl) — sum over the 8
    shifts (with the pointwise 1/m de-duplication inside the pair term)
    to get the full PP_EXT force.
    """
    m_tot = ax.shape[1]
    s = 2 * pp_range
    pad = float(s)
    ncs = (nf_node + 2 * s) // s + 1
    sentinel = ncs ** 3
    from .binning import rank_from_sorted

    kx = jnp.floor((ax[0] + pad - shift[0]) / s).astype(jnp.int32)
    ky = jnp.floor((ax[1] + pad - shift[1]) / s).astype(jnp.int32)
    kz = jnp.floor((ax[2] + pad - shift[2]) / s).astype(jnp.int32)
    key = jnp.where(aval, (kx * ncs + ky) * ncs + kz, sentinel)
    order = jnp.argsort(key)
    cl = key[order]
    cx, cy, cz = ax[0][order], ax[1][order], ax[2][order]
    f = _ext_band_pass_cols(cx, cy, cz, cl, 1, band, pp_range,
                            nf_cutoff, mass_p, rsoft, pp_bias)
    tail_ovfl = jnp.asarray(0, jnp.int32)
    if dense_band <= band:
        # no tail: pairs beyond the band are dropped — count them so
        # pp_autosize can react (never drop silently)
        rank = rank_from_sorted(cl)
        tail_ovfl = jnp.sum(((rank > band) & (cl < sentinel))
                            .astype(jnp.int32))
    else:
        rank = rank_from_sorted(cl)
        occ = cell_occupancy(cl, rank)
        dense = (cl < sentinel) & (occ > band + 1)
        n_dense = jnp.sum(dense.astype(jnp.int32))

        def run(_):
            idx = jnp.nonzero(dense, size=dense_cap,
                              fill_value=m_tot)[0]
            cx_p = jnp.concatenate([cx, jnp.zeros(1)])
            cy_p = jnp.concatenate([cy, jnp.zeros(1)])
            cz_p = jnp.concatenate([cz, jnp.zeros(1)])
            cl_p = jnp.concatenate(
                [cl, jnp.full((1,), sentinel + 1, cl.dtype)])
            fc = _ext_band_pass_cols(
                cx_p[idx], cy_p[idx], cz_p[idx], cl_p[idx],
                band + 1, dense_band, pp_range, nf_cutoff,
                mass_p, rsoft, pp_bias)
            fc = jnp.where((idx < m_tot)[None, :], fc, 0.0)
            return jnp.zeros((3, m_tot), jnp.float32).at[
                :, jnp.clip(idx, 0, m_tot - 1)].add(fc)

        f = f + jax.lax.cond(
            n_dense > 0, run,
            lambda _: jnp.zeros((3, m_tot), jnp.float32), None)
        tail_ovfl = (jnp.maximum(n_dense - dense_cap, 0)
                     + jnp.sum(((rank > dense_band) & (cl < sentinel))
                               .astype(jnp.int32)))
    # undo the sort (order is a permutation: scatter-set)
    force = jnp.zeros((3, m_tot), jnp.float32).at[:, order].add(f)
    return force, tail_ovfl


def pp_ext_shift_band_t(ax: jnp.ndarray, aval: jnp.ndarray,
                        shift, nf_node: int, pp_range: int,
                        nf_cutoff: int, mass_p: float, rsoft: float,
                        pp_bias: float, band: int, dense_band: int,
                        dense_cap: int, pad_extra: int = 0):
    """Band-only half of `pp_ext_shift_force_t` for the CHUNKED-tail
    staged path: runs the O(band) window over all particles and
    COMPACTS the dense remainder (super-cell occupancy > band+1) into
    fixed sorted-order buffers for `pp_ext_tail_chunk_t`, instead of
    running the whole O(dense_band) tail inside this same dispatch.

    Why: the single-dispatch tail is O(dense_cap * dense_band) pair
    lanes — ~6e11 at 256³ production clustering (dense_cap 19.3M x
    tail 32768), far beyond the tunnel's per-execution ceiling
    (campaign_r9.log ppext256-demo crash at stage b5s), while the
    completed 128³ history's largest tail dispatch (~3e10) ran fine.
    Chunking bounds every dispatch at O((chunk + dense_band) *
    dense_band) regardless of clustering.

    Returns (force (3, M) band forces in input order,
             dsx, dsy, dsz, dcl  — (dense_cap + dense_band,) compacted
                 sorted-order dense coords/keys, padded with empty
                 sentinel entries so every chunk slice is full-size,
             gidx — (dense_cap + dense_band,) input-order index of each
                 dense particle (fill M for padding),
             n_dense, tail_ovfl).
    """
    from .binning import rank_from_sorted
    m_tot = ax.shape[1]
    s = 2 * pp_range
    pad = float(s)
    ncs = (nf_node + 2 * s) // s + 1
    sentinel = ncs ** 3

    kx = jnp.floor((ax[0] + pad - shift[0]) / s).astype(jnp.int32)
    ky = jnp.floor((ax[1] + pad - shift[1]) / s).astype(jnp.int32)
    kz = jnp.floor((ax[2] + pad - shift[2]) / s).astype(jnp.int32)
    key = jnp.where(aval, (kx * ncs + ky) * ncs + kz, sentinel)
    order = jnp.argsort(key)
    cl = key[order]
    cx, cy, cz = ax[0][order], ax[1][order], ax[2][order]
    f = _ext_band_pass_cols(cx, cy, cz, cl, 1, band, pp_range,
                            nf_cutoff, mass_p, rsoft, pp_bias)
    rank = rank_from_sorted(cl)
    occ = cell_occupancy(cl, rank)
    dense = (cl < sentinel) & (occ > band + 1)
    n_dense = jnp.sum(dense.astype(jnp.int32))
    # compacted dense buffers, padded by dense_band (+ the caller's
    # chunk size via pad_extra) so the chunked dynamic_slice never
    # clamps its start back into real entries
    idx = jnp.nonzero(dense, size=dense_cap, fill_value=m_tot)[0]
    idx = jnp.concatenate(
        [idx, jnp.full((dense_band + pad_extra,), m_tot, idx.dtype)])
    cx_p = jnp.concatenate([cx, jnp.zeros(1, cx.dtype)])
    cy_p = jnp.concatenate([cy, jnp.zeros(1, cy.dtype)])
    cz_p = jnp.concatenate([cz, jnp.zeros(1, cz.dtype)])
    cl_p = jnp.concatenate([cl, jnp.full((1,), sentinel + 1, cl.dtype)])
    order_p = jnp.concatenate(
        [order, jnp.full((1,), m_tot, order.dtype)])
    tail_ovfl = (jnp.maximum(n_dense - dense_cap, 0)
                 + jnp.sum(((rank > dense_band) & (cl < sentinel))
                           .astype(jnp.int32)))
    force = jnp.zeros((3, m_tot), jnp.float32).at[:, order].add(f)
    return (force, cx_p[idx], cy_p[idx], cz_p[idx], cl_p[idx],
            order_p[idx], n_dense, tail_ovfl)


def pp_ext_tail_chunk_t(dsx, dsy, dsz, dcl, c0, chunk: int,
                        band: int, dense_band: int, pp_range: int,
                        nf_cutoff: int, mass_p: float, rsoft: float,
                        pp_bias: float):
    """ONE chunk of the dense-tail pair forces on the compacted buffers
    from `pp_ext_shift_band_t`.

    Slices [c0, c0 + chunk + dense_band) — chunk lefts plus the
    dense_band-deep right-partner overlap — and runs the window pass at
    offsets [band+1, dense_band] with lefts restricted to the chunk
    (`n_active`), so consecutive chunks partition the pair set exactly.
    `c0` may be TRACED: one compiled program serves every chunk of
    every shift.  Returns (3, chunk + dense_band) forces in slice
    order (both partners of each owned pair accumulated — scatter-add
    slices into the force accumulator across dispatches).
    """
    w = chunk + dense_band
    sx = jax.lax.dynamic_slice(dsx, (c0,), (w,))
    sy = jax.lax.dynamic_slice(dsy, (c0,), (w,))
    sz = jax.lax.dynamic_slice(dsz, (c0,), (w,))
    scl = jax.lax.dynamic_slice(dcl, (c0,), (w,))
    return _ext_band_pass_cols(sx, sy, sz, scl, band + 1, dense_band,
                               pp_range, nf_cutoff, mass_p, rsoft,
                               pp_bias, n_active=chunk)


def pp_ext_lattice_force_t(pos_t: jnp.ndarray, valid: jnp.ndarray,
                           nf_node: int, pp_range: int, nf_cutoff: int,
                           mass_p: float, rsoft: float, pp_bias: float,
                           band: int, dense_band: int, dense_cap: int,
                           ghost_cap: int, axis_names=AXES) -> PPResult:
    """Extended pp force over the pp_range fine-cell neighborhood via 8
    shifted super-cell sorts, on SoA (3, N) positions, returning SoA
    (3, N) force for the resident slots.

    Memory is O(N + 6*ghost_cap) regardless of clustering; over-occupied
    super cells (collapsed halos) spill into the same dense-tail scheme
    as PPINT, so no pair is dropped up to `dense_band` occupancy.
    Overflow counts ghost-buffer drops plus (max over shifts) dense-tail
    residuals.
    """
    n = pos_t.shape[1]
    h = float(pp_range)
    ax, aval, g_ovfl = ghosted_positions_t(pos_t, valid, nf_node,
                                           pp_range, ghost_cap,
                                           axis_names)
    force = jnp.zeros((3, ax.shape[1]), jnp.float32)
    tail_ovfl = jnp.asarray(0, jnp.int32)
    for sx in (0.0, h):
        for sy in (0.0, h):
            for sz in (0.0, h):
                f, ov = pp_ext_shift_force_t(
                    ax, aval, jnp.array([sx, sy, sz], jnp.float32),
                    nf_node, pp_range, nf_cutoff, mass_p, rsoft,
                    pp_bias, band, dense_band, dense_cap)
                force = force + f
                tail_ovfl = jnp.maximum(tail_ovfl, ov)

    force = force[:, :n]
    force = jnp.where(valid[None, :], force, 0.0)
    fmax = jnp.sqrt(jnp.max(jnp.sum(force * force, axis=0)))
    return PPResult(force=force, fmax=fmax,
                    overflow=g_ovfl + tail_ovfl)


def pp_ext_lattice_force(pos: jnp.ndarray, valid: jnp.ndarray,
                         nf_node: int, pp_range: int, nf_cutoff: int,
                         mass_p: float, rsoft: float, pp_bias: float,
                         band: int, dense_band: int, dense_cap: int,
                         ghost_cap: int, axis_names=AXES) -> PPResult:
    """(N, 3) wrapper over `pp_ext_lattice_force_t`."""
    res = pp_ext_lattice_force_t(pos.T, valid, nf_node, pp_range,
                                 nf_cutoff, mass_p, rsoft, pp_bias, band,
                                 dense_band, dense_cap, ghost_cap,
                                 axis_names)
    return PPResult(force=res.force.T, fmax=res.fmax,
                    overflow=res.overflow)
