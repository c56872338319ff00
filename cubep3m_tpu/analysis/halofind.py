"""Runtime spherical-overdensity halofinder.

Replaces `source_threads/halofind.f90` (+`initialize_halofind` :795-864 and
the offline `utils/halofinder/halofind.f90`): density peaks above
`den_peak_cutoff` grown over radially-sorted shells until the enclosed mean
overdensity drops below `halo_odc` (exclusive mass assignment — consumed
cells are zeroed), TIS-model mass rescaling for overdensity overshoot
(halofind.f90:718-730, table regenerated in tis_mass_overdensity_table),
then per-halo particle statistics (center of mass, bulk velocity, angular
momentum, velocity dispersion, inertia tensor, 50 most-bound PIDs by
E = v^2/2 - G M/r) gathered via cell-sorted range queries.

TPU split: density + local-maxima + parabolic peak interpolation run on
device (maxpool-style reductions); the sphere growth is inherently
sequential (mass exclusivity) and runs vectorized-per-shell on host — the
reference is serial-per-tile here too, and halofinds happen only at a few
scheduled redshifts.

Default thresholds follow `cubepm.par:101-144`: halo_odc=178,
den_peak_cutoff=100, min_halo_particles=20 (mass cut halo_mass>160 at
write-out, halofind.f90:528-534).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import SimState


_CATALOG_FIELDS = [
    ("peak_pos", "<f4", (3,)),     # interpolated density peak [cells]
    ("x_mean", "<f4", (3,)),       # particle center of mass
    ("v_mean", "<f4", (3,)),       # bulk velocity
    ("l_cm", "<f4", (3,)),         # specific angular momentum about CM
    ("v2_wrt_halo", "<f4", (3,)),  # velocity dispersion components
    ("radius_calc", "<f4"),        # SO radius [cells]
    ("halo_mass", "<f4"),          # TIS-rescaled SO mass (halofind.f90:725)
    ("imass", "<f4"),              # particle-counted mass
    ("halo_mass1", "<f4"),         # raw grid mass within the SO radius
                                   # (the reference's unrescaled amtot)
    ("halo_mass_pk", "<f4"),       # mass at the peak cell
    ("var_x", "<f4", (3,)),        # position variance
    ("i_ij", "<f4", (6,)),         # inertia tensor (xx,yy,zz,xy,xz,yz)
    ("pid_bound", "<i4", (50,)),   # 50 most-bound member PIDs, by
                                   # E = v^2/2 - G M/r like the reference
                                   # (halofind.f90:473,495-516)
]
CATALOG_DTYPE = np.dtype(_CATALOG_FIELDS)


@dataclasses.dataclass
class HalofindParams:
    halo_odc: float = 178.0
    den_peak_cutoff: float = 100.0
    min_halo_particles: float = 20.0
    mass_cut: float = 160.0        # write cut (halofind.f90:528)
    nc_halo_max: int = 64          # max SO radius in cells
    refine: int = 1                # density-mesh refinement (finer-grid var.)
    tis_rescale: bool = True       # TIS M(Delta) mass correction
    n_bound: int = 50              # most-bound PIDs stored (N_p)
    per_device: Optional[bool] = None
    # per_device: grow halos on per-device halo-padded density blocks
    # (the reference's per-tile scheme, halofind.f90:564-777) instead of
    # pulling the GLOBAL grid to host.  Only per-device blocks cross the
    # link — required once the refined global grid outgrows the host pull
    # (512^3 refine 2 = 4 GiB at ~50 MB/s).  Mass exclusivity is then
    # per-device like the reference's per-tile growth: two halos on
    # different devices can both consume the same pad-region mass (the
    # global path serializes them).  None = auto: per-device when the
    # global grid exceeds 2 GiB.


_TIS_TABLE = None


def tis_mass_overdensity_table(n: int = 20000, zeta_max: float = 200.0
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """(mean_overdensity, dimensionless_mass) curve of the TIS + 1/r^2 halo
    model, regenerated from the published analytic fit (NOT copied from the
    reference's table_M_Delta.dat, halofind.f90:846-861).

    Truncated isothermal sphere (Shapiro, Iliev & Raga 1999 eq. 12):
      rho(z)/rho0 = A/(a^2+z^2) - B/(b^2+z^2),
      A=21.38, a^2=9.08, B=19.81, b^2=14.62, truncation z_t=29.4,
      central density rho0 = 1.8e4 * rho_mean;
    extended beyond z_t as rho ~ 1/r^2 (the '+1/r^2' part).
    Enclosed dimensionless mass m(z) = int_0^z (rho/rho0) z'^2 dz' has a
    closed form; mean enclosed overdensity Delta(z) = 1.8e4 * 3 m / z^3.
    Cross-checks: Delta(z_t) = 129 (the known TIS mean overdensity ~130)
    and m(Delta=178) = 53.9 (the reference's halo_nondim_mass=53.92,
    cubepm.par:112).
    """
    global _TIS_TABLE
    if _TIS_TABLE is not None:
        return _TIS_TABLE
    A, a2, B, b2, zt = 21.38, 9.08, 19.81, 14.62, 29.4
    a, b = np.sqrt(a2), np.sqrt(b2)
    z = np.linspace(zeta_max / n, zeta_max, n)

    def m_fit(zz):
        return (A * (zz - a * np.arctan(zz / a))
                - B * (zz - b * np.arctan(zz / b)))

    rho_t = A / (a2 + zt ** 2) - B / (b2 + zt ** 2)
    m = np.where(z <= zt, m_fit(z), m_fit(zt) + rho_t * zt ** 2 * (z - zt))
    delta = 1.8e4 * 3.0 * m / z ** 3
    _TIS_TABLE = (delta, m)
    return _TIS_TABLE


def tis_rescale_mass(mass: np.ndarray, actual_odc: np.ndarray,
                     target_odc: float) -> np.ndarray:
    """Correct SO masses for overdensity overshoot through the TIS model
    (halofind.f90:718-730): the growth stops at mean overdensity
    `actual_odc` >= `target_odc`; scale the enclosed mass to the target
    isodensity radius along the TIS m(Delta) curve:
      m_corrected = m_measured * m_tis(target) / m_tis(actual).
    Halos whose actual overdensity falls outside the tabulated curve are
    left unrescaled (the reference skips them when no table crossing is
    found)."""
    delta, m = tis_mass_overdensity_table()
    # delta is decreasing in radius; np.interp needs increasing x
    m_of = lambda d: np.interp(-np.asarray(d), -delta, m)
    ok = (actual_odc <= delta[0]) & (actual_odc >= delta[-1])
    scale = np.where(ok, m_of(target_odc) / m_of(actual_odc), 1.0)
    return mass * scale


def _multi_range_gather(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, e) for every (s, e) pair, vectorized."""
    lens = ends - starts
    sel = lens > 0
    starts, lens = starts[sel], lens[sel]
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    out = np.ones(total, np.int64)
    heads = np.zeros(lens.size, np.int64)
    heads[1:] = np.cumsum(lens)[:-1]
    out[heads] = starts
    out[heads[1:]] -= starts[:-1] + lens[:-1] - 1
    return np.cumsum(out)


def _sphere_cell_offsets(ri: int, _cache={}) -> np.ndarray:
    """Integer cell offsets whose cube intersects a radius-(ri+1) sphere
    centered anywhere in the middle cell (cached per radius)."""
    if ri in _cache:
        return _cache[ri]
    g = np.arange(-ri - 1, ri + 2)
    ox, oy, oz = np.meshgrid(g, g, g, indexing="ij")
    off = np.stack([ox.ravel(), oy.ravel(), oz.ravel()], 1)
    # min distance from the center cell to each offset cell's cube
    d = np.maximum(np.abs(off) - 1.0, 0.0)
    keep = (d ** 2).sum(1) <= (ri + 1) ** 2
    _cache[ri] = off[keep].astype(np.int64)
    return _cache[ri]


def _shell_offsets(rmax: int) -> Tuple[np.ndarray, np.ndarray]:
    """Radially sorted integer offsets within radius rmax
    (initialize_halofind's idist/rdist tables)."""
    g = np.arange(-rmax, rmax + 1)
    ox, oy, oz = np.meshgrid(g, g, g, indexing="ij")
    off = np.stack([ox.ravel(), oy.ravel(), oz.ravel()], 1)
    r = np.sqrt((off ** 2).sum(1))
    sel = r <= rmax
    off, r = off[sel], r[sel]
    order = np.argsort(r)
    return off[order].astype(np.int64), r[order]


def find_peaks(rho: jnp.ndarray, cutoff: float):
    """26-neighborhood local maxima above cutoff on a HOST/global grid
    (single-device harness; production path is
    device_fields.peaks_device, which never pulls the peak mask).

    Returns (indices (K,3) int64, values (K,)) density-sorted desc.
    """
    m = rho
    neigh_max = None
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == dy == dz == 0:
                    continue
                r = jnp.roll(m, (dx, dy, dz), axis=(0, 1, 2))
                neigh_max = r if neigh_max is None else jnp.maximum(
                    neigh_max, r)
    # >= so tied plateau maxima both qualify (the exclusive growth
    # consumes one and skips the other; strict > drops both)
    is_peak = (m >= neigh_max) & (m > cutoff)
    idx = np.argwhere(np.asarray(is_peak))
    vals = np.asarray(m)[tuple(idx.T)]
    order = np.argsort(-vals)
    return idx[order], vals[order]


def _para_interp(rho: np.ndarray, ijk: np.ndarray) -> np.ndarray:
    """Parabolic sub-cell peak position (halofind.f90 para_inter :780-790)."""
    n = rho.shape[0]
    pos = ijk.astype(np.float64) + 0.5
    for ax in range(3):
        up = ijk.copy()
        dn = ijk.copy()
        up[:, ax] = (up[:, ax] + 1) % n
        dn[:, ax] = (dn[:, ax] - 1) % n
        f0 = rho[tuple(dn.T)]
        f1 = rho[tuple(ijk.T)]
        f2 = rho[tuple(up.T)]
        denom = f0 - 2 * f1 + f2
        shift = np.where(np.abs(denom) > 1e-12,
                         0.5 * (f0 - f2) / np.where(denom == 0, 1, denom),
                         0.0)
        pos[:, ax] += np.clip(shift, -0.5, 0.5)
    return pos


def _block_local_maxima(blk: np.ndarray, pad: int, cutoff: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """26-neighborhood local maxima of the INTERIOR of a halo-padded
    block, host-side, matching `peaks_device`'s >= tie rule.  Returns
    (K, 3) padded-block indices + values, density-descending."""
    n = blk.shape[0] - 2 * pad
    inter = blk[pad:pad + n, pad:pad + n, pad:pad + n]
    neigh = None
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                if dx == dy == dz == 1:
                    continue
                s = blk[pad - 1 + dx:pad - 1 + dx + n,
                        pad - 1 + dy:pad - 1 + dy + n,
                        pad - 1 + dz:pad - 1 + dz + n]
                neigh = s if neigh is None else np.maximum(neigh, s)
    is_peak = (inter >= neigh) & (inter > cutoff)
    idx = np.argwhere(is_peak) + pad
    vals = blk[tuple(idx.T)]
    order = np.argsort(-vals)
    return idx[order].astype(np.int64), vals[order]


def _grow_numpy(rho: np.ndarray, peaks: np.ndarray, offsets: np.ndarray,
                rdist: np.ndarray, odc: float, min_mass: float) -> list:
    """Exclusive sphere growth, numpy fallback (native/halo_growth.cpp
    mirror): returns [(peak_index, mass, radius, ncells)], zeroing
    consumed cells of `rho` in place.  Periodic in rho's own size (a
    halo-padded block keeps every reachable cell in range, so the wrap
    never fires there)."""
    n = rho.shape[0]
    halos = []
    for h in range(peaks.shape[0]):
        c = peaks[h]
        if rho[tuple(c)] <= 0:   # consumed by a previous halo
            continue
        cells = (c[None, :] + offsets) % n
        dens = rho[cells[:, 0], cells[:, 1], cells[:, 2]]
        csum = np.cumsum(dens)
        # mean overdensity = enclosed mass / consumed cell volume
        ncells = np.arange(1, dens.size + 1, dtype=np.float64)
        mean_od = csum / ncells
        below = np.where(mean_od < odc)[0]
        stop = below[0] if below.size else dens.size
        if stop < 1:
            stop = 1
        mass = float(csum[stop - 1])
        radius = float(rdist[stop - 1]) if stop > 1 else 1.0
        if mass < min_mass:
            continue
        used = cells[:stop]
        rho[used[:, 0], used[:, 1], used[:, 2]] = 0.0
        halos.append((h, mass, radius, stop))
    return halos


def _sorted_candidates(cfg: SimConfig, state: SimState,
                       centers: np.ndarray, radii: np.ndarray, mesh=None):
    """Pull only particles in coarse cells near any (center, radius) and
    return them fine-cell sorted: (x_s, v_s, pid_s, cell_s).  The margin
    covers the stats queries' cube-intersects-sphere reach (radius + 1 +
    sqrt(3) fine cells < radius + mesh_scale)."""
    from . import device_fields as dv

    nf = cfg.nf_physical_dim
    mask = dv.mark_cells_near(centers, radii, nf, cfg.mesh_scale,
                              margin=float(cfg.mesh_scale))
    x, v, pid = dv.pull_candidates(cfg, state, mask, mesh=mesh)
    cell = ((np.floor(x[:, 0]).astype(np.int64) * nf
             + np.floor(x[:, 1]).astype(np.int64)) * nf
            + np.floor(x[:, 2]).astype(np.int64))
    order = np.argsort(cell)
    return x[order], v[order], pid[order], cell[order]


def _halo_range_query(cell_s: np.ndarray, x_s: np.ndarray, cpos: np.ndarray,
                      radius: float, nf: int):
    """Indices (into the sorted candidate arrays) and periodic offsets of
    particles within `radius` of `cpos`, via searchsorted range queries."""
    c0 = np.floor(cpos).astype(np.int64)
    off = _sphere_cell_offsets(int(np.ceil(radius)))
    cc = (c0[None, :] + off) % nf
    cids = (cc[:, 0] * nf + cc[:, 1]) * nf + cc[:, 2]
    starts = np.searchsorted(cell_s, cids, side="left")
    ends = np.searchsorted(cell_s, cids, side="right")
    idx = _multi_range_gather(starts, ends)
    dx = x_s[idx] - cpos[None, :]
    dx -= nf * np.round(dx / nf)
    sel = (dx ** 2).sum(1) < radius ** 2
    return idx[sel], dx[sel]


def find_halos(cfg: SimConfig, state: SimState,
               params: Optional[HalofindParams] = None,
               mesh=None) -> np.ndarray:
    """Run the halofinder; returns a CATALOG_DTYPE structured array.

    Scalable data path (round-3; the reference is likewise per-rank,
    halofind.f90:564-777): density deposited per device under shard_map,
    peaks found on device, and ONLY per-halo candidate particles pulled
    for the catalog statistics — no global particle gather.  The density
    grid itself is pulled once for the exclusive sphere growth (grid
    bytes, ~7x less than the particle arrays, and the growth is
    inherently sequential).

    params.refine > 1 searches on a refined density mesh
    (halofind_finer_grid.f90 variant, `finer_halo_grid`): better peak
    localization and tighter exclusive spheres for small halos.  All
    catalog quantities stay in fine-cell/grid-mass units.
    """
    from . import device_fields as dv
    from .. import native as native_mod

    p = params or HalofindParams()
    nf = cfg.nf_physical_dim
    r = max(1, int(p.refine))
    nf_r = nf * r
    min_mass = p.min_halo_particles * cfg.mass_p * r ** 3
    per_device = p.per_device
    if per_device is None:
        # auto: per-device once the refined global grid outgrows a sane
        # host pull (512^3 refine 2 = 4 GiB over a ~50 MB/s device link)
        per_device = nf_r ** 3 * 4 > (2 << 30)

    if per_device:
        # --- per-device growth on halo-padded blocks (the reference's
        # per-tile scheme, halofind.f90:564-777): only per-device blocks
        # ever cross the link; exclusivity is per-device like the
        # reference's per-tile growth ---------------------------------
        rmax = min(p.nc_halo_max * r, nf_r // 4,
                   cfg.nf_physical_node_dim * r)
        offsets, rdist = _shell_offsets(rmax)
        rows = []   # (peak_pos(3) refined-global, val, mass, radius, nc)
        for origin, blk in dv.density_blocks_padded(cfg, state, mesh=mesh,
                                                    refine=r, pad=rmax):
            pk, pk_vals = _block_local_maxima(blk, rmax,
                                              p.den_peak_cutoff)
            if pk.shape[0] == 0:
                continue
            ppos = _para_interp(blk, pk)       # before growth zeroes blk
            res = native_mod.grow_halos(blk, pk, offsets, rdist,
                                        p.halo_odc, min_mass)
            if res is not None:
                _, mass_arr, radius_arr, kept, ncells_arr = res
                found = [(h, float(mass_arr[h]), float(radius_arr[h]),
                          int(ncells_arr[h])) for h in np.where(kept)[0]]
            else:
                found = _grow_numpy(blk, pk, offsets, rdist, p.halo_odc,
                                    min_mass)
            for h, mass, radius, nc in found:
                gpos = np.mod(ppos[h] + origin, nf_r)
                rows.append((gpos, float(pk_vals[h]), mass, radius, nc))
        if not rows:
            return np.zeros(0, dtype=CATALOG_DTYPE)
        # density-descending across devices, matching the global path's
        # catalog order when no cross-device mass competition occurred
        rows.sort(key=lambda t: -t[1])
        peak_pos = np.array([t[0] for t in rows])
        peak_vals = np.array([t[1] for t in rows])
        halos = [(i, t[2], t[3], t[4]) for i, t in enumerate(rows)]
    else:
        rho_dev = dv.density_device(cfg, state, mesh=mesh, refine=r)
        cap = 1 << 17
        while True:
            try:
                peaks, peak_vals = dv.peaks_device(
                    cfg, rho_dev, mesh=mesh, cutoff=p.den_peak_cutoff,
                    cap_per_device=cap)
                break
            except RuntimeError:
                # unusually peak-rich box: retry with a larger buffer
                cap *= 4
                if cap > nf_r ** 3:
                    raise
        rho = np.array(rho_dev)  # writable: growth zeroes consumed mass

        if peaks.shape[0] == 0:
            return np.zeros(0, dtype=CATALOG_DTYPE)

        peak_pos = _para_interp(rho, peaks)
        offsets, rdist = _shell_offsets(min(p.nc_halo_max * r, nf_r // 4))

        # --- exclusive sphere growth (sequential over density-ranked
        # peaks): native C++ loop when available, numpy fallback --------
        res = native_mod.grow_halos(rho, peaks, offsets, rdist,
                                    p.halo_odc, min_mass)
        if res is not None:
            rho, mass_arr, radius_arr, kept, ncells_arr = res
            halos = [(h, float(mass_arr[h]), float(radius_arr[h]),
                      int(ncells_arr[h])) for h in np.where(kept)[0]]
        else:
            halos = _grow_numpy(rho, peaks, offsets, rdist, p.halo_odc,
                                min_mass)

    if not halos:
        return np.zeros(0, dtype=CATALOG_DTYPE)

    # refined-mesh units -> fine cells / grid mass
    if r > 1:
        peak_pos = peak_pos / r
        peak_vals = peak_vals / r ** 3
        halos = [(h, mass / r ** 3, radius / r, nc)
                 for (h, mass, radius, nc) in halos]

    # --- TIS mass rescaling (halofind.f90:718-730) -----------------------
    mass_raw = np.array([m for (_, m, _, _) in halos])
    if p.tis_rescale:
        # actual mean overdensity of the consumed cells, in refined units
        # (cell volume 1/r^3 of a fine cell; mass already in fine units)
        actual_odc = (mass_raw * r ** 3
                      / np.maximum([nc for (_, _, _, nc) in halos], 1))
        mass_cor = tis_rescale_mass(mass_raw, actual_odc, p.halo_odc)
    else:
        mass_cor = mass_raw

    # --- per-halo particle statistics (cell-sorted range queries) --------
    # The reference walks its linked list over the cells around each peak
    # (halofind.f90:423-520); we pull only the particles in coarse cells
    # near any halo (device-side filter), sort them by fine cell once, and
    # gather each halo's candidates with searchsorted range queries —
    # O(K log K + sum over halos of candidate counts), never O(N) per halo
    # and never a global particle gather.
    from ..config import G
    cat = np.zeros(len(halos), dtype=CATALOG_DTYPE)
    centers = np.array([peak_pos[h] for (h, _, _, _) in halos])
    radii = np.array([rad for (_, _, rad, _) in halos])
    x_s, v_s, pid_s, cell_s = _sorted_candidates(cfg, state, centers,
                                                 radii, mesh)

    for i, (h, _, radius, _) in enumerate(halos):
        cpos = peak_pos[h]
        mass = float(mass_cor[i])
        entry = cat[i]
        entry["peak_pos"] = cpos
        entry["radius_calc"] = radius
        entry["halo_mass"] = mass
        entry["halo_mass1"] = mass_raw[i]
        entry["halo_mass_pk"] = peak_vals[h]

        hidx, dxs = _halo_range_query(cell_s, x_s, cpos, radius, nf)
        n_in = hidx.size
        entry["imass"] = n_in * cfg.mass_p
        if n_in == 0:
            continue
        vs = v_s[hidx]
        xm = cpos + dxs.mean(0)
        vm = vs.mean(0)
        entry["x_mean"] = np.mod(xm, nf)
        entry["v_mean"] = vm
        dxc = dxs - dxs.mean(0)
        dvc = vs - vm
        entry["l_cm"] = np.cross(dxc, dvc).mean(0)
        entry["v2_wrt_halo"] = (dvc ** 2).mean(0)
        entry["var_x"] = dxc.var(0)
        entry["i_ij"] = np.array([
            (dxc[:, 0] ** 2).mean(), (dxc[:, 1] ** 2).mean(),
            (dxc[:, 2] ** 2).mean(),
            (dxc[:, 0] * dxc[:, 1]).mean(),
            (dxc[:, 0] * dxc[:, 2]).mean(),
            (dxc[:, 1] * dxc[:, 2]).mean()])
        # most-bound members by E = v^2/2 - G M / r in the halo frame
        # (halofind.f90:473: point-mass potential from the SO mass)
        dist = np.maximum(np.sqrt((dxc ** 2).sum(1)), 1e-4)
        e_bind = 0.5 * (dvc ** 2).sum(1) - mass * G / dist
        nb = min(p.n_bound, n_in, entry["pid_bound"].size)
        part = np.argpartition(e_bind, nb - 1)[:nb]
        part = part[np.argsort(e_bind[part])]
        entry["pid_bound"][:nb] = pid_s[hidx][part]
    # apply the reference write cut
    cat = cat[cat["halo_mass"] > 0]
    return cat


def c2ray_fields(cfg: SimConfig, state: SimState,
                 scale: Optional[int] = None, mesh=None) -> dict:
    """Coarsened density, velocity and fine-clumping fields for radiative-
    transfer coupling (the C2Ray interface, halofind.f90:122-336:
    coarsened_velocity_scale/fine_clumping_scale = mesh_scale).

    Device path: per-device sharded deposits (density + 3 momentum
    components) and on-device pooling; only the pooled m^3 fields cross
    the host link.  Returns {'density': (m,m,m), 'velocity': (3,m,m,m),
    'clumping': (m,m,m)} with m = nf/scale.
    """
    from . import device_fields as dv

    scale = scale or cfg.mesh_scale
    nf = cfg.nf_physical_dim
    m = nf // scale

    def pool(f):
        return np.asarray(
            f.reshape(m, scale, m, scale, m, scale).mean(axis=(1, 3, 5)))

    rho = dv.density_device(cfg, state, mesh=mesh,
                            weights=jnp.full((state.x.shape[0],),
                                             jnp.float32(cfg.mass_p)))
    dens = pool(rho)
    clump = np.where(dens > 0,
                     pool(rho ** 2) / np.maximum(dens, 1e-20) ** 2, 1.0)
    vel = []
    for c in range(3):
        mom = dv.density_device(cfg, state, mesh=mesh,
                                weights=state.v[:, c] * cfg.mass_p)
        mom_c = pool(mom)
        vel.append(np.where(dens > 0, mom_c / np.maximum(dens, 1e-20), 0.0))
    return {"density": dens, "velocity": np.stack(vel), "clumping": clump}


def halo_members(cfg: SimConfig, state: SimState, cat: np.ndarray,
                 max_members: Optional[int] = None, mesh=None) -> list:
    """Member particle lists per halo (halofind_particles.f90 variant):
    returns [(pids, positions, velocities), ...] aligned with `cat`.

    Same scalable path as the catalog stats: one device-side candidate
    pull + cell-sorted range queries — O(candidates) total, not O(N) per
    halo, and no global particle gather."""
    nf = cfg.nf_physical_dim
    if cat.size == 0:
        return []
    x_s, v_s, pid_s, cell_s = _sorted_candidates(
        cfg, state, np.asarray(cat["peak_pos"]),
        np.asarray(cat["radius_calc"]), mesh)
    out = []
    for h in cat:
        cpos = np.asarray(h["peak_pos"], np.float64)
        hidx, dxs = _halo_range_query(cell_s, x_s, cpos,
                                      float(h["radius_calc"]), nf)
        if max_members is not None and hidx.size > max_members:
            order = np.argsort((dxs ** 2).sum(1))
            hidx = hidx[order[:max_members]]
        out.append((pid_s[hidx], x_s[hidx], v_s[hidx]))
    return out


def write_members(outdir: str, cfg: SimConfig, state: SimState,
                  cat: np.ndarray, z: Optional[float] = None) -> str:
    """Write member lists as `{z}halo_pid.npz` (pids + offsets per halo)."""
    from ..io.checkpoint import z_string
    os.makedirs(outdir, exist_ok=True)
    prefix = f"{z:.3f}" if z is not None else z_string(float(state.a))
    members = halo_members(cfg, state, cat)
    pids = np.concatenate([m[0] for m in members]) if members else \
        np.zeros(0, np.int32)
    counts = np.array([m[0].size for m in members], np.int64)
    fn = os.path.join(outdir, f"{prefix}halo_pid.npz")
    np.savez(fn, pids=pids, counts=counts)
    return fn


def merge_catalogs(paths: list) -> np.ndarray:
    """Combine per-run/per-rank catalogs sorted by mass descending
    (utils/halo_merge/halo_merge.f90 role)."""
    cats = [read_catalog(p) for p in paths]
    cat = np.concatenate(cats) if cats else np.zeros(0, CATALOG_DTYPE)
    return cat[np.argsort(-cat["halo_mass"])]


def write_catalog(outdir: str, cfg: SimConfig, state: SimState,
                  cat: np.ndarray, z: float | None = None) -> str:
    """Write `{z}halo.dat`: int32 count header + packed CATALOG_DTYPE rows
    (reference writes per-rank `{z}halo{rank}.dat`; halo_merge combines —
    our catalog is already global)."""
    from ..io.checkpoint import z_string
    os.makedirs(outdir, exist_ok=True)
    prefix = f"{z:.3f}" if z is not None else z_string(float(state.a))
    fn = os.path.join(outdir, f"{prefix}halo.dat")
    with open(fn, "wb") as f:
        np.int32(cat.size).tofile(f)
        cat.tofile(f)
    return fn


def read_catalog(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        n = int(np.fromfile(f, "<i4", 1)[0])
        return np.fromfile(f, CATALOG_DTYPE, n)
