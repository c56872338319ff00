"""Device-resident analysis data path (no global particle gather).

The reference's analysis is per-rank/per-tile — `halofind.f90:564-777` finds
halos on tile-local density grids and writes per-rank catalogs; it never
ships every particle to one rank.  The round-2 implementation did exactly
that (`gather_global` of all particles to host), which cannot reach the
256^3/512^3 operating point over a ~50 MB/s device link.  This module keeps
the particle data on the devices:

* `density_device`  — sharded global NGP density (optionally refined or
  weighted), deposited per device under shard_map with the mesh-shake
  removed on device (pad-and-fold covers the <= 2*mesh_scale shake reach);
* `peaks_device`    — 26-neighborhood local maxima found on device with a
  halo-pad neighbor max; only the (K, 3)+(K,) peak list crosses the link;
* `pull_candidates` — compacts particles whose (shake-removed, global)
  coarse cell is marked in a host-provided mask and pulls ONLY those rows —
  the per-halo candidate set for catalog statistics.

Only grids, peak lists, and candidate rows cross the host link.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import SimConfig
from ..state import SimState
from ..ops.deposit import ngp_deposit
from ..parallel import halo as halo_mod
from ..parallel.mesh import AXES, make_sim_mesh


def _mesh_for(cfg: SimConfig, mesh: Optional[Mesh]) -> Mesh:
    return mesh if mesh is not None else make_sim_mesh(cfg.nodes_dim)


def _shake_pad(cfg: SimConfig) -> int:
    """Deposit ghost depth covering the shake reach: |shake_offset| per
    axis is <= 2*mesh_scale (update_position.f90:25-63)."""
    return 2 * cfg.mesh_scale


def density_device(cfg: SimConfig, state: SimState,
                   mesh: Optional[Mesh] = None, refine: int = 1,
                   weights: Optional[jnp.ndarray] = None,
                   remove_shake: bool = True) -> jax.Array:
    """Sharded global NGP density at `refine`*nf resolution.

    Per-device deposit of (x - shake_offset) onto a ghost-padded local
    block, folded back over the mesh (the sweep's own deposit pattern) —
    no particle gather.  `weights` defaults to mass_p * refine^3 (mean
    density 1 on the refined mesh); pass a (devices*max_np,) array for
    momentum/weighted fields (c2ray velocity deposits).
    """
    mesh = _mesh_for(cfg, mesh)
    r = max(1, int(refine))
    nf = cfg.nf_physical_node_dim
    pad = _shake_pad(cfg) if remove_shake else 0
    npad = (nf + 2 * pad) * r

    def local(x, np_local, shake, w):
        n_slots = x.shape[0]
        valid = jnp.arange(n_slots) < np_local[0]
        xs = x - shake[None, :] if remove_shake else x
        wv = jnp.where(valid, w, 0.0)
        grid = ngp_deposit(xs * r, wv, (npad, npad, npad),
                           offset=float(pad * r))
        if pad:
            grid = halo_mod.halo_fold(grid, pad * r)
        return grid

    pa = P(AXES)
    rspec = P()
    if weights is None:
        weights = jnp.full((state.x.shape[0],),
                           jnp.float32(cfg.mass_p * r ** 3))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(pa, pa, rspec, pa),
                   out_specs=P(*AXES), check_vma=False)
    return jax.jit(fn)(state.x, state.np_local, state.shake_offset, weights)


def density_blocks_padded(cfg: SimConfig, state: SimState,
                          mesh: Optional[Mesh] = None, refine: int = 1,
                          pad: int = 0, remove_shake: bool = True):
    """Per-device halo-padded density blocks for tile-local halo growth
    (the reference's per-tile scheme, halofind.f90:564-777).

    Like `density_device`, but each device's block is additionally
    halo-padded by `pad` REFINED cells of neighbor density, so a sphere
    grown from any peak in the device's physical region stays in-block up
    to radius `pad`.  Yields (origin, block) pairs on host, one device at
    a time — only per-device blocks cross the link, never the global
    grid (the 512^3-refine-2 global pull is 4 GiB; a padded block is
    1/nodes of that plus skin).

    origin: (3,) int64, the block's [0,0,0] cell in REFINED GLOBAL
    coordinates (i.e. device_offset*nf_node*r - pad; negative/wrapped
    coordinates follow periodic wrapping).
    """
    mesh = _mesh_for(cfg, mesh)
    r = max(1, int(refine))
    nf = cfg.nf_physical_node_dim
    pad = int(pad)
    if pad > nf * r:
        raise ValueError(f"pad {pad} exceeds the device block {nf * r}")
    spad = _shake_pad(cfg) if remove_shake else 0
    npad = (nf + 2 * spad) * r

    def local(x, np_local, shake, w):
        n_slots = x.shape[0]
        valid = jnp.arange(n_slots) < np_local[0]
        xs = x - shake[None, :] if remove_shake else x
        wv = jnp.where(valid, w, 0.0)
        grid = ngp_deposit(xs * r, wv, (npad, npad, npad),
                           offset=float(spad * r))
        if spad:
            grid = halo_mod.halo_fold(grid, spad * r)
        if pad:
            grid = halo_mod.halo_pad(grid, pad)
        ox, oy, oz = halo_mod.device_coords()
        origin = (jnp.stack([ox, oy, oz]).astype(jnp.int64) * (nf * r)
                  - pad)
        return grid, origin[None, :]

    pa = P(AXES)
    weights = jnp.full((state.x.shape[0],),
                       jnp.float32(cfg.mass_p * r ** 3))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(pa, pa, P(), pa),
                   out_specs=(P(AXES), P(AXES)), check_vma=False)
    blocks, origins = jax.jit(fn)(state.x, state.np_local,
                                  state.shake_offset, weights)
    origins = np.asarray(origins)          # (ndev, 3), tiny
    blk = nf * r + 2 * pad
    for shard in blocks.addressable_shards:
        k = shard.index[0].start // blk if shard.index[0].start else 0
        yield origins[k], np.array(shard.data)


def peaks_device(cfg: SimConfig, rho: jax.Array,
                 mesh: Optional[Mesh] = None, cutoff: float = 100.0,
                 cap_per_device: int = 1 << 17
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """26-neighborhood local maxima above `cutoff`, found on device.

    rho: the sharded (or single-device) global density grid.  Returns
    (indices (K, 3) int64 global cells, values (K,)) on host, sorted by
    density descending — only the peak list crosses the link.  Raises if
    any device found more than `cap_per_device` peaks (caller can retry
    with a larger cap; peaks above den_peak_cutoff are ~1e-4 of cells).
    """
    mesh = _mesh_for(cfg, mesh)

    def local(rho_l):
        n0, n1, n2 = rho_l.shape
        p = halo_mod.halo_pad(rho_l, 1)
        neigh = None
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    if dx == dy == dz == 1:
                        continue
                    s = p[dx:dx + n0, dy:dy + n1, dz:dz + n2]
                    neigh = s if neigh is None else jnp.maximum(neigh, s)
        # >= so tied plateau maxima both qualify (exclusive growth consumes
        # one and skips the other; strict > would drop both)
        is_peak = (rho_l >= neigh) & (rho_l > cutoff)
        count = jnp.sum(is_peak.astype(jnp.int32))
        flat = jnp.nonzero(is_peak.ravel(), size=cap_per_device,
                           fill_value=-1)[0]
        ok = flat >= 0
        vals = jnp.where(ok, rho_l.ravel()[jnp.clip(flat, 0)], 0.0)
        i = flat // (n1 * n2)
        j = (flat // n2) % n1
        k = flat % n2
        ox, oy, oz = halo_mod.device_coords()
        idx = jnp.stack([
            jnp.where(ok, i + ox * n0, -1),
            jnp.where(ok, j + oy * n1, -1),
            jnp.where(ok, k + oz * n2, -1)], axis=1).astype(jnp.int32)
        overflow = jax.lax.psum(jnp.maximum(count - cap_per_device, 0),
                                AXES)
        return idx, vals, overflow

    fn = shard_map(local, mesh=mesh, in_specs=(P(*AXES),),
                   out_specs=(P(AXES), P(AXES), P()), check_vma=False)
    idx, vals, overflow = jax.jit(fn)(rho)
    if int(overflow) > 0:
        raise RuntimeError(
            f"peaks_device: {int(overflow)} peaks beyond cap_per_device="
            f"{cap_per_device}; re-run with a larger cap")
    idx = np.asarray(idx)
    vals = np.asarray(vals)
    keep = idx[:, 0] >= 0
    idx, vals = idx[keep].astype(np.int64), vals[keep]
    order = np.argsort(-vals)
    return idx[order], vals[order]


def mark_cells_near(centers: np.ndarray, radii: np.ndarray, nf: int,
                    mesh_scale: int, margin: float = 0.0) -> np.ndarray:
    """Host-side bool mask over global coarse cells within `radius+margin`
    fine cells of any center (the candidate filter for pull_candidates)."""
    ncg = nf // mesh_scale
    mask = np.zeros((ncg, ncg, ncg), bool)
    if centers.size == 0:
        return mask
    cc = np.floor(centers / mesh_scale).astype(np.int64)
    for c, rad in zip(cc, np.asarray(radii, np.float64)):
        # coarse cells whose cube can contain a point within rad+margin:
        # reach in coarse cells, +1 for the center's sub-cell position
        reach = int(np.ceil((rad + margin) / mesh_scale)) + 1
        g = np.arange(-reach, reach + 1)
        ox, oy, oz = np.meshgrid(g, g, g, indexing="ij")
        off = np.stack([ox.ravel(), oy.ravel(), oz.ravel()], 1)
        d = np.maximum((np.abs(off) - 1) * mesh_scale, 0.0)
        keep = (d ** 2).sum(1) <= (rad + margin) ** 2
        cells = (c[None, :] + off[keep]) % ncg
        mask[cells[:, 0], cells[:, 1], cells[:, 2]] = True
    return mask


def pull_candidates(cfg: SimConfig, state: SimState, mask: np.ndarray,
                    mesh: Optional[Mesh] = None, remove_shake: bool = True
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pull only the particles whose (global, shake-removed) coarse cell is
    True in `mask` ((nc_dim,)^3 bool) — device-side filter + compaction,
    then a bounded per-device pull of the matching rows.

    Returns (x_global, v, pid) numpy arrays like `state.gather_global`,
    restricted to the marked cells.
    """
    mesh = _mesh_for(cfg, mesh)
    nf = cfg.nf_physical_node_dim
    nf_glob = cfg.nf_physical_dim
    ms = cfg.mesh_scale
    ncg = nf_glob // ms
    cap = cfg.max_np

    def local(x, v, pid, np_local, shake, mask_dev):
        n_slots = x.shape[0]
        valid = jnp.arange(n_slots) < np_local[0]
        ox, oy, oz = halo_mod.device_coords()
        origin = jnp.stack([ox, oy, oz]).astype(jnp.float32) * float(nf)
        xg = x + origin[None, :]
        if remove_shake:
            xg = xg - shake[None, :]
        xg = jnp.mod(xg, float(nf_glob))
        cc = jnp.clip(jnp.floor(xg / ms).astype(jnp.int32), 0, ncg - 1)
        hit = mask_dev[cc[:, 0], cc[:, 1], cc[:, 2]] > 0
        keep = valid & hit
        count = jnp.sum(keep.astype(jnp.int32))
        order = jnp.argsort(~keep)
        from ..parallel import exchange as ex_mod
        packed = jnp.concatenate(
            [xg.T, v.T, ex_mod.pid_to_f32(pid)[None, :]],
            axis=0)[:, order]
        return packed, count[None]

    pa = P(AXES)
    prow = P(None, AXES)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(pa, pa, pa, pa, P(), P()),
                   out_specs=(prow, pa), check_vma=False)
    mask_dev = jnp.asarray(mask.astype(np.float32))
    packed, counts = jax.jit(fn)(state.x, state.v, state.pid,
                                 state.np_local, state.shake_offset,
                                 mask_dev)
    counts = np.asarray(counts)
    xs, vs, ps = [], [], []
    for d in range(counts.size):
        n = int(counts[d])
        if n == 0:
            continue
        blk = np.asarray(packed[:, d * cap:d * cap + n])
        xs.append(blk[0:3].T)
        vs.append(blk[3:6].T)
        from ..parallel.exchange import PID_BIAS
        ps.append(blk[6].view(np.int32).astype(np.int64) - int(PID_BIAS))
    if not xs:
        z3 = np.zeros((0, 3), np.float32)
        return z3, z3.copy(), np.zeros(0, np.int64)
    return (np.ascontiguousarray(np.concatenate(xs)),
            np.ascontiguousarray(np.concatenate(vs)),
            np.concatenate(ps))
