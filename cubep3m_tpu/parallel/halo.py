"""Grid halo collectives (called inside shard_map).

TPU-native replacement for the reference's buffer subroutines:

* `halo_pad`    <- the *density* side of `particle_pass.f90`: instead of
  shipping ghost particles 24 cells deep to 26 neighbors (770 lines of
  sequential MPI passes), we deposit locally and exchange GRID halo slabs —
  O(surface * nf_buf) floats over ICI instead of duplicated particles.
* `halo_fold`   <- `coarse_cic_mass_buffer.f90`: boundary CIC mass that
  landed in ghost cells is folded back into the owning neighbor.
* `halo_pad` (pad=1 on force)  <- `coarse_force_buffer.f90:23-63`'s
  six `mpi_sendrecv_replace` face exchanges.

Corner/edge data propagates automatically because the axis exchanges are
sequential over an already-padded array — the same trick the reference's
6-pass particle exchange uses (`particle_pass.f90` ordering).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import AXES, ring_perm


def _axis_size(axis_name: str) -> int:
    try:
        return jax.lax.axis_size(axis_name)
    except NameError:
        # outside shard_map (single-device harness code): periodic wrap
        return 1


def halo_pad(local: jnp.ndarray, pad: int,
             axis_names=AXES) -> jnp.ndarray:
    """Pad a local block with `pad` cells from ring neighbors per axis.

    local: (..., n0, n1, n2) — the last three dims are spatial.
    Sequential axis passes propagate corners. Single-axis-size-1 meshes
    degenerate to a periodic wrap of the local block (correct physics).
    """
    out = local
    base = local.ndim - 3
    for i, name in enumerate(axis_names):
        ax = base + i
        size = _axis_size(name)
        lo = jax.lax.slice_in_dim(out, 0, pad, axis=ax)
        hi = jax.lax.slice_in_dim(out, out.shape[ax] - pad, out.shape[ax],
                                  axis=ax)
        if size == 1:
            recv_lo, recv_hi = hi, lo
        else:
            # my low halo = left neighbor's high slab: j -> j+1
            recv_lo = jax.lax.ppermute(hi, name, ring_perm(size, 1))
            # my high halo = right neighbor's low slab: j -> j-1
            recv_hi = jax.lax.ppermute(lo, name, ring_perm(size, -1))
        out = jnp.concatenate([recv_lo, out, recv_hi], axis=ax)
    return out


def halo_fold(padded: jnp.ndarray, pad: int,
              axis_names=AXES) -> jnp.ndarray:
    """Fold `pad` ghost layers back into neighbors' interiors (deposit).

    Inverse of halo_pad: ghost-cell mass deposited locally belongs to the
    neighbor owning those cells.  Returns the unpadded local block.
    """
    out = padded
    base = padded.ndim - 3
    for i, name in enumerate(axis_names):
        ax = base + i
        size = _axis_size(name)
        n = out.shape[ax] - 2 * pad
        lo = jax.lax.slice_in_dim(out, 0, pad, axis=ax)
        hi = jax.lax.slice_in_dim(out, n + pad, n + 2 * pad, axis=ax)
        core = jax.lax.slice_in_dim(out, pad, n + pad, axis=ax)
        if size == 1:
            add_lo, add_hi = hi, lo
        else:
            # my low ghosts belong to the left neighbor's high interior
            add_hi = jax.lax.ppermute(lo, name, ring_perm(size, -1))
            add_lo = jax.lax.ppermute(hi, name, ring_perm(size, 1))
        first = jax.lax.slice_in_dim(core, 0, pad, axis=ax) + add_lo
        mid = jax.lax.slice_in_dim(core, pad, n - pad, axis=ax)
        last = jax.lax.slice_in_dim(core, n - pad, n, axis=ax) + add_hi
        out = jnp.concatenate([first, mid, last], axis=ax)
    return out


def all_gather_grid(local: jnp.ndarray, axis_names=AXES) -> jnp.ndarray:
    """Gather per-device blocks into the full global grid on every device.

    local: (n, n, n) block -> (N, N, N) with N = n * nodes_dim.  Used for
    the v1 coarse Poisson solve (the global coarse mesh is 64x smaller than
    the fine mesh, so redundant solve beats a distributed FFT until very
    large configs; a pencil FFT is the planned upgrade, SURVEY.md §5.7).
    """
    g = local
    # gather axis by axis; tiled=False gives a new leading axis per gather
    for i, name in enumerate(axis_names):
        g = jax.lax.all_gather(g, name, axis=i, tiled=True)
    return g


def device_coords(axis_names=AXES):
    return tuple(jax.lax.axis_index(n) for n in axis_names)
