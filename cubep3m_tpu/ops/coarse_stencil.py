"""Regular-stencil coarse deposit/gather from the fine grid.

Optional fast path (cfg.coarse_from_fine) replacing the per-particle coarse
CIC scatter/gather (`coarse_mass.f90`, `coarse_velocity.f90`) with fixed
separable stencils on the fine NGP density/force grids:

* deposit: each fine cell's NGP mass CIC-deposits from its center.  Since
  the coarse base cell is constant per fine cell, the per-axis weights are
  a fixed pattern of (i mod mesh_scale) — a reshape+weighted-sum, no
  scatters.
* gather: the coarse force trilinearly upsampled to fine-cell centers; the
  particle kick then reuses the fine NGP gather (one fused gather for
  fine+coarse force).

Physics note: positions are quantized to fine-cell centers in the coarse
deposit/kick (<= 1/8 coarse cell).  Pairwise force error at r > nf_cutoff
rises from ~1% to ~3-4% scatter (unbiased; the mesh shake decorrelates it
across steps).  The exact per-particle path remains the default.

Weights below are for mesh_scale=4: fine index 4j+m has coarse coordinate
xs = j + (m-1.5)/4, so CIC weights per m are
  m=0: 0.375 -> j-1, 0.625 -> j      m=1: 0.125 -> j-1, 0.875 -> j
  m=2: 0.875 -> j,   0.125 -> j+1    m=3: 0.625 -> j,   0.375 -> j+1
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(ms: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w_low, w_mid, w_high) per m in [0, ms): weights to coarse j-1, j,
    j+1 for a fine cell at index ms*j + m."""
    m = np.arange(ms)
    xs_frac = (m + 0.5) / ms - 0.5          # in (-0.5, 0.5)
    lo = np.where(xs_frac < 0, -xs_frac, 0.0)
    hi = np.where(xs_frac > 0, xs_frac, 0.0)
    mid = 1.0 - lo - hi
    return (lo.astype(np.float32), mid.astype(np.float32),
            hi.astype(np.float32))


def deposit_axis(grid: jnp.ndarray, axis: int, ms: int) -> jnp.ndarray:
    """Contract one fine axis (n) to a padded coarse axis (n/ms + 2).

    Strided slice-adds, never a (..., nc, ms, ...) reshape: a size-ms
    minor dim tile-pads to (8,128) on TPU (up to 32x memory — the same
    hazard deposit.sum_pool3 documents)."""
    lo, mid, hi = _axis_weights(ms)
    n = grid.shape[axis]
    nc = n // ms
    g_lo = g_mid = g_hi = None
    for m in range(ms):
        sm = jax.lax.slice_in_dim(grid, m, n, stride=ms, axis=axis)
        g_lo = lo[m] * sm if g_lo is None else g_lo + lo[m] * sm
        g_mid = mid[m] * sm if g_mid is None else g_mid + mid[m] * sm
        g_hi = hi[m] * sm if g_hi is None else g_hi + hi[m] * sm
    out_shape = list(g_lo.shape)
    out_shape[axis] = nc + 2
    out = jnp.zeros(out_shape, grid.dtype)

    def sl(a, b):
        idx = [slice(None)] * len(out_shape)
        idx[axis] = slice(a, b)
        return tuple(idx)

    out = out.at[sl(1, nc + 1)].add(g_mid)
    out = out.at[sl(0, nc)].add(g_lo)
    out = out.at[sl(2, nc + 2)].add(g_hi)
    return out


def coarse_deposit_from_fine(rho_fine: jnp.ndarray, ms: int) -> jnp.ndarray:
    """Fine (n,n,n) NGP density -> padded coarse (nc+2,)^3 CIC deposit."""
    g = rho_fine
    for axis in range(3):
        g = deposit_axis(g, axis, ms)
    return g


def gather_axis(grid: jnp.ndarray, axis: int, ms: int) -> jnp.ndarray:
    """Expand one padded coarse axis (nc+2) to fine (nc*ms) by the
    transposed stencil (trilinear at fine-cell centers)."""
    lo, mid, hi = _axis_weights(ms)
    # operate with the target axis LEADING so the (nc, ms) stack+merge
    # keeps the big dims minor (a size-ms minor dim tile-pads 32x on TPU)
    g = jnp.moveaxis(grid, axis, 0)
    ncp = g.shape[0]
    nc = ncp - 2
    g_m1, g_0, g_p1 = g[0:nc], g[1:nc + 1], g[2:nc + 2]
    parts = [lo[m] * g_m1 + mid[m] * g_0 + hi[m] * g_p1
             for m in range(ms)]
    stacked = jnp.stack(parts, axis=1)          # (nc, ms, ...)
    out = stacked.reshape((nc * ms,) + g.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def coarse_gather_to_fine(f_c_pad: jnp.ndarray, ms: int) -> jnp.ndarray:
    """Padded coarse (C, nc+2, nc+2, nc+2) field -> fine (C, n, n, n)
    trilinear interpolation at fine-cell centers."""
    g = f_c_pad
    for axis in range(3):
        g = gather_axis(g, axis + 1, ms)
    return g
