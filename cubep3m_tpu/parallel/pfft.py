"""Distributed 3-D FFT over the device mesh (called inside shard_map).

Replaces the reference's FFTW-MPI slab transpose (`fft_coarse.f90:4-103`
pack_slab/unpack_slab + FFTW all-to-alls) and the p3dfft pencil variant
(`p3dfft_coarse.f90`): each global axis is gathered across its mesh axis
with `jax.lax.all_to_all` (ICI), 1-D FFT'd locally, and re-split — the
cube -> pencil -> cube resharding pattern, compiler-scheduled.

Used by the coarse Poisson solve when `cfg.coarse_pencil_fft` is set;
the default replicated all_gather solve is cheaper at small coarse sizes
(the coarse mesh is 64x smaller than fine) but scales as O(N^3) per device
while this scales as O(N^3/P).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .mesh import AXES


def _gathered_fft(x: jnp.ndarray, name: str, gather_axis: int,
                  split_axis: int, inverse: bool) -> jnp.ndarray:
    """all_to_all-gather `gather_axis` across mesh axis `name` (splitting
    `split_axis`), 1-D c2c FFT along it, then restore the layout."""
    size = jax.lax.axis_size(name)
    if size > 1:
        x = jax.lax.all_to_all(x, name, split_axis=split_axis,
                               concat_axis=gather_axis, tiled=True)
    x = jnp.fft.ifft(x, axis=gather_axis) if inverse else jnp.fft.fft(
        x, axis=gather_axis)
    if size > 1:
        x = jax.lax.all_to_all(x, name, split_axis=gather_axis,
                               concat_axis=split_axis, tiled=True)
    return x


def pfft3d(local: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Distributed complex 3-D FFT of a cube-decomposed field.

    local: this device's (n, n, n) complex block of the global (N, N, N)
    array (mesh axes x/y/z, block order = device coords).  Returns the
    device's block of the transformed array in the same layout.
    """
    x = local.astype(jnp.complex64)
    # gather/fft/un-gather one global axis at a time; the split axis is
    # any other local axis (its fragments stay addressed consistently
    # within each mesh group)
    x = _gathered_fft(x, "x", gather_axis=0, split_axis=1, inverse=inverse)
    x = _gathered_fft(x, "y", gather_axis=1, split_axis=2, inverse=inverse)
    x = _gathered_fft(x, "z", gather_axis=2, split_axis=0, inverse=inverse)
    return x


def coarse_force_pencil(rho_c: jnp.ndarray, kern_c_im: jnp.ndarray,
                        nc_node: int) -> jnp.ndarray:
    """Coarse force via the distributed FFT (coarse_force.f90 role).

    rho_c: local (nc, nc, nc) density block; kern_c_im: (3, NC, NC, NC)
    full-spectrum kernel (replicated).  Returns local (3, nc, nc, nc).
    """
    from .halo import device_coords

    cx, cy, cz = device_coords()
    rho_k = pfft3d(rho_c, inverse=False)
    k_loc = jax.lax.dynamic_slice(
        kern_c_im, (0, cx * nc_node, cy * nc_node, cz * nc_node),
        (3, nc_node, nc_node, nc_node))
    fx_k = (1j * k_loc[0]) * rho_k
    fy_k = (1j * k_loc[1]) * rho_k
    fz_k = (1j * k_loc[2]) * rho_k
    fxy = pfft3d(fx_k + 1j * fy_k, inverse=True)
    fz = pfft3d(fz_k, inverse=True)
    return jnp.stack([fxy.real, fxy.imag, fz.real]).astype(jnp.float32)