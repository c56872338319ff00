"""2-D density projections.

Replaces `source_threads/projection.f90` / `init_projection.f90` (and the
`projection_half*` variants): mass-deposited xy/xz/yz planes of the global
fine mesh, written at scheduled redshifts.  The reference builds per-tile
CIC planes and mpi_reduces to rank 0 (projection.f90:34-53,147-186); here a
single deposit + axis sum does the job on device.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import SimState, gather_global
from ..ops.deposit import ngp_deposit


def project_density(cfg: SimConfig, state: SimState,
                    half: bool = False, finer_factor: int = 1,
                    remove_shake: bool = True) -> Dict[str, np.ndarray]:
    """Return {'xy','xz','yz'} projected mass planes of the global volume.

    half=True projects only the z<nf/2 half (projection_half.f90 analog).
    finer_factor>1 deposits onto a finer_factor-refined plane grid
    (projection_half_finer.f90's proj_finer_factor=4 variant) for
    higher-resolution imaging; the plane is (nf*finer_factor)^2.
    Positions are un-shaken before projecting (move_grid_back semantics).
    """
    nf = cfg.nf_physical_dim
    ff = max(1, int(finer_factor))
    if ff == 1:
        # device path: sharded deposit, on-device axis sums; only the
        # (nf, nf) planes cross the host link (no particle gather)
        from . import device_fields as dv
        rho = dv.density_device(cfg, state, remove_shake=remove_shake,
                                weights=jnp.full((state.x.shape[0],),
                                                 jnp.float32(cfg.mass_p)))
        if half:
            rho = rho[:, :, :nf // 2]
        return {
            "xy": np.asarray(jnp.sum(rho, axis=2)),
            "xz": np.asarray(jnp.sum(rho, axis=1)),
            "yz": np.asarray(jnp.sum(rho, axis=0)),
        }
    # refined planes (imaging variant): deposit each projection on a
    # (nf*ff, nf*ff, 1) grid directly from gathered positions (a refined
    # 3-D grid would be ff^3 the memory for no gain)
    x, _, _ = gather_global(cfg, state)
    if remove_shake:
        x = np.mod(x - np.asarray(state.shake_offset)[None, :], nf)
    if half:
        x = x[x[:, 2] < nf / 2]
    w = jnp.full((x.shape[0],), jnp.float32(cfg.mass_p))
    nr = nf * ff
    planes = {}
    for name, (i, j) in (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2))):
        xy = jnp.asarray(np.stack(
            [x[:, i] * ff, x[:, j] * ff, np.zeros(x.shape[0])], 1)
            .astype(np.float32))
        planes[name] = np.asarray(
            ngp_deposit(xy, w, (nr, nr, 1)))[:, :, 0]
    return planes


def write_projections(outdir: str, cfg: SimConfig, state: SimState,
                      half: bool = False, z: float | None = None) -> list:
    """Write `{z}proj_xy.dat` etc. as raw float32 planes (+ .npy copies)."""
    from ..io.checkpoint import z_string
    os.makedirs(outdir, exist_ok=True)
    planes = project_density(cfg, state, half=half)
    prefix = f"{z:.3f}" if z is not None else z_string(float(state.a))
    files = []
    for name, plane in planes.items():
        fn = os.path.join(outdir, f"{prefix}proj_{name}.dat")
        plane.astype("<f4").tofile(fn)
        files.append(fn)
    return files


def density_slice(cfg: SimConfig, state: SimState, axis: int = 2,
                  index: int = 0, thickness: int = 4,
                  remove_shake: bool = True) -> np.ndarray:
    """2-D density slab of `thickness` cells at `index` along `axis`
    (utils/dm_slice_sample & gas_slice_sample role)."""
    from . import device_fields as dv
    rho = dv.density_device(cfg, state, remove_shake=remove_shake,
                            weights=jnp.full((state.x.shape[0],),
                                             jnp.float32(cfg.mass_p)))
    sl = [slice(None)] * 3
    sl[axis] = slice(index, index + thickness)
    # only the slab crosses the host link
    return np.asarray(jnp.sum(rho[tuple(sl)], axis=axis))


def gas_slice(cfg: SimConfig, state: SimState, field: int = 0,
              axis: int = 2, index: int = 0) -> np.ndarray:
    """One plane of a gas conserved field (gas_slice_sample role)."""
    g = np.asarray(state.gas_u[field])
    sl = [slice(None)] * 3
    sl[axis] = index
    return g[tuple(sl)]


def to_pgm(plane: np.ndarray, path: str, log_scale: bool = True) -> None:
    """Render a projection plane as an 8-bit PGM image
    (utils/pgm_proj/pgm_proj.f90 role)."""
    p = plane.astype(np.float64)
    if log_scale:
        p = np.log10(1.0 + p)
    lo, hi = p.min(), p.max()
    img = np.zeros_like(p, dtype=np.uint8) if hi <= lo else (
        (255 * (p - lo) / (hi - lo)).astype(np.uint8))
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())
