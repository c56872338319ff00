"""Pallas TPU kernel for the PPINT same-cell band force.

The XLA fori_loop band pass (ops/pp.py `_band_pass`) re-reads the particle
lanes from HBM on every band offset (~46 ms at 128^3); this kernel streams
each particle tile into VMEM ONCE and runs the whole +-band offset sweep
on-chip — the TPU-native analog of the reference's per-coarse-cell pair
loop (`source_threads/particle_mesh_threaded.f90:322-362`) and of its CUDA
offload (`source_threads/nbody-ueli.cu`).

Formulation: particles are cell-sorted (ops/binning.py), so same-cell
partners sit within a +-band window in the sorted order.  Each grid block
loads a (T + 2*band) window of the SoA lanes and accumulates, for every
static offset d in 1..band, the pair force from both the +d and -d
neighbor (symmetric evaluation — every pair is computed twice, which costs
cheap VPU flops instead of the cross-tile Newton's-3rd-law accumulation
the sequential reference uses).

Matches `_band_pass(pos, cell, 1, band, ...)` to fp32 rounding; the
dense-tail pass for cells with occupancy > band+1 still runs in XLA
(ops/pp.py `ppint_dense_tail`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block size tuned so the window W = T + 2*MARGIN is lane-aligned
_T = 896
_MARGIN = 64          # >= band; keeps W = 1024 a multiple of 128


_ROWS = 8             # windows per pallas block (sublane tiling constraint)


def _band_kernel(win_x, win_y, win_z, win_c, fx_ref, fy_ref, fz_ref, *,
                 band: int, mass_p: float, rsoft2: float, bias3: float):
    xi = win_x[:, _MARGIN:_MARGIN + _T]
    yi = win_y[:, _MARGIN:_MARGIN + _T]
    zi = win_z[:, _MARGIN:_MARGIN + _T]
    ci = win_c[:, _MARGIN:_MARGIN + _T]
    fx = jnp.zeros((_ROWS, _T), jnp.float32)
    fy = jnp.zeros((_ROWS, _T), jnp.float32)
    fz = jnp.zeros((_ROWS, _T), jnp.float32)
    for d in range(1, band + 1):
        for s in (d, -d):
            o = _MARGIN + s
            xj = win_x[:, o:o + _T]
            yj = win_y[:, o:o + _T]
            zj = win_z[:, o:o + _T]
            cj = win_c[:, o:o + _T]
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            r2 = dx * dx + dy * dy + dz * dz
            ok = (ci == cj) & (r2 > rsoft2)
            # F_i -= mass_p * sep / (r*pp_bias)^3  (attract toward j)
            inv = jnp.where(
                ok, mass_p / (bias3 * jnp.where(ok, r2, 1.0) ** 1.5), 0.0)
            fx -= dx * inv
            fy -= dy * inv
            fz -= dz * inv
    fx_ref[:, :] = fx
    fy_ref[:, :] = fy
    fz_ref[:, :] = fz


def _windows(lane: jnp.ndarray, nblk: int, fill) -> jnp.ndarray:
    """(nblk, T + 2*MARGIN) overlapping windows of a (nblk*T,) lane,
    margin-padded with `fill` (3 cheap contiguous reshapes, no gather).

    Row k = lane[k*T - MARGIN : (k+1)*T + MARGIN] with `fill` outside.
    """
    n = nblk * _T
    core = lane.reshape(nblk, _T)
    filler = jnp.full((_T,), fill, lane.dtype)
    # row k of `shift_left` = lane[(k-1)*T : k*T]  (fill for k = 0)
    shift_left = jnp.concatenate([filler, lane[:n - _T]]).reshape(nblk, _T)
    # row k of `shift_right` = lane[(k+1)*T : (k+2)*T]  (fill for last k)
    shift_right = jnp.concatenate([lane[_T:], filler]).reshape(nblk, _T)
    return jnp.concatenate([shift_left[:, -_MARGIN:], core,
                            shift_right[:, :_MARGIN]], axis=1)


def ppint_band_force_pallas(pos: jnp.ndarray, cell: jnp.ndarray, band: int,
                            mass_p: float, rsoft: float, pp_bias: float,
                            interpret: bool = False) -> jnp.ndarray:
    """Same-cell pair force over a cell-sorted particle array (offsets
    1..band, both directions).  Returns (N, 3) float32.

    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).
    """
    return ppint_band_force_pallas_cols(
        pos[:, 0], pos[:, 1], pos[:, 2], cell, band, mass_p, rsoft,
        pp_bias, interpret=interpret, soa_out=False)


def ppint_band_force_pallas_cols(cx, cy, cz, cell: jnp.ndarray, band: int,
                                 mass_p: float, rsoft: float,
                                 pp_bias: float, interpret: bool = False,
                                 soa_out: bool = True) -> jnp.ndarray:
    """Column-lane entry point; soa_out returns (3, N) (staged SoA path)."""
    assert band <= _MARGIN, f"band {band} exceeds kernel margin {_MARGIN}"
    n = cx.shape[0]
    nblk = _ROWS * (-(-n // (_T * _ROWS)))   # window rows, multiple of 8
    pad = nblk * _T - n
    # padding slots: unique-ish sentinel cell would still equal each other,
    # but their positions coincide (0) so r2 <= rsoft2 masks them out —
    # same invariant the XLA band pass relies on.
    px = jnp.pad(cx, (0, pad))
    py = jnp.pad(cy, (0, pad))
    pz = jnp.pad(cz, (0, pad))
    cl = jnp.pad(cell, (0, pad), constant_values=-2)

    wx = _windows(px, nblk, 0.0)
    wy = _windows(py, nblk, 0.0)
    wz = _windows(pz, nblk, 0.0)
    wc = _windows(cl, nblk, -1)

    W = _T + 2 * _MARGIN
    kern = functools.partial(
        _band_kernel, band=band, mass_p=float(mass_p),
        rsoft2=float(rsoft) ** 2, bias3=float(pp_bias) ** 3)
    row = pl.BlockSpec((_ROWS, W), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_row = pl.BlockSpec((_ROWS, _T), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    fx, fy, fz = pl.pallas_call(
        kern,
        grid=(nblk // _ROWS,),
        in_specs=[row, row, row, row],
        out_specs=(out_row, out_row, out_row),
        out_shape=tuple(jax.ShapeDtypeStruct((nblk, _T), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )(wx, wy, wz, wc)
    force = jnp.stack([fx.reshape(-1)[:n], fy.reshape(-1)[:n],
                       fz.reshape(-1)[:n]], axis=0 if soa_out else -1)
    return force
