"""Pallas TPU kernel: segmented corner-weight deposit over SORTED keys.

The coarse CIC deposit is the single most expensive op of the 256^3 sweep:
XLA's scatter costs ~65-160 ns per INDEX at coarse-grid sizes no matter
how the indices are ordered (measured: 8-scatter CIC 1294 ms, corner-split
windowed scatter 1139 ms, and the `indices_are_sorted` hint changes
nothing — scripts/profile_step.py at 256^3).  But with particles sorted by
coarse base-cell key the deposit is a SEGMENTED SUM over contiguous runs
(mean run length = mesh_scale^3/8 ~ 8 particles), which XLA's scatter
cannot exploit and a Pallas kernel can:

* the whole (8, ncells) corner accumulator lives in VMEM across the
  sequential grid (70 MB at nc=128 — the coarse grid is 64x smaller than
  the fine grid, which is the entire point of the two-level split);
* per block, the running per-corner sums come from a lane-direction
  Hillis-Steele cumsum (VPU, fp32-safe at block magnitudes);
* run totals are extracted at run ENDS (cumsum difference via a masked
  running-max fill — the cumsum of non-negative weights is monotone, so
  "value at the previous end" is a running max);
* only the ~N/8 run ends touch memory at a dynamic index — an (8, 1)
  column RMW into VMEM — instead of N windowed-scatter index traversals
  through HBM.

Runs crossing block boundaries are handled by forcing an artificial end at
the last slot of every block: both partials accumulate (+=) into the same
cell, in sequential grid order.

Reference role: `coarse_cic_mass.f90` / `coarse_mass.f90:82-99` (the
reference avoids its own scatter races by OpenMP-striding the deposit over
k0 = 0..mesh_scale-1 planes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BS = 4096          # particles per grid step (lane dim of the block)


def _seg_kernel(key_s, end_s, w8_ref, end_v, acc_ref, t_ref, *, bs: int):
    """One particle block: vector cumsum + end-diff, then predicated
    column RMWs at run ends.

    key_s:  (1, bs) int32 SMEM — sorted base keys (loop reads)
    end_s:  (1, bs) int32 SMEM — run-end mask    (loop predicate)
    w8_ref: (8, bs) f32 VMEM  — corner weights
    end_v:  (8, bs) f32 VMEM  — run-end mask broadcast (vector math)
    acc_ref:(8, NC) f32 VMEM  — the resident accumulator (output)
    t_ref:  (8, bs) f32 VMEM scratch — per-run totals at end slots
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    w = w8_ref[:, :]
    e = end_v[:, :]

    # running sum along the particle (lane) axis — Hillis-Steele
    c = w
    d = 1
    while d < bs:
        c = c + jnp.concatenate(
            [jnp.zeros((c.shape[0], d), c.dtype), c[:, :-d]], axis=1)
        d *= 2

    # previous-end fill: cumsum is non-decreasing (weights >= 0), so the
    # cumsum value at the last end STRICTLY BEFORE each slot is a running
    # max of the end-masked cumsum, shifted one lane right
    ec = jnp.concatenate(
        [jnp.zeros((c.shape[0], 1), c.dtype), (e * c)[:, :-1]], axis=1)
    f = ec
    d = 1
    while d < bs:
        f = jnp.maximum(f, jnp.concatenate(
            [jnp.zeros((f.shape[0], d), f.dtype), f[:, :-d]], axis=1))
        d *= 2

    t_ref[:, :] = (c - f) * e     # per-run totals, nonzero only at ends

    def body(i, _):
        @pl.when(end_s[0, i] != 0)
        def _():
            k = key_s[0, i]
            acc_ref[:, pl.ds(k, 1)] += t_ref[:, pl.ds(i, 1)]
        return 0

    jax.lax.fori_loop(0, bs, body, 0)


def segment_deposit_sorted(skey: jnp.ndarray, w8: jnp.ndarray,
                           ncells: int, interpret=None) -> jnp.ndarray:
    """Sum w8 (8, N) into (8, ncells) by SORTED key (N,) — the Pallas
    segmented reduction described in the module docstring.

    skey must be non-decreasing with values in [0, ncells); zero-weight
    padding rows conventionally carry key ncells-1.  interpret=None auto-
    enables the Pallas interpreter on CPU backends (tests).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = skey.shape[0]
    nb = -(-n // _BS)
    pad = nb * _BS - n
    skey = jnp.pad(skey, (0, pad), constant_values=ncells - 1)
    w8 = jnp.pad(w8, ((0, 0), (0, pad)))
    # run ends; force one at every block boundary so runs crossing blocks
    # deposit a partial from each side
    idx = jnp.arange(nb * _BS, dtype=jnp.int32)
    ends = (jnp.concatenate([skey[1:] != skey[:-1],
                             jnp.ones((1,), bool)])
            | ((idx + 1) % _BS == 0)).astype(jnp.int32)
    nc_pad = -(-ncells // 128) * 128

    key2 = skey.reshape(1, -1)
    end2 = ends.reshape(1, -1)
    endv = jnp.broadcast_to(ends.astype(jnp.float32), (8, nb * _BS))

    smem = lambda: pl.BlockSpec((1, _BS), lambda i: (0, i),
                                memory_space=pltpu.SMEM)
    vrow = pl.BlockSpec((8, _BS), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec((8, nc_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        functools.partial(_seg_kernel, bs=_BS),
        grid=(nb,),
        in_specs=[smem(), smem(), vrow, vrow],
        out_specs=accspec,
        out_shape=jax.ShapeDtypeStruct((8, nc_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _BS), jnp.float32)],
        interpret=interpret,
    )(key2, end2, w8, endv)
    return acc[:, :ncells]


def cic_deposit_corner_seg(pos_t: jnp.ndarray, weight: jnp.ndarray,
                           shape, scale: float = 1.0, offset: float = 0.0,
                           pad: int = 0, interpret=None) -> jnp.ndarray:
    """Corner-split CIC deposit via the segmented Pallas kernel.

    pos_t (3, N) must be sorted by `deposit.cic_base_key_t` (the sweep's
    cfg.coarse_sort path guarantees this); weight is zero on padding.
    Equivalent to `deposit.cic_deposit_corner_t(..., valid, sorted)`.
    """
    from ..ops import deposit as dep
    nx, ny, nz = shape
    c0, w0, w1 = dep._cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape)[:, None] - 2)
    base = (c0[0] * ny + c0[1]) * nz + c0[2]
    valid = weight > 0.0
    base = jnp.where(valid, base, nx * ny * nz - 1)
    wx = jnp.stack([w0[0], w1[0]])
    wy = jnp.stack([w0[1], w1[1]])
    wz = jnp.stack([w0[2], w1[2]])
    w8 = (weight[None] * wx[:, None, None] * wy[None, :, None]
          * wz[None, None, :]).reshape(8, -1)
    acc = segment_deposit_sorted(base, w8, nx * ny * nz,
                                 interpret=interpret)
    acc = acc.reshape(2, 2, 2, nx, ny, nz)
    grid = jnp.zeros((nx, ny, nz), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                grid = grid.at[dx:, dy:, dz:].add(
                    acc[dx, dy, dz, :nx - dx, :ny - dy, :nz - dz])
    return grid
