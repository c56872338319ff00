"""Pallas TPU kernels for the fine-mesh NGP deposit and force gather.

The fine NGP deposit and gather are the last per-particle index ops in
the 256^3 step still paying XLA's random-HBM-access economics (~185 ms
each at 16.8M particles, profile_step.py).  Both are random only in
appearance: particles arrive SORTED by flat fine cell, so consecutive
particles touch consecutive grid addresses.  XLA cannot exploit that —
its scatter/gather lowers to a per-index loop regardless of the
`indices_are_sorted` hint (scripts/scatter_bench.py: 182 ms scatter-add,
382 ms for the cumsum+boundary-set reformulation, r3d log) — but Pallas
kernels can, by streaming aligned windows through VMEM and turning the
per-particle indexing into one-hot contractions on the MXU.

Key size bound (same as ops/gather_pallas.py): per-particle OCCUPIED-CELL
ranks advance by at most 1 per particle, so a block of B sorted particles
spans <= B ranks and two B-aligned rank windows ALWAYS suffice.  On the
grid side, keys are strictly increasing across ranks, so a window of W
grid cells spans <= W ranks and two aligned rank windows suffice there
too.  Four kernels share that structure:

  deposit:  A  (particle blocks -> per-rank mass sums + occupied keys)
            B  (rank windows -> grid windows: sequential expansion)
  gather:   B' (grid windows -> per-rank force table: sequential reads)
            A' (rank windows -> per-particle forces)

A/B replace the N-index scatter-add with elementwise cumsums + two
streaming passes; B'/A' replace the 3-component N-index gather the same
way.  All HBM traffic is sequential; the only "indexing" left is the
one-hot compare+dot inside VMEM.

Selection/accumulation exactness: each one-hot row selects with a single
1.0 and dots run at Precision.HIGHEST, so gathers reproduce f32 table
entries exactly, and deposit sums differ from the XLA scatter only by
f32 summation order (EXACT for the production unit-mass histogram:
mass_p is a power of two and per-cell counts are < 2^24).

Reference role: fine_ngp_mass.f90 (per-tile fine deposit) and the NGP
force interpolation in particle_mesh_threaded.f90:143-164,234-271 —
re-expressed as streaming window kernels for the TPU memory system.
"""
from __future__ import annotations

import functools
import json
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8            # sublane rows per particle/rank block
_LANES = 128         # lanes per row
_BP = _ROWS * _LANES  # particle block == rank window for kernels A/A'
_WG = 1024           # grid-window cells == rank window for kernels B/B'.
                     # Must be >= 8*_LANES: Mosaic requires the second-to-
                     # last block dim divisible by 8, and the B/B' window
                     # blocks are (_WG//_LANES, _LANES) — the original 512
                     # window (4, 128) failed lowering on hardware
                     # (bench_cache/fine_pallas_probe.json, r4).  Grids
                     # smaller than _WG (tests) shrink the window per-plan.
_KSPLIT = 4096       # key = khi*_KSPLIT + klo; both halves f32-exact

_HI = jax.lax.Precision.HIGHEST


def probe_verdict_path() -> str:
    override = os.environ.get("CUBEP3M_FINE_PROBE_FILE")
    if override:
        return override
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "bench_cache", "fine_pallas_probe.json")


def record_probe_verdict(backend: str, ok: bool, ms_deposit=None,
                         ms_gather=None, error: str = "") -> None:
    """Persist an on-hardware probe result (scripts/fine_probe.py) so
    unattended runs skip the kernels if they failed Mosaic lowering or
    lost the A/B on the real backend."""
    path = probe_verdict_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"backend": backend, "ok": bool(ok),
                   "ms_deposit": ms_deposit, "ms_gather": ms_gather,
                   "error": error[:500]}, f)
    os.replace(tmp, path)


def auto_enabled(backend: str | None = None) -> bool:
    """Resolve cfg.fine_pallas=None (auto): env override, then the
    recorded probe verdict, then OFF (unlike the coarse gather kernel,
    these kernels default off until a probe proves them on the real
    backend — they sit on the production deposit path)."""
    env = os.environ.get("CUBEP3M_FINE_PALLAS")
    if env is not None and env != "":
        return env not in ("0", "false", "False", "off")
    if backend is None:
        backend = jax.default_backend()
    try:
        with open(probe_verdict_path()) as f:
            verdict = json.load(f)
        if verdict.get("backend") == backend:
            return bool(verdict.get("ok"))
    except (OSError, ValueError):
        pass
    return False


class FinePlan(NamedTuple):
    """Shared rank structure for one (sorted-key, weight) particle set."""
    rank_rows: jnp.ndarray   # (gp*_ROWS, _LANES) int32 per-particle ranks
    m: jnp.ndarray           # (gp,) int32 aligned rank-window block index
    sums: jnp.ndarray        # (R,) f32 per-rank mass sums
    keys_occ: jnp.ndarray    # (R,) int32 occupied-cell keys (sentinel-padded)
    a0: jnp.ndarray          # (n_wind,) int32 rank block per grid window
    n: int                   # particle count
    nflat: int               # grid cells
    interpret: bool
    wg: int                  # grid-window cells (== _WG; smaller only on
                             # tiny test grids, interpret mode)


def _block_index(q_rows: int) -> jnp.ndarray:
    """Per-row rank-window block index for an (q_rows, _LANES) view."""
    return (jnp.arange(q_rows, dtype=jnp.int32) // _ROWS)[:, None]


# ---------------------------------------------------------------- kernel A
def _sums_kernel(m_ref, rank_ref, ch_ref, lo_ref, hi_ref):
    j = pl.program_id(0)
    base = m_ref[j] * _BP
    new = jnp.logical_or(j == 0, m_ref[j] != m_ref[jnp.maximum(j - 1, 0)])

    @pl.when(new)
    def _():
        lo_ref[:, :, :] = jnp.zeros_like(lo_ref)
        hi_ref[:, :, :] = jnp.zeros_like(hi_ref)

    local = rank_ref[:, :] - base                       # (8, 128)
    iota = jax.lax.broadcasted_iota(jnp.int32, (_BP, _LANES), 0)
    acc0 = jnp.zeros((3, _BP), jnp.float32)
    acc1 = jnp.zeros((3, _BP), jnp.float32)
    for r in range(_ROWS):
        lr = local[r:r + 1, :]                          # (1, 128)
        oh0 = (iota == lr).astype(jnp.float32)          # (_BP, 128)
        oh1 = (iota == (lr - _BP)).astype(jnp.float32)
        rows = ch_ref[:, r, :]                          # (3, 128)
        acc0 = acc0 + jax.lax.dot_general(
            rows, oh0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        acc1 = acc1 + jax.lax.dot_general(
            rows, oh1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
    lo_ref[:, :, :] += acc0.reshape(3, _ROWS, _LANES)
    hi_ref[:, :, :] += acc1.reshape(3, _ROWS, _LANES)


# ---------------------------------------------------------------- kernel B
def _expand_kernel(wg, a0_ref, k0_ref, k1_ref, s0_ref, s1_ref, out_ref):
    k = pl.program_id(0)
    base = k * wg
    wrows = wg // _LANES
    iota = jax.lax.broadcasted_iota(jnp.int32, (wg, _LANES), 0)
    acc = jnp.zeros((1, wg), jnp.float32)
    for kr, sr in ((k0_ref, s0_ref), (k1_ref, s1_ref)):
        for r in range(wrows):
            lr = kr[r:r + 1, :] - base                  # (1, 128)
            oh = (iota == lr).astype(jnp.float32)       # (wg, 128)
            acc = acc + jax.lax.dot_general(
                sr[r:r + 1, :], oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
    out_ref[:, :] = acc.reshape(wrows, _LANES)


# --------------------------------------------------------------- kernel B'
def _table_kernel(wg, a0_ref, f_ref, k0_ref, k1_ref, lo_ref, hi_ref):
    k = pl.program_id(0)
    base = k * wg
    wrows = wg // _LANES
    new = jnp.logical_or(k == 0,
                         a0_ref[k] != a0_ref[jnp.maximum(k - 1, 0)])

    @pl.when(new)
    def _():
        lo_ref[:, :, :] = jnp.zeros_like(lo_ref)
        hi_ref[:, :, :] = jnp.zeros_like(hi_ref)

    fwin = f_ref[:, :, :].reshape(3, wg)                # (3, wg)
    iota = jax.lax.broadcasted_iota(jnp.int32, (wg, _LANES), 0)
    for part, (kr, out) in enumerate(((k0_ref, lo_ref), (k1_ref, hi_ref))):
        accs = []
        for r in range(wrows):
            lr = kr[r:r + 1, :] - base                  # (1, 128)
            oh = (iota == lr).astype(jnp.float32)       # (wg, 128)
            accs.append(jax.lax.dot_general(
                fwin, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI))
        out[:, :, :] += jnp.concatenate(accs, axis=1).reshape(
            3, wrows, _LANES)


# --------------------------------------------------------------- kernel A'
def _pick_kernel(m_ref, rank_ref, t0_ref, t1_ref, out_ref):
    j = pl.program_id(0)
    base = m_ref[j] * _BP
    local = rank_ref[:, :] - base                       # (8, 128)
    iota = jax.lax.broadcasted_iota(jnp.int32, (_BP, _LANES), 0)
    t0 = t0_ref[:, :, :].reshape(3, _BP)
    t1 = t1_ref[:, :, :].reshape(3, _BP)
    rows = []
    for r in range(_ROWS):
        lr = local[r:r + 1, :]
        oh0 = (iota == lr).astype(jnp.float32)
        oh1 = (iota == (lr - _BP)).astype(jnp.float32)
        v = (jax.lax.dot_general(t0, oh0, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_HI)
             + jax.lax.dot_general(t1, oh1, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_HI))      # (3, 128)
        rows.append(v)
    out_ref[:, :, :] = jnp.concatenate(rows, axis=1).reshape(
        3, _ROWS, _LANES)


def make_plan(skey: jnp.ndarray, weight: jnp.ndarray, nflat: int,
              interpret: "bool | None" = None) -> FinePlan:
    """Rank structure + per-rank mass sums + occupied keys for key-SORTED
    particles.  skey: (N,) int32 flat fine cells, sentinel >= nflat for
    invalid slots (sorted last); weight: (N,) f32, zero at invalid."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = skey.shape[0]
    gp = -(-n // _BP)
    npad = gp * _BP - n

    flags = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (skey[1:] != skey[:-1]).astype(jnp.int32)])
    rank = jnp.cumsum(flags)                            # (N,) steps <= 1
    n_occ_total = rank[-1] + 1

    # static rank capacity: every particle distinct, plus alignment slack
    R = gp * _BP + 2 * _BP
    rank_p = jnp.concatenate(
        [rank, jnp.broadcast_to(rank[-1], (npad,))]).reshape(
            gp * _ROWS, _LANES)
    m = rank_p[::_ROWS, 0] // _BP                       # (gp,)
    m = jnp.minimum(m, R // _BP - 2).astype(jnp.int32)

    # channel rows: mass, and the boundary particle's key split into two
    # f32-exact halves (khi < nflat/_KSPLIT + 1, klo < _KSPLIT)
    skey_c = jnp.minimum(skey, nflat)                   # one shared sentinel
    bkey = jnp.where(flags > 0, skey_c, 0)
    bkey = bkey.at[0].set(skey_c[0])                    # rank 0's boundary
    ch = jnp.stack([
        jnp.pad(weight, (0, npad)),
        jnp.pad((bkey // _KSPLIT).astype(jnp.float32), (0, npad)),
        jnp.pad((bkey % _KSPLIT).astype(jnp.float32), (0, npad)),
    ]).reshape(3, gp * _ROWS, _LANES)

    row = pl.BlockSpec((_ROWS, _LANES), lambda j, m_: (j, 0),
                       memory_space=pltpu.VMEM)
    chrow = pl.BlockSpec((3, _ROWS, _LANES), lambda j, m_: (0, j, 0),
                         memory_space=pltpu.VMEM)
    wlo = pl.BlockSpec((3, _ROWS, _LANES), lambda j, m_: (0, m_[j], 0),
                       memory_space=pltpu.VMEM)
    whi = pl.BlockSpec((3, _ROWS, _LANES), lambda j, m_: (0, m_[j] + 1, 0),
                       memory_space=pltpu.VMEM)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(gp,),
        in_specs=[row, chrow], out_specs=(wlo, whi))
    out_sh = jax.ShapeDtypeStruct((3, R // _LANES, _LANES), jnp.float32)
    lo, hi = pl.pallas_call(_sums_kernel, grid_spec=gspec,
                            out_shape=(out_sh, out_sh),
                            interpret=interpret)(m, rank_p, ch)

    # mask the never-visited (garbage) rank-window blocks of each pass:
    # visited lo-blocks are the contiguous [m[0], m[-1]], hi-blocks +1
    # never-visited blocks hold GARBAGE (possibly non-finite): select with
    # where, not a 0/1 multiply (0 * nan = nan)
    bidx = _block_index(R // _LANES)
    mask_lo = (bidx >= m[0]) & (bidx <= m[-1])
    mask_hi = (bidx >= m[0] + 1) & (bidx <= m[-1] + 1)
    acc = (jnp.where(mask_lo, lo, 0.0)
           + jnp.where(mask_hi, hi, 0.0))               # (3, R/128, 128)
    acc = acc.reshape(3, R)
    slot = jnp.arange(R, dtype=jnp.int32)
    sums = jnp.where(slot < n_occ_total, acc[0], 0.0)
    keys_occ = (acc[1] * _KSPLIT + acc[2]).astype(jnp.int32)
    keys_occ = jnp.where(slot < n_occ_total, keys_occ, nflat)

    # grid-window size: _WG in production (every real fine mesh is a
    # multiple of 1024 cells); shrink by powers of two for tiny test grids
    wg = _WG
    while wg > _LANES and nflat % wg:
        wg //= 2
    n_wind = nflat // wg
    r0 = jnp.searchsorted(keys_occ,
                          jnp.arange(n_wind, dtype=jnp.int32) * wg)
    a0 = jnp.minimum((r0 // wg).astype(jnp.int32), R // wg - 2)
    return FinePlan(rank_p, m, sums, keys_occ, a0, n, nflat,
                    bool(interpret), wg)


def deposit_from_plan(plan: FinePlan,
                      shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Expand the per-rank sums onto the grid (sequential HBM writes)."""
    nflat = plan.nflat
    assert shape[0] * shape[1] * shape[2] == nflat
    wg = plan.wg
    wrows = wg // _LANES
    n_wind = nflat // wg
    R = plan.sums.shape[0]
    keys2 = plan.keys_occ.reshape(R // _LANES, _LANES)
    sums2 = plan.sums.reshape(R // _LANES, _LANES)

    def wspec(off):
        return pl.BlockSpec((wrows, _LANES),
                            lambda k, a_: (a_[k] + off, 0),
                            memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((wrows, _LANES), lambda k, a_: (k, 0),
                         memory_space=pltpu.VMEM)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_wind,),
        in_specs=[wspec(0), wspec(1), wspec(0), wspec(1)],
        out_specs=ospec)
    grid = pl.pallas_call(
        functools.partial(_expand_kernel, wg), grid_spec=gspec,
        out_shape=jax.ShapeDtypeStruct((nflat // _LANES, _LANES),
                                       jnp.float32),
        interpret=plan.interpret)(plan.a0, keys2, keys2, sums2, sums2)
    return grid.reshape(shape)


def gather_from_plan(plan: FinePlan, field: jnp.ndarray) -> jnp.ndarray:
    """(3, N) per-particle values of a (3, nx, ny, nz) field at the
    particles' fine cells (NGP), via a sequential-read rank table."""
    nflat = plan.nflat
    wg = plan.wg
    wrows = wg // _LANES
    n_wind = nflat // wg
    R = plan.sums.shape[0]
    keys2 = plan.keys_occ.reshape(R // _LANES, _LANES)
    f2 = field.reshape(3, nflat // _LANES, _LANES)

    fspec = pl.BlockSpec((3, wrows, _LANES), lambda k, a_: (0, k, 0),
                         memory_space=pltpu.VMEM)

    def kspec(off):
        return pl.BlockSpec((wrows, _LANES),
                            lambda k, a_: (a_[k] + off, 0),
                            memory_space=pltpu.VMEM)

    def tspec(off):
        return pl.BlockSpec((3, wrows, _LANES),
                            lambda k, a_: (0, a_[k] + off, 0),
                            memory_space=pltpu.VMEM)
    tsh = jax.ShapeDtypeStruct((3, R // _LANES, _LANES), jnp.float32)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_wind,),
        in_specs=[fspec, kspec(0), kspec(1)],
        out_specs=(tspec(0), tspec(1)))
    tlo, thi = pl.pallas_call(functools.partial(_table_kernel, wg),
                              grid_spec=gspec,
                              out_shape=(tsh, tsh),
                              interpret=plan.interpret)(
        plan.a0, f2, keys2, keys2)

    a0 = plan.a0
    # a0 counts wrows-row windows (not the _ROWS-row windows of kernel A)
    bidx = (jnp.arange(R // _LANES, dtype=jnp.int32)
            // wrows)[None, :, None]
    mask_lo = (bidx >= a0[0]) & (bidx <= a0[-1])
    mask_hi = (bidx >= a0[0] + 1) & (bidx <= a0[-1] + 1)
    table = (jnp.where(mask_lo, tlo, 0.0)
             + jnp.where(mask_hi, thi, 0.0))            # (3, R/128, 128)

    gp = plan.m.shape[0]
    rowspec = pl.BlockSpec((_ROWS, _LANES), lambda j, m_: (j, 0),
                           memory_space=pltpu.VMEM)

    def twin(off):
        return pl.BlockSpec((3, _ROWS, _LANES),
                            lambda j, m_: (0, m_[j] + off, 0),
                            memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((3, _ROWS, _LANES), lambda j, m_: (0, j, 0),
                         memory_space=pltpu.VMEM)
    gspec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(gp,),
        in_specs=[rowspec, twin(0), twin(1)], out_specs=ospec)
    out = pl.pallas_call(
        _pick_kernel, grid_spec=gspec2,
        out_shape=jax.ShapeDtypeStruct((3, gp * _ROWS, _LANES),
                                       jnp.float32),
        interpret=plan.interpret)(plan.m, plan.rank_rows, table, table)
    return out.reshape(3, gp * _BP)[:, :plan.n]


def ngp_deposit_ranked(skey: jnp.ndarray, weight: jnp.ndarray,
                       shape: Tuple[int, int, int],
                       interpret: "bool | None" = None) -> jnp.ndarray:
    """Drop-in for deposit.ngp_deposit over pre-sorted flat keys."""
    plan = make_plan(skey, weight, shape[0] * shape[1] * shape[2],
                     interpret=interpret)
    return deposit_from_plan(plan, shape)


def ngp_gather_ranked(field: jnp.ndarray, skey: jnp.ndarray,
                      weight: jnp.ndarray,
                      interpret: "bool | None" = None) -> jnp.ndarray:
    """Drop-in for deposit.ngp_gather over pre-sorted flat keys."""
    nx, ny, nz = field.shape[-3:]
    plan = make_plan(skey, weight, nx * ny * nz, interpret=interpret)
    return gather_from_plan(plan, field)
