"""Pallas TPU kernel: coarse corner CIC force gather over SORTED particles.

The XLA windowed gather pays ~20-35 ns per particle regardless of hints
(the 24-wide corner-packed coarse gather is ~600 ms at 17.6M particles,
the single largest index op left in the 256^3 step).  For particles
sorted by coarse base key (cfg.coarse_sort) the accesses are monotone,
which XLA cannot exploit — but a Pallas kernel can: stream aligned
windows of the force table through VMEM and SELECT each particle's
column with a one-hot matmul on the MXU (~1 table read + B*C*24 MACs
per block instead of B random HBM touches).

The window size would be unbounded for raw cell keys (a block of B
particles can straddle arbitrarily many EMPTY cells in voids), so keys
are first compressed to OCCUPIED-cell ranks: rank[i] = #distinct keys
before particle i, computed by a cumsum over run-start flags.  Ranks
advance by at most 1 per particle, so a block of B particles spans < B
ranks and two C-aligned windows (C = B) are ALWAYS sufficient — no
overflow fallback needed.  The table is compacted to occupied columns
once per solve (one ~n_occ-index 24-wide gather, n_occ <= min(ncells, N)).

Selection is exact: each one-hot row has a single 1.0, and at
Precision.HIGHEST the dot reproduces the selected f32 table entry to
f32 (pinned by tests/test_gather_pallas.py against the XLA corner
gather, and on hardware by scripts/gather_probe.py's host-reference
check — the MXU's default-precision pass would quantize the table
operand to bf16).

Reference role: coarse_velocity.f90's per-particle CIC force
interpolation; the windowed-streaming idea mirrors the reference's
per-tile locality, re-expressed for the MXU.
"""
from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_verdict_path() -> str:
    """Location of the recorded on-hardware probe verdict (repo-local)."""
    override = os.environ.get("CUBEP3M_GATHER_PROBE_FILE")
    if override:
        return override
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "bench_cache", "gather_pallas_probe.json")


def record_probe_verdict(backend: str, ok: bool, ms: float | None = None,
                         error: str = "") -> None:
    """Persist a probe result (scripts/gather_probe.py) so later auto
    decisions — including the driver's unattended `bench.py` run — skip a
    kernel that failed Mosaic lowering on the real backend."""
    path = probe_verdict_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"backend": backend, "ok": bool(ok), "ms": ms,
                   "error": error[:500]}, f)
    os.replace(tmp, path)


def auto_enabled(backend: str | None = None) -> bool:
    """Resolve cfg.coarse_gather_pallas=None (auto).

    Priority: CUBEP3M_GATHER_PALLAS env (0/1), then the recorded probe
    verdict for this backend, then the backend default (on for TPU).  A
    Mosaic lowering failure is unrecoverable inside a compiled sweep, so
    a recorded bad verdict turns auto OFF until a new probe overwrites it.
    """
    env = os.environ.get("CUBEP3M_GATHER_PALLAS")
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
    return backend == "tpu"

_ROWS = 8            # sublane rows per grid block
_LANES = 128         # lanes per row
_B = _ROWS * _LANES  # particles per grid block == rank-window size C


def _gather_kernel(m_ref, rank_ref, px_ref, py_ref, pz_ref,
                   t0_ref, t1_ref, ox_ref, oy_ref, oz_ref, *,
                   inv_scale: float, offset: float):
    """One block: 8 rows x 128 lanes of particles; t0/t1 are the two
    C-aligned (24, C) windows of the rank-compacted corner table."""
    j = pl.program_id(0)
    base = m_ref[j] * _B

    # CIC weights from positions (w0 = 1-frac, w1 = frac per axis)
    tx = px_ref[:, :] * inv_scale + offset
    ty = py_ref[:, :] * inv_scale + offset
    tz = pz_ref[:, :] * inv_scale + offset
    fx = tx - jnp.floor(tx)
    fy = ty - jnp.floor(ty)
    fz = tz - jnp.floor(tz)

    local = rank_ref[:, :] - base                     # (8, 128) in [0, 2C)
    iota = jax.lax.broadcasted_iota(jnp.int32, (_B, _LANES), 0)

    # everything stays 2-D: Mosaic's vector layouts dislike rank-1 values
    rows = [[], [], []]                               # per-component (1,128)
    for r in range(_ROWS):
        lr = local[r:r + 1, :]                        # (1, 128)
        # one-hot selection via MXU: (24, C) @ (C, 128) -> (24, 128)
        oh0 = (iota == lr).astype(jnp.float32)        # cols in window 0
        oh1 = (iota == (lr - _B)).astype(jnp.float32)
        # HIGHEST precision is required for exact selection: the MXU's
        # default pass quantizes the f32 table operand to bf16 (~0.4%
        # rel error, measured 1.3e-2 max abs on an O(1) field at 17.6M
        # particles); the one-hot operand is exact either way.  The
        # matmuls are far from MXU-bound here (DMA-bound kernel), so the
        # extra passes cost little.
        P = jax.lax.Precision.HIGHEST
        v = (jax.lax.dot_general(
                t0_ref[:, :], oh0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P)
             + jax.lax.dot_general(
                t1_ref[:, :], oh1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P))  # (24, 128)
        # (8, 128) corner weights, corner-major to match the table rows
        wx1 = fx[r:r + 1, :]
        wy1 = fy[r:r + 1, :]
        wz1 = fz[r:r + 1, :]
        w8 = jnp.concatenate(
            [(wx1 if dx else 1.0 - wx1) * (wy1 if dy else 1.0 - wy1)
             * (wz1 if dz else 1.0 - wz1)
             for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)], axis=0)
        prod = v * jnp.concatenate([w8, w8, w8], axis=0)   # (24, 128)
        for c in range(3):
            rows[c].append(jnp.sum(prod[c * 8:(c + 1) * 8, :], axis=0,
                                   keepdims=True))     # (1, 128)
    ox_ref[:, :] = jnp.concatenate(rows[0], axis=0)
    oy_ref[:, :] = jnp.concatenate(rows[1], axis=0)
    oz_ref[:, :] = jnp.concatenate(rows[2], axis=0)


def _corner_table(field: jnp.ndarray) -> jnp.ndarray:
    """(24, ncells + 1) component-major corner-packed table of a (3, nx,
    ny, nz) field: row c*8 + corner = field[c] shifted by the corner
    offset; the final column is the zero sink for sentinel ranks."""
    C_, nx, ny, nz = field.shape
    rows = []
    for c in range(C_):
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    rows.append(jnp.pad(
                        field[c, dx:, dy:, dz:],
                        ((0, dx), (0, dy), (0, dz))).reshape(-1))
    packed = jnp.stack(rows)                          # (24, ncells)
    return jnp.pad(packed, ((0, 0), (0, 1)))


def cic_gather_corner_ranked(field: jnp.ndarray, pos_t: jnp.ndarray,
                             keys: jnp.ndarray, counts: jnp.ndarray,
                             scale: float = 1.0, offset: float = 0.0,
                             interpret: "bool | None" = None
                             ) -> jnp.ndarray:
    """Corner CIC gather for base-key-SORTED SoA particles.

    field: (3, nx, ny, nz) halo-padded force; pos_t: (3, N) sorted by
    `keys`; keys: (N,) int32 flat base keys (sentinel = ncells for
    invalid slots, sorted last); counts: (ncells,) int32 valid particles
    per base key (the coarse deposit already has this).  Returns (3, N)
    matching `cic_gather_corner_t(..., valid, sorted_cells=True)` for
    in-range positions.
    """
    if interpret is None:
        # auto: Mosaic on TPU, interpreter elsewhere (CPU equality tests)
        interpret = jax.default_backend() != "tpu"
    nx, ny, nz = field.shape[-3:]
    ncells = nx * ny * nz
    n = pos_t.shape[1]
    grid = -(-n // _B)
    npad = grid * _B - n

    # ---- rank compression (all dense/elementwise; no per-index ops) ----
    occ = counts > 0                                   # (ncells,)
    # occupied cell c gets compact column cumsum(occ)[c]-1
    occ_rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
    # compact column -> cell id (scatter with monotone indices); fill
    # columns past n_occ stay at ncells -> the zero sink column.
    # Non-occupied cells write OUT OF BOUNDS (ncells + 1) and are dropped
    # (writing them all to one in-bounds slot would corrupt it).
    # static worst-case column count: every cell occupied, plus the sink,
    # plus one alignment window
    ncols = (ncells // _B + 2) * _B
    occ_ids = jnp.full((ncols,), ncells, jnp.int32)
    occ_ids = occ_ids.at[jnp.where(occ, occ_rank, ncols)].set(
        jnp.arange(ncells, dtype=jnp.int32), mode="drop",
        indices_are_sorted=False)
    table = _corner_table(field)                       # (24, ncells+1)
    tocc = table[:, occ_ids]                           # (24, ncols) gather

    # per-particle occupied-cell rank: runs advance by at most 1
    flags = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (keys[1:] != keys[:-1]).astype(jnp.int32)])
    rank = jnp.cumsum(flags)
    # sentinel slots (key >= ncells, sorted last) land one past the last
    # valid rank — send them to the zero sink column instead.  (If ALL
    # slots are sentinels, rank 0 reads column 0 of an all-zero table.)
    rank = jnp.where(keys >= ncells, ncols - 1, rank)

    rank_p = jnp.pad(rank, (0, npad),
                     constant_values=0).reshape(grid * _ROWS, _LANES)
    # padded ranks reuse rank 0 but their one-hot still selects a real
    # column; the caller masks invalid lanes by `valid` anyway, and the
    # out-of-range guard below zeroes them in the sweep.
    px = jnp.pad(pos_t[0], (0, npad)).reshape(grid * _ROWS, _LANES)
    py = jnp.pad(pos_t[1], (0, npad)).reshape(grid * _ROWS, _LANES)
    pz = jnp.pad(pos_t[2], (0, npad)).reshape(grid * _ROWS, _LANES)

    # window index per block from the block's FIRST rank
    m = rank_p[::_ROWS, 0] // _B                       # (grid,)
    m = jnp.minimum(m, ncols // _B - 2)

    kern = functools.partial(_gather_kernel,
                             inv_scale=1.0 / float(scale),
                             offset=float(offset))
    row = pl.BlockSpec((_ROWS, _LANES), lambda j, m_: (j, 0),
                       memory_space=pltpu.VMEM)
    win0 = pl.BlockSpec((24, _B), lambda j, m_: (0, m_[j]),
                        memory_space=pltpu.VMEM)
    win1 = pl.BlockSpec((24, _B), lambda j, m_: (0, m_[j] + 1),
                        memory_space=pltpu.VMEM)
    out_row = pl.BlockSpec((_ROWS, _LANES), lambda j, m_: (j, 0),
                           memory_space=pltpu.VMEM)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[row, row, row, row, win0, win1],
        out_specs=(out_row, out_row, out_row),
    )
    ox, oy, oz = pl.pallas_call(
        kern, grid_spec=gspec,
        out_shape=tuple(jax.ShapeDtypeStruct((grid * _ROWS, _LANES),
                                             jnp.float32) for _ in range(3)),
        interpret=interpret,
    )(m, rank_p, px, py, pz, tocc, tocc)
    return jnp.stack([ox.reshape(-1)[:n], oy.reshape(-1)[:n],
                      oz.reshape(-1)[:n]])
