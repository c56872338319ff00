"""Mass assignment (NGP/CIC deposit) and force interpolation (gather).

TPU-native replacement for the reference's linked-list cell walks
(`source_threads/fine_ngp_mass.f90`, `coarse_cic_mass.f90:82-99`,
`coarse_velocity.f90:137-179`): instead of chasing `ll(pp)` chains per cell,
we express deposit as a masked scatter-add and gather as vectorized
interpolation over the whole padded particle array.  Shapes are static
(`max_np` capacity); invalid slots carry zero weight.

Index conventions (0-based; reference is 1-based Fortran):
  NGP fine:   cell = floor(x)                    (particle_mesh_threaded.f90:143-150)
  CIC coarse: xs = x/mesh_scale - 0.5, c0 = floor(xs),
              weight(c0) = 1-frac, weight(c0+1) = frac   (coarse_mass.f90, coarse_velocity.f90)

The `sorted_ids` fast path exploits that particles are kept sorted by cell
key (see ops/binning.py): a scatter-add with sorted indices lowers to an
efficient segment-sum on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _flat_index(cells: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """(N,3) int cells -> flat index, row-major over `shape`."""
    return (cells[:, 0] * shape[1] + cells[:, 1]) * shape[2] + cells[:, 2]


def ngp_deposit(pos: jnp.ndarray, weight: jnp.ndarray,
                shape: Tuple[int, int, int], offset: float = 0.0,
                sorted_cells: bool = False) -> jnp.ndarray:
    """NGP deposit of `weight` at floor(pos + offset) into a grid of `shape`.

    pos: (N, 3) float32; weight: (N,) float32 (0 for invalid slots).
    Out-of-range cells are clamped and given zero weight.
    """
    cells = jnp.floor(pos + offset).astype(jnp.int32)
    in_range = jnp.all((cells >= 0) & (cells < jnp.array(shape)), axis=1)
    cells = jnp.clip(cells, 0, jnp.array(shape) - 1)
    w = jnp.where(in_range, weight, 0.0)
    flat = _flat_index(cells, shape)
    grid = jnp.zeros(shape[0] * shape[1] * shape[2], dtype=jnp.float32)
    grid = grid.at[flat].add(w, indices_are_sorted=sorted_cells,
                             unique_indices=False)
    return grid.reshape(shape)


def _cic_weights(pos: jnp.ndarray, scale: float, offset: float
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (c0, w0, w1): base cell and CIC weights per axis.

    xs = pos/scale + offset; w0 is the weight of cell floor(xs)
    (reference dx1 = 1 - frac), w1 of cell floor(xs)+1.
    """
    xs = pos / scale + offset
    c0 = jnp.floor(xs)
    frac = xs - c0
    return c0.astype(jnp.int32), 1.0 - frac, frac


def cic_deposit(pos: jnp.ndarray, weight: jnp.ndarray,
                shape: Tuple[int, int, int], scale: float = 1.0,
                offset: float = 0.0, pad: int = 0,
                sorted_cells: bool = False) -> jnp.ndarray:
    """CIC deposit onto a grid of `shape` (which includes 2*pad ghost cells).

    Grid index = floor(pos/scale + offset) + pad (+corner).  Reference coarse
    deposit uses scale=mesh_scale, offset=-0.5, pad=1 (`coarse_mass.f90`).
    """
    c0, w0, w1 = _cic_weights(pos, scale, offset)
    c0 = c0 + pad
    nflat = shape[0] * shape[1] * shape[2]
    grid = jnp.zeros(nflat, dtype=jnp.float32)
    shape_arr = jnp.array(shape)
    for dx in (0, 1):
        wx = (w1 if dx else w0)[:, 0]
        for dy in (0, 1):
            wy = (w1 if dy else w0)[:, 1]
            for dz in (0, 1):
                wz = (w1 if dz else w0)[:, 2]
                cells = c0 + jnp.array([dx, dy, dz], dtype=jnp.int32)
                ok = jnp.all((cells >= 0) & (cells < shape_arr), axis=1)
                w = jnp.where(ok, weight * wx * wy * wz, 0.0)
                cells = jnp.clip(cells, 0, shape_arr - 1)
                grid = grid.at[_flat_index(cells, shape)].add(
                    w, indices_are_sorted=sorted_cells)
    return grid.reshape(shape)


def cic_base_key(pos: jnp.ndarray, shape: Tuple[int, int, int],
                 scale: float = 1.0, offset: float = 0.0, pad: int = 0,
                 valid: jnp.ndarray = None) -> jnp.ndarray:
    """The EXACT flat base-cell index the corner deposit/gather will use
    (same clip), as a sort key; invalid slots get the sentinel `ncells`
    (so they sort last, one past the `ncells-1` the ops clip them to).
    Sorting particles by this key makes `cic_deposit_corner`'s scatter and
    `cic_gather_corner`'s gather monotone (`sorted_cells=True` legal):
    unsorted coarse scatters run ~3x the sorted-scatter floor at 256^3
    (scripts/profile_step.py)."""
    nx, ny, nz = shape
    c0, _, _ = _cic_weights(pos, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape) - 2)
    key = _flat_index(c0, shape)
    if valid is not None:
        key = jnp.where(valid, key, nx * ny * nz)
    return key


def cic_deposit_corner(pos: jnp.ndarray, weight: jnp.ndarray,
                       shape: Tuple[int, int, int], scale: float = 1.0,
                       offset: float = 0.0, pad: int = 0,
                       valid: jnp.ndarray = None,
                       sorted_cells: bool = False) -> jnp.ndarray:
    """CIC deposit with ONE scatter (corner-split accumulator).

    Equivalent to `cic_deposit` but TPU-fast: scatter/gather cost on TPU is
    ~per-INDEX, nearly independent of payload width (scripts/scatter_bench),
    so instead of 8 corner scatter-adds we scatter all 8 corner weights at
    the particle's base cell into an (8, nx*ny*nz) accumulator (one
    (N,)-index scatter with an 8-wide payload in the sublane axis — no
    layout padding), then recombine with 8 static shifted adds on the tiny
    coarse grid.  ~4x faster at 128^3 (228 -> 57 ms).

    Requires every corner in range after clipping the base cell to
    [0, shape-2] — callers use pad >= 1 (as the sweep's coarse deposit
    does, matching `coarse_cic_mass_buffer.f90` clipping semantics).
    """
    nx, ny, nz = shape
    c0, w0, w1 = _cic_weights(pos, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape) - 2)
    base = _flat_index(c0, shape)
    if valid is not None:
        # invalid slots (zero weight) pinned to the LAST cell so a
        # cic_base_key-sorted index array stays monotone end to end
        base = jnp.where(valid, base, nx * ny * nz - 1)
    wx = jnp.stack([w0[:, 0], w1[:, 0]])             # (2, N)
    wy = jnp.stack([w0[:, 1], w1[:, 1]])
    wz = jnp.stack([w0[:, 2], w1[:, 2]])
    # (8, N) corner weights, corner-major (dx, dy, dz)
    w8 = (weight[None] * wx[:, None, None] * wy[None, :, None]
          * wz[None, None, :]).reshape(8, -1)
    acc = jnp.zeros((8, nx * ny * nz), jnp.float32)
    acc = acc.at[:, base].add(w8, indices_are_sorted=sorted_cells)
    acc = acc.reshape(2, 2, 2, nx, ny, nz)
    grid = jnp.zeros((nx, ny, nz), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                grid = grid.at[dx:, dy:, dz:].add(
                    acc[dx, dy, dz, :nx - dx, :ny - dy, :nz - dz])
    return grid


def cic_gather_corner(field: jnp.ndarray, pos: jnp.ndarray,
                      scale: float = 1.0, offset: float = 0.0,
                      pad: int = 0, valid: jnp.ndarray = None,
                      sorted_cells: bool = False) -> jnp.ndarray:
    """CIC interpolation with ONE gather (corner-packed field).

    Equivalent to `cic_gather` for (C, X, Y, Z) fields: the 8 corner values
    of every cell are pre-packed into a (8*C, X*Y*Z) table by static shifts
    (dense, tiny at coarse resolution), then one (N,)-index gather reads all
    corners of a particle's base cell and the trilinear dot happens on the
    VPU.  8x fewer gather indices (256 -> ~60 ms at 128^3).
    """
    C = field.shape[0]
    nx, ny, nz = field.shape[-3:]
    c0, w0, w1 = _cic_weights(pos, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(field.shape[-3:]) - 2)
    base = _flat_index(c0, (nx, ny, nz))
    if valid is not None:
        base = jnp.where(valid, base, nx * ny * nz - 1)
    corners = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corners.append(jnp.pad(
                    field[:, dx:, dy:, dz:],
                    ((0, 0), (0, dx), (0, dy), (0, dz))))
    packed = jnp.stack(corners).reshape(8 * C, -1)   # (8C, XYZ)
    vals = packed.at[:, base].get(
        indices_are_sorted=sorted_cells).reshape(2, 2, 2, C, -1)
    wx = jnp.stack([w0[:, 0], w1[:, 0]])             # (2, N)
    wy = jnp.stack([w0[:, 1], w1[:, 1]])
    wz = jnp.stack([w0[:, 2], w1[:, 2]])
    out = jnp.einsum("xyzcn,xn,yn,zn->nc", vals, wx, wy, wz)
    return out


def ngp_gather(field: jnp.ndarray, pos: jnp.ndarray,
               offset: float = 0.0,
               flat_cells: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sample `field` (..., X, Y, Z) at floor(pos + offset).

    Returns (N, ...) with leading particle axis; out-of-range positions
    clamp.  Pass precomputed `flat_cells` (row-major) to skip the index
    computation and use a single flat gather (fast path for cell-sorted
    particles).
    """
    shape = field.shape[-3:]
    if flat_cells is None:
        cells = jnp.floor(pos + offset).astype(jnp.int32)
        cells = jnp.clip(cells, 0, jnp.array(shape) - 1)
        flat_cells = ((cells[:, 0] * shape[1] + cells[:, 1]) * shape[2]
                      + cells[:, 2])
    if field.ndim > 3:
        flat = field.reshape(field.shape[0], -1).T          # (XYZ, C)
        return flat[flat_cells]
    return field.reshape(-1)[flat_cells]


def cic_gather(field: jnp.ndarray, pos: jnp.ndarray, scale: float = 1.0,
               offset: float = 0.0, pad: int = 0) -> jnp.ndarray:
    """CIC-interpolate `field` (..., X, Y, Z) at particle positions.

    Mirror of `cic_deposit`; used for the coarse force kick
    (`coarse_velocity.f90:137-179`).  The 8 corner reads batch into ONE
    gather of (N, 8) flat indices — 8 separate advanced-index gathers cost
    ~8x more on TPU.
    """
    shape = field.shape[-3:]
    nx, ny, nz = shape
    c0, w0, w1 = _cic_weights(pos, scale, offset)
    c0 = c0 + pad
    c0 = jnp.clip(c0, 0, jnp.array(shape) - 2)
    base = (c0[:, 0] * ny + c0[:, 1]) * nz + c0[:, 2]          # (N,)
    corner_off = jnp.array(
        [dx * ny * nz + dy * nz + dz
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)], jnp.int32)
    idx = base[:, None] + corner_off[None, :]                   # (N, 8)
    wx = jnp.stack([w0[:, 0], w1[:, 0]], 1)                     # (N, 2)
    wy = jnp.stack([w0[:, 1], w1[:, 1]], 1)
    wz = jnp.stack([w0[:, 2], w1[:, 2]], 1)
    wgt = (wx[:, :, None, None] * wy[:, None, :, None]
           * wz[:, None, None, :]).reshape(-1, 8)               # (N, 8)
    if field.ndim > 3:
        flat = field.reshape(field.shape[0], -1).T              # (XYZ, C)
        vals = flat[idx]                                        # (N, 8, C)
        return jnp.einsum("nk,nkc->nc", wgt, vals)
    flat = field.reshape(-1)
    return jnp.sum(flat[idx] * wgt, axis=1)


# ----------------------------------------------------------------------
# SoA (C, N) variants — the staged 256^3+ path keeps particles transposed
# because (M, small) intermediates materialize lane-padded 42x on TPU.
# ----------------------------------------------------------------------
def ngp_deposit_t(pos_t: jnp.ndarray, weight: jnp.ndarray,
                  shape: Tuple[int, int, int],
                  sorted_cells: bool = False) -> jnp.ndarray:
    """`ngp_deposit` for SoA (3, N) positions."""
    cells = jnp.floor(pos_t).astype(jnp.int32)
    shp = jnp.array(shape)[:, None]
    in_range = jnp.all((cells >= 0) & (cells < shp), axis=0)
    cells = jnp.clip(cells, 0, shp - 1)
    w = jnp.where(in_range, weight, 0.0)
    flat = (cells[0] * shape[1] + cells[1]) * shape[2] + cells[2]
    grid = jnp.zeros(shape[0] * shape[1] * shape[2], dtype=jnp.float32)
    grid = grid.at[flat].add(w, indices_are_sorted=sorted_cells)
    return grid.reshape(shape)


def ngp_gather_t(field: jnp.ndarray, flat_cells: jnp.ndarray) -> jnp.ndarray:
    """NGP force gather returning SoA (C, N): one column gather from the
    (C, XYZ)-flattened field."""
    return field.reshape(field.shape[0], -1)[:, flat_cells]


def _cic_weights_t(pos_t: jnp.ndarray, scale: float, offset: float):
    """(c0, w0, w1) per-axis for SoA (3, N) positions; each (3, N)."""
    xs = pos_t / scale + offset
    c0 = jnp.floor(xs)
    frac = xs - c0
    return c0.astype(jnp.int32), 1.0 - frac, frac


def cic_deposit_t(pos_t: jnp.ndarray, weight: jnp.ndarray,
                  shape: Tuple[int, int, int], scale: float = 1.0,
                  offset: float = 0.0, pad: int = 0,
                  sorted_cells: bool = False) -> jnp.ndarray:
    """`cic_deposit` for SoA (3, N) positions."""
    c0, w0, w1 = _cic_weights_t(pos_t, scale, offset)
    c0 = c0 + pad
    nflat = shape[0] * shape[1] * shape[2]
    grid = jnp.zeros(nflat, dtype=jnp.float32)
    shp = jnp.array(shape)[:, None]
    for dx in (0, 1):
        wx = (w1 if dx else w0)[0]
        for dy in (0, 1):
            wy = (w1 if dy else w0)[1]
            for dz in (0, 1):
                wz = (w1 if dz else w0)[2]
                cells = c0 + jnp.array([dx, dy, dz],
                                       dtype=jnp.int32)[:, None]
                ok = jnp.all((cells >= 0) & (cells < shp), axis=0)
                w = jnp.where(ok, weight * wx * wy * wz, 0.0)
                cells = jnp.clip(cells, 0, shp - 1)
                flat = ((cells[0] * shape[1] + cells[1]) * shape[2]
                        + cells[2])
                grid = grid.at[flat].add(w,
                                         indices_are_sorted=sorted_cells)
    return grid.reshape(shape)


def cic_base_key_t(pos_t: jnp.ndarray, shape: Tuple[int, int, int],
                   scale: float = 1.0, offset: float = 0.0, pad: int = 0,
                   valid: jnp.ndarray = None) -> jnp.ndarray:
    """`cic_base_key` for SoA (3, N) positions."""
    nx, ny, nz = shape
    c0, _, _ = _cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape)[:, None] - 2)
    key = (c0[0] * ny + c0[1]) * nz + c0[2]
    if valid is not None:
        key = jnp.where(valid, key, nx * ny * nz)
    return key


def cic_deposit_corner_t(pos_t: jnp.ndarray, weight: jnp.ndarray,
                         shape: Tuple[int, int, int], scale: float = 1.0,
                         offset: float = 0.0, pad: int = 0,
                         valid: jnp.ndarray = None,
                         sorted_cells: bool = False) -> jnp.ndarray:
    """`cic_deposit_corner` for SoA (3, N) positions: ONE scatter of all 8
    corner weights at the base cell into an (8, ncells) accumulator, then
    8 static shifted adds (per-index scatter economics, scatter_bench)."""
    nx, ny, nz = shape
    c0, w0, w1 = _cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape)[:, None] - 2)
    base = (c0[0] * ny + c0[1]) * nz + c0[2]
    if valid is not None:
        base = jnp.where(valid, base, nx * ny * nz - 1)
    wx = jnp.stack([w0[0], w1[0]])                   # (2, N)
    wy = jnp.stack([w0[1], w1[1]])
    wz = jnp.stack([w0[2], w1[2]])
    w8 = (weight[None] * wx[:, None, None] * wy[None, :, None]
          * wz[None, None, :]).reshape(8, -1)       # (8, N) corner-major
    acc = jnp.zeros((8, nx * ny * nz), jnp.float32)
    acc = acc.at[:, base].add(w8, indices_are_sorted=sorted_cells)
    acc = acc.reshape(2, 2, 2, nx, ny, nz)
    grid = jnp.zeros((nx, ny, nz), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                grid = grid.at[dx:, dy:, dz:].add(
                    acc[dx, dy, dz, :nx - dx, :ny - dy, :nz - dz])
    return grid


def _corner_recombine(acc: jnp.ndarray,
                      shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Fold an (8, nx*ny*nz) corner-major accumulator back onto the grid
    with 8 static shifted adds (dense, tiny at coarse resolution)."""
    nx, ny, nz = shape
    acc = acc.reshape(2, 2, 2, nx, ny, nz)
    grid = jnp.zeros((nx, ny, nz), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                grid = grid.at[dx:, dy:, dz:].add(
                    acc[dx, dy, dz, :nx - dx, :ny - dy, :nz - dz])
    return grid


def coarse_counts_from_fine_hist(hist: jnp.ndarray, scale: int,
                                 pad: int) -> jnp.ndarray:
    """Per-coarse-BASE-cell particle counts from the fine NGP histogram.

    The offset=-0.5 CIC base b = floor(x/scale - 0.5) + pad is a pure
    function of the fine cell f = floor(x): the -0.5 coarse-cell offset is
    an integer scale//2 fine cells, so b = (f - scale//2)//scale + pad and
    the exact per-base counts are a shifted scale^3 sum-pool of the fine
    histogram (no second particle pass).  Requires even `scale` and the
    clip-free regime of cic_deposit_corner (pad >= 1, x in [0, nf)).

    hist: (nf, nf, nf) float32 counts of VALID particles per fine cell
    (the sweep's unit-weight fine NGP deposit).  Returns an
    (ncp, ncp, ncp) int32 grid, ncp = nf//scale + 2*pad, flattenable in
    cic_base_key's row-major order.
    """
    assert scale % 2 == 0, "integer-shift argument needs even mesh_scale"
    nf = hist.shape[0]
    ncp = nf // scale + 2 * pad
    shift = scale // 2
    lo, hi = pad * scale - shift, pad * scale + shift
    h = jnp.pad(hist, ((lo, hi), (lo, hi), (lo, hi)))
    h = sum_pool3(h, scale)
    assert h.shape == (ncp, ncp, ncp)
    return jnp.round(h).astype(jnp.int32)


def sum_pool3(grid: jnp.ndarray, scale: int) -> jnp.ndarray:
    """scale^3 sum-pooling of a 3-D grid via per-axis strided slice-adds.

    NEVER reshape to (n, s, n, s, n, s) on TPU: the tiled T(8,128) layout
    pads the size-s minor dims to (8,128) — an 18.8 GB temp for a 520^3
    fine grid at s=4 (the compile-time OOM that killed the first csum
    256^3 bench).  Strided slices keep 3-D shapes with large minor dims.
    """
    h = grid
    for ax in range(3):
        parts = [jax.lax.slice_in_dim(h, s, h.shape[ax], stride=scale,
                                      axis=ax) for s in range(scale)]
        h = parts[0]
        for p in parts[1:]:
            h = h + p
    return h


def sorted_key_counts(keys: jnp.ndarray, weight: jnp.ndarray,
                      ncells: int) -> jnp.ndarray:
    """(ncells,) int32 valid-particle counts per flat base key, for
    key-SORTED particles (1-payload sorted histogram scatter).  Invalid
    slots carry zero weight and the sentinel key (sorted last)."""
    hist = jnp.zeros((ncells,), jnp.float32)
    hist = hist.at[jnp.minimum(keys, ncells - 1)].add(
        jnp.where(weight > 0, 1.0, 0.0), indices_are_sorted=True)
    return hist.astype(jnp.int32)


def cic_deposit_corner_csum_t(pos_t: jnp.ndarray, weight: jnp.ndarray,
                              shape: Tuple[int, int, int],
                              scale: float = 1.0, offset: float = 0.0,
                              pad: int = 0,
                              counts: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """Segmented-sum corner CIC deposit for base-key-SORTED particles.

    Requires pos_t SORTED by `cic_base_key_t` (invalid slots carrying
    zero `weight` sorted last by the sentinel key).  The deposit is then
    a segmented sum over ~(particles-per-cell)-long runs: a compensated
    (8, N) cumsum along particles plus TWO gathers at the run boundaries
    (~N/8 indices) replaces the N-index windowed scatter-add, which runs
    ~3-6x slower on TPU regardless of the indices_are_sorted hint
    (scripts/coarse_deposit_probe.py; ~20 ns/index scatter economics).

    counts: optional (ncells,) int32 — valid particles per flat base key
    (e.g. `coarse_counts_from_fine_hist(...).reshape(-1)`).  If None, a
    1-payload sorted histogram scatter computes it (still ~2x faster
    overall than the windowed scatter).

    Precision: XLA's cumsum is a tree scan (O(log N) error growth) and
    the Fast2Sum-compensated second cumsum captures the stored-prefix
    rounding residuals, so boundary differences match a float64 segment
    sum to ~fp32 ulp (probe: 2.5e-7 max abs err at 17.6M particles).
    """
    nx, ny, nz = shape
    ncells = nx * ny * nz
    c0, w0, w1 = _cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(shape)[:, None] - 2)
    base = (c0[0] * ny + c0[1]) * nz + c0[2]
    wx = jnp.stack([w0[0], w1[0]])                   # (2, N)
    wy = jnp.stack([w0[1], w1[1]])
    wz = jnp.stack([w0[2], w1[2]])
    w8 = (weight[None] * wx[:, None, None] * wy[None, :, None]
          * wz[None, None, :]).reshape(8, -1)       # (8, N) corner-major
    if counts is None:
        # invalid slots sort LAST under the caller's sentinel key but
        # carry x = 0, so their raw `base` (cell 0) would break the
        # sorted-indices contract at the tail — pin them to the last
        # cell (zero contribution either way)
        hist = jnp.zeros((ncells,), jnp.float32)
        idx = jnp.where(weight > 0, jnp.minimum(base, ncells - 1),
                        ncells - 1)
        hist = hist.at[idx].add(
            jnp.where(weight > 0, 1.0, 0.0), indices_are_sorted=True)
        counts = hist.astype(jnp.int32)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    em1 = jnp.maximum(ends - 1, 0)
    sm1 = jnp.maximum(starts - 1, 0)
    mask_e = ends > 0
    mask_s = starts > 0
    # compensated prefix sums: e = w - fl(diff(c1)) is the exact stored-
    # prefix rounding residual (Fast2Sum), accumulated one level down.
    # Each cumsum's boundaries are gathered as soon as it exists (4
    # narrow gathers instead of 2 on a (16, N) concat): at 17.6M
    # particles the concat alone is a 1.13 GB copy and the old
    # all-live-at-once form peaked ~4 GB of (8, N) temps — enough to
    # OOM the fused 256^3 program on a 16 GB chip (bench_logs/
    # bench256_csort_r3.log); this ordering keeps at most three (8, N)
    # arrays live (~1.7 GB).
    c1 = jnp.cumsum(w8, axis=1)
    acc = (jnp.where(mask_e, c1.at[:, em1].get(indices_are_sorted=True),
                     0.0)
           - jnp.where(mask_s, c1.at[:, sm1].get(indices_are_sorted=True),
                       0.0))
    r = w8 - jnp.diff(c1, axis=1, prepend=jnp.float32(0.0))
    c2 = jnp.cumsum(r, axis=1)
    acc = acc + (
        jnp.where(mask_e, c2.at[:, em1].get(indices_are_sorted=True), 0.0)
        - jnp.where(mask_s, c2.at[:, sm1].get(indices_are_sorted=True),
                    0.0))                            # (8, ncells)
    return _corner_recombine(acc, shape)


def cic_gather_corner_t(field: jnp.ndarray, pos_t: jnp.ndarray,
                        scale: float = 1.0, offset: float = 0.0,
                        pad: int = 0, valid: jnp.ndarray = None,
                        sorted_cells: bool = False) -> jnp.ndarray:
    """`cic_gather_corner` for SoA positions, returning SoA (C, N)."""
    C = field.shape[0]
    nx, ny, nz = field.shape[-3:]
    c0, w0, w1 = _cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(field.shape[-3:])[:, None] - 2)
    base = (c0[0] * ny + c0[1]) * nz + c0[2]
    if valid is not None:
        base = jnp.where(valid, base, nx * ny * nz - 1)
    corners = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corners.append(jnp.pad(
                    field[:, dx:, dy:, dz:],
                    ((0, 0), (0, dx), (0, dy), (0, dz))))
    packed = jnp.stack(corners).reshape(8 * C, -1)   # (8C, XYZ)
    vals = packed.at[:, base].get(
        indices_are_sorted=sorted_cells).reshape(2, 2, 2, C, -1)
    wx = jnp.stack([w0[0], w1[0]])                   # (2, N)
    wy = jnp.stack([w0[1], w1[1]])
    wz = jnp.stack([w0[2], w1[2]])
    return jnp.einsum("xyzcn,xn,yn,zn->cn", vals, wx, wy, wz)


def cic_gather_t(field: jnp.ndarray, pos_t: jnp.ndarray,
                 scale: float = 1.0, offset: float = 0.0,
                 pad: int = 0) -> jnp.ndarray:
    """`cic_gather` for SoA positions, returning SoA (C, N): 8 corner
    column gathers from the (C, XYZ)-flattened field (used by the staged
    CIC fine build, where the corner-packed table would be nf^3-sized)."""
    C = field.shape[0]
    nx, ny, nz = field.shape[-3:]
    c0, w0, w1 = _cic_weights_t(pos_t, scale, offset)
    c0 = jnp.clip(c0 + pad, 0, jnp.array(field.shape[-3:])[:, None] - 2)
    base = (c0[0] * ny + c0[1]) * nz + c0[2]
    flat = field.reshape(C, -1)
    out = jnp.zeros((C, pos_t.shape[1]), jnp.float32)
    for dx in (0, 1):
        wx = (w1 if dx else w0)[0]
        for dy in (0, 1):
            wy = (w1 if dy else w0)[1]
            for dz in (0, 1):
                wz = (w1 if dz else w0)[2]
                idx = base + (dx * ny * nz + dy * nz + dz)
                out = out + (wx * wy * wz)[None, :] * flat[:, idx]
    return out
