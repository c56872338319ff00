"""Particle ownership exchange (called inside shard_map).

Replaces the ownership-transfer role of `source_threads/particle_pass.f90`
and `delete_particles.f90`.  Unlike the reference we do NOT ship deep ghost
layers (grid halos replace them — see parallel/halo.py) and we do NOT make
three sequential axis passes: every particle is classified once by its
3-axis direction vector d in {-1,0,1}^3, one stable sort groups the 26
outgoing classes into contiguous segments, and each segment ships straight
to its (possibly diagonal) neighbor with a statically-permuted `ppermute`
over the full mesh.  One sort replaces the reference's 6-pass
pack/send/unpack/relink cycle.

TPU cost shape (scripts/scatter_bench): gather/scatter cost is per-INDEX,
payload width nearly free — so x/v/pid travel as ONE packed (N, 7) row
matrix through a single class-sort gather, per-class counts come from
searchsorted on the sorted keys (29 probes) instead of a length-N bincount
scatter, and compaction is NOT done here: the caller's cell sort orders
invalid slots last anyway (`compact=False` path), so the merge argsort is
deleted.

Buffer sizing: faces carry the bulk of the traffic (the mesh shake moves
every particle by up to 2*mesh_scale per step), edges and corners scale
down geometrically.  Capacity overflows are counted and surfaced (the
reference aborts, `particle_pass.f90:96-99,136-139`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import AXES


# pid <-> float32 payload packing.  A raw int32 bit-cast puts pids < 2^23
# in the float32 DENORMAL range, where a single canonicalizing/flushing
# copy anywhere in the where/ppermute/relayout chain would silently zero
# particle identities.  Adding 2^27 before the cast keeps every encoded
# value a NORMAL float (exponent 16..143) and far from NaN/Inf patterns
# for any pid in [-2^27, 2^30 - 2^27) — comfortably past 512^3 = 2^27
# total particles.
PID_BIAS = 0x08000000  # plain int: exchange may first be imported inside
                       # a jit trace, where module-level jnp constants
                       # would capture the trace context


def pid_to_f32(pid: jnp.ndarray) -> jnp.ndarray:
    """Encode int32 pids as flush-safe float32 payload lanes."""
    return (pid + jnp.int32(PID_BIAS)).view(jnp.float32)


def pid_from_f32(f: jnp.ndarray) -> jnp.ndarray:
    """Decode `pid_to_f32` payload lanes back to int32 pids."""
    return f.view(jnp.int32) - jnp.int32(PID_BIAS)


def colmajor(arr: jnp.ndarray) -> jnp.ndarray:
    """Constrain an (M, k) intermediate to column-major layout.

    XLA materializes (M, small-k) transposes as {1,0:T(8,128)} lane-padded
    copies (42x memory for k=3 — a single 32M-row temp is 15.4 GB);
    column-major tiles (k, M) with no padding.  No-op where the layout API
    is unsupported (CPU tests).
    """
    try:
        from jax.experimental.layout import Format, Layout
        from jax.experimental.layout import with_layout_constraint
        return with_layout_constraint(
            arr, Format(Layout(tuple(range(arr.ndim - 1, -1, -1)))))
    except Exception:
        return arr


class ExchangeResult(NamedTuple):
    x: jnp.ndarray
    v: jnp.ndarray
    pid: jnp.ndarray
    valid: jnp.ndarray
    overflow: jnp.ndarray   # () int32: particles dropped (buffer/capacity)


# the 27 direction classes in id order; class 13 = (0,0,0) = stay
DIRS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)]
STAY = 13


def _mesh_perm(dims, d) -> list:
    """Static ppermute pairs over the full (n0,n1,n2) mesh sending each
    device's segment to the neighbor at +d (row-major flattening in the
    axis_names order, matching lax.ppermute over multiple axes; the mesh
    need not be cubic)."""
    n0, n1, n2 = dims
    pairs = []
    for jx in range(n0):
        for jy in range(n1):
            for jz in range(n2):
                j = (jx * n1 + jy) * n2 + jz
                t = ((((jx + d[0]) % n0) * n1 + (jy + d[1]) % n1) * n2
                     + (jz + d[2]) % n2)
                pairs.append((j, t))
    return pairs


def exchange_particles(x: jnp.ndarray, v: jnp.ndarray, pid: jnp.ndarray,
                       valid: jnp.ndarray, nf_node: int, max_buf: int,
                       axis_names=AXES, compact: bool = True,
                       soa: bool = False) -> ExchangeResult:
    """Move particles whose coordinates left [0, nf_node) to their owning
    neighbor (single hop; drift+shake < one node width per step).

    With `compact=False` the result arrays have max_np + total-buffer rows
    and are NOT compacted (use `valid`); callers that re-sort anyway (the
    sweep's cell sort) skip a full argsort+gather that way.

    With `soa=True` (requires compact=False) positions/velocities are
    (3, N) in AND (3, M) out — the staged 256^3+ path, where any (M, 3)
    materialization lane-pads 42x on TPU.
    """
    if soa:
        assert not compact, "soa exchange is compact=False only"
        xT, vT = x, v
        max_np = x.shape[1]
    else:
        xT, vT = x.T, v.T          # cheap direction: (3, N) stays compact
        max_np = x.shape[0]
    try:
        dims = tuple(jax.lax.axis_size(n) for n in axis_names)
    except NameError:
        dims = (1, 1, 1)
    multi = any(s > 1 for s in dims)

    # --- classify by outgoing direction (SoA throughout) ---------------
    d = jnp.where(xT < 0.0, -1, jnp.where(xT >= nf_node, 1, 0)).astype(
        jnp.int32)                                       # (3, N)
    cls = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
    cls = jnp.where(valid, cls, 27)                      # invalid last
    # shift leaving coordinates into the destination frame
    xs = xT - d.astype(xT.dtype) * float(nf_node)

    # --- one stable sort groups the classes; ONE packed payload gather -
    # payload is (7, N) SUBLANE-major: concatenating (N, k) arrays along
    # the minor axis makes XLA relayout them into lane-padded {1,0:T(8,128)}
    # copies (42x memory — OOMs at 256^3); the transposed form tiles to
    # (8, 128) with no padding
    order = jnp.argsort(cls)
    cls_s = cls[order]
    payload = jnp.concatenate(
        [xs, vT, pid_to_f32(pid)[None, :]], axis=0)[:, order]
    # pad by max_np so dynamic slices below NEVER clamp: the stay-segment
    # slice starts at stay_start (can approach N when many particles
    # leave through low-class faces) and spans max_np rows — a clamped
    # start would silently read neighboring class segments as residents
    payload = jnp.concatenate(
        [payload, jnp.zeros((7, max_np), payload.dtype)], axis=1)
    # per-class offsets from the sorted keys (29 probes instead of a
    # length-N bincount scatter)
    bounds = jnp.searchsorted(cls_s, jnp.arange(29, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]                    # (28,)
    starts = bounds[:-1]

    overflow = jnp.asarray(0, jnp.int32)
    # floors clamp to max_np so segment slices never exceed the padded
    # payload (tiny test configs; production sizes are unaffected)
    face_buf = min(max_buf, max_np)
    edge_buf = min(max(64, max_buf // 8), max_np)
    corner_buf = min(max(64, max_buf // 32), max_np)

    # --- ship each class to its neighbor -------------------------------
    recv = []
    for ci, dd in enumerate(DIRS):
        if ci == STAY:
            continue
        order1 = sum(abs(c) for c in dd)
        buf = (face_buf if order1 == 1 else
               edge_buf if order1 == 2 else corner_buf)
        seg = jax.lax.dynamic_slice_in_dim(payload, starts[ci], buf, axis=1)
        ok = jnp.arange(buf, dtype=jnp.int32) < counts[ci]
        seg = jnp.concatenate([jnp.where(ok[None, :], seg, 0.0),
                               ok[None, :].astype(jnp.float32)], axis=0)
        overflow = overflow + jnp.maximum(counts[ci] - buf, 0)
        if multi:
            seg = jax.lax.ppermute(seg, axis_names, _mesh_perm(dims, dd))
        recv.append(seg)

    # --- merge: stay segment + received --------------------------------
    stay_start = starts[STAY]
    n_stay = counts[STAY]
    stay = jax.lax.dynamic_slice_in_dim(payload, stay_start, max_np, axis=1)
    stay_ok = jnp.arange(max_np, dtype=jnp.int32) < n_stay
    stay = jnp.concatenate([stay, stay_ok[None, :].astype(jnp.float32)],
                           axis=0)

    allp = jnp.concatenate([stay] + recv, axis=1)        # (8, max_np + R)
    all_ok = allp[7] > 0.0

    if not compact:
        if soa:
            return ExchangeResult(
                x=allp[0:3], v=allp[3:6],
                pid=pid_from_f32(allp[6]),
                valid=all_ok, overflow=overflow)
        return ExchangeResult(
            x=colmajor(allp[0:3].T), v=colmajor(allp[3:6].T),
            pid=pid_from_f32(allp[6]),
            valid=all_ok, overflow=overflow)

    morder = jnp.argsort(~all_ok)          # compaction via (cheap) sort
    keep = morder[:max_np]
    n_valid = jnp.sum(all_ok.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_valid - max_np, 0)
    kept = allp[:, keep]
    ok_o = kept[7] > 0.0
    return ExchangeResult(
        x=colmajor(jnp.where(ok_o[:, None], kept[0:3].T, 0.0)),
        v=colmajor(jnp.where(ok_o[:, None], kept[3:6].T, 0.0)),
        pid=pid_from_f32(kept[6]),
        valid=ok_o, overflow=overflow)


class SortedExchangeResult(NamedTuple):
    packed: jnp.ndarray     # (7, max_np) payload [x(3), v(3), pid_f32(1)],
                            # fine-cell sorted, invalid slots zero
    cell: jnp.ndarray       # (max_np,) int32 sorted cell keys; ncells = pad
    n_valid: jnp.ndarray    # () int32 surviving particle count (pre-cap)
    overflow: jnp.ndarray   # () int32 dropped (buffer + capacity)
    clamp_count: jnp.ndarray  # () int32 multi-hop coordinates clamped


def exchange_cell_sorted(x: jnp.ndarray, v: jnp.ndarray, pid: jnp.ndarray,
                         valid: jnp.ndarray, nf_node: int, max_buf: int,
                         axis_names=AXES) -> SortedExchangeResult:
    """Ownership exchange AND fine-cell sort with ONE large argsort.

    The classic flow pays two big argsorts + two packed gathers per step
    (class-sort in the exchange, then the cell sort over the merged
    arrays).  Here a COMBINED key — fine cell for residents, ncells+class
    for leavers, ncells+28 for padding — yields, after one argsort, the
    residents already cell-sorted followed by contiguous per-class
    segments to ship.  Received particles (a small fraction of N) are
    sorted alone and merged by per-cell COUNTING: dense count tables +
    exclusive prefix sums give every element's final slot, written with
    one scatter per side — no second N-sized argsort.  Equality with the
    classic path is pinned by tests (same stable within-cell order:
    residents before arrivals).
    """
    xT, vT = x.T, v.T
    max_np = x.shape[0]
    ncells = nf_node ** 3
    try:
        dims = tuple(jax.lax.axis_size(n) for n in axis_names)
    except NameError:
        dims = (1, 1, 1)
    multi = any(s > 1 for s in dims)

    # --- combined key ---------------------------------------------------
    d = jnp.where(xT < 0.0, -1, jnp.where(xT >= nf_node, 1, 0)).astype(
        jnp.int32)
    cls = (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)
    xs = xT - d.astype(xT.dtype) * float(nf_node)
    # residual out-of-range after the single-hop shift (multi-hop movers):
    # clamp and COUNT, like the classic path's post-exchange clamp.
    # Strict > on the high side: for xT in [-nf, 0) the shift xT + nf is
    # INEXACT and a sub-ulp negative coordinate rounds to exactly nf —
    # a representation artifact the clip below absorbs, not a multi-hop
    # mover (the positive-side shift is exact by Sterbenz).  Counting it
    # cried wolf once every few dozen sweeps in the 64^3 validation.
    oor = valid & jnp.any((xs < 0.0) | (xs > nf_node), axis=0)
    clamp_count = jnp.sum(oor.astype(jnp.int32))
    xs = jnp.clip(xs, 0.0, nf_node - 1e-4)
    c = jnp.floor(xs).astype(jnp.int32)
    ckey = (c[0] * nf_node + c[1]) * nf_node + c[2]
    key = jnp.where(~valid, ncells + 28,
                    jnp.where(cls != STAY, ncells + cls, ckey))

    # --- THE one big sort + payload gather ------------------------------
    order = jnp.argsort(key)
    skey = key[order]
    payload = jnp.concatenate(
        [xs, vT, pid_to_f32(pid)[None, :]], axis=0)[:, order]
    bounds = jnp.searchsorted(
        skey, ncells + jnp.arange(29, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]
    starts = bounds[:-1]
    n_stay = bounds[0]

    overflow = jnp.asarray(0, jnp.int32)
    face_buf = min(max_buf, max_np)
    edge_buf = min(max(64, max_buf // 8), max_np)
    corner_buf = min(max(64, max_buf // 32), max_np)
    payload_p = jnp.concatenate(
        [payload, jnp.zeros((7, max_np), payload.dtype)], axis=1)

    recv = []
    for ci, dd in enumerate(DIRS):
        if ci == STAY:
            continue
        order1 = sum(abs(cc) for cc in dd)
        buf = (face_buf if order1 == 1 else
               edge_buf if order1 == 2 else corner_buf)
        seg = jax.lax.dynamic_slice_in_dim(payload_p, starts[ci], buf,
                                           axis=1)
        ok = jnp.arange(buf, dtype=jnp.int32) < counts[ci]
        seg = jnp.concatenate([jnp.where(ok[None, :], seg, 0.0),
                               ok[None, :].astype(jnp.float32)], axis=0)
        overflow = overflow + jnp.maximum(counts[ci] - buf, 0)
        if multi:
            seg = jax.lax.ppermute(seg, axis_names, _mesh_perm(dims, dd))
        recv.append(seg)

    rpay = jnp.concatenate(recv, axis=1)                 # (8, R)
    rok = rpay[7] > 0.0
    rx = rpay[0:3]
    roor = rok & jnp.any((rx < 0.0) | (rx > nf_node), axis=0)
    clamp_count = clamp_count + jnp.sum(roor.astype(jnp.int32))
    rx = jnp.clip(rx, 0.0, nf_node - 1e-4)
    rc = jnp.floor(rx).astype(jnp.int32)
    rkey = jnp.where(rok,
                     (rc[0] * nf_node + rc[1]) * nf_node + rc[2], ncells)
    rorder = jnp.argsort(rkey)                           # R << N: cheap
    rkey_s = rkey[rorder]
    rpay_s = jnp.concatenate([rx, rpay[3:7]], axis=0)[:, rorder]
    rok_s = rkey_s < ncells

    # --- counting merge (dense tables; no second big argsort) -----------
    stay_mask = skey < ncells
    sk = jnp.where(stay_mask, skey, ncells)
    rkc = jnp.where(rok_s, rkey_s, ncells)
    recv_counts = jnp.zeros(ncells + 1, jnp.int32).at[rkc].add(
        rok_s.astype(jnp.int32))
    # exclusive prefix: number of arrivals in cells < k
    P_r = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(recv_counts)[:-1]])
    stay_counts = jnp.zeros(ncells + 1, jnp.int32).at[sk].add(
        stay_mask.astype(jnp.int32))
    S_le = jnp.cumsum(stay_counts)       # residents in cells <= k
    pos_stay = jnp.arange(skey.shape[0], dtype=jnp.int32) + P_r[sk]
    from ..ops.binning import rank_from_sorted
    pos_recv = S_le[rkc] + P_r[rkc] + rank_from_sorted(rkey_s)

    n_valid = n_stay + jnp.sum(rok_s.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_valid - max_np, 0)

    # one scatter per side into (8, max_np + 1): rows 0..6 payload, row 7
    # the biased cell key (same flush-safe encoding as pids); clamped /
    # invalid sources land in the dumped extra column
    tgt_s = jnp.where(stay_mask & (pos_stay < max_np), pos_stay, max_np)
    tgt_r = jnp.where(rok_s & (pos_recv < max_np), pos_recv, max_np)
    keyf_s = pid_to_f32(sk)[None, :]
    keyf_r = pid_to_f32(rkc)[None, :]
    out = jnp.full((8, max_np + 1), jnp.float32(0.0))
    out = out.at[7, :].set(pid_to_f32(jnp.full((max_np + 1,), ncells,
                                               jnp.int32)))
    out = out.at[:, tgt_s].set(jnp.concatenate([payload, keyf_s], axis=0))
    out = out.at[:, tgt_r].set(jnp.concatenate([rpay_s, keyf_r], axis=0))
    out = out[:, :max_np]
    cell = pid_from_f32(out[7])
    return SortedExchangeResult(packed=out[:7], cell=cell,
                                n_valid=n_valid, overflow=overflow,
                                clamp_count=clamp_count)
