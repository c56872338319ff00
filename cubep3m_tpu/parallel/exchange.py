"""Particle ownership exchange (called inside shard_map).

Replaces the ownership-transfer role of `source_threads/particle_pass.f90`
and `delete_particles.f90`.  Unlike the reference we do NOT ship deep ghost
layers (grid halos replace them — see parallel/halo.py) and we do NOT make
three sequential axis passes: every particle is classified once by its
3-axis direction vector d in {-1,0,1}^3, one stable sort groups the 26
outgoing classes into contiguous segments, and each segment ships straight
to its (possibly diagonal) neighbor with a statically-permuted `ppermute`
over the full mesh.  One sort + one merge replaces the reference's 6-pass
pack/send/unpack/relink cycle.

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


def _mesh_perm(nd: int, d) -> list:
    """Static ppermute pairs over the full (nd,nd,nd) mesh sending each
    device's segment to the neighbor at +d."""
    pairs = []
    for j in range(nd ** 3):
        jx, jy, jz = j // (nd * nd), (j // nd) % nd, j % nd
        tx = ((jx + d[0]) % nd, (jy + d[1]) % nd, (jz + d[2]) % nd)
        pairs.append((j, (tx[0] * nd + tx[1]) * nd + tx[2]))
    return pairs


def exchange_particles(x: jnp.ndarray, v: jnp.ndarray, pid: jnp.ndarray,
                       valid: jnp.ndarray, nf_node: int, max_buf: int,
                       axis_names=AXES) -> ExchangeResult:
    """Move particles whose coordinates left [0, nf_node) to their owning
    neighbor (single hop; drift+shake < one node width per step)."""
    max_np = x.shape[0]
    nd = 1
    try:
        nd = jax.lax.axis_size(axis_names[0])
    except NameError:
        pass

    # --- classify by outgoing direction -------------------------------
    d = jnp.where(x < 0.0, -1, jnp.where(x >= nf_node, 1, 0)).astype(
        jnp.int32)                                       # (N, 3)
    cls = (d[:, 0] + 1) * 9 + (d[:, 1] + 1) * 3 + (d[:, 2] + 1)
    cls = jnp.where(valid, cls, 27)                      # invalid last
    # shift leaving coordinates into the destination frame
    xs = x - d.astype(x.dtype) * float(nf_node)

    # --- one stable sort groups the classes ----------------------------
    order = jnp.argsort(cls)
    cls_s = cls[order]
    # pad so dynamic slices below never clamp (clamped starts would pull
    # rows from neighboring class segments)
    pad = max_np
    xs = jnp.concatenate([xs[order], jnp.zeros((pad, 3), x.dtype)])
    vs = jnp.concatenate([v[order], jnp.zeros((pad, 3), v.dtype)])
    ps = jnp.concatenate([pid[order], jnp.zeros((pad,), pid.dtype)])
    counts = jnp.zeros(29, jnp.int32).at[jnp.clip(cls_s, 0, 28)].add(1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])

    overflow = jnp.asarray(0, jnp.int32)
    face_buf = max_buf
    edge_buf = max(64, max_buf // 8)
    corner_buf = max(64, max_buf // 32)

    # --- ship each class to its neighbor -------------------------------
    recv_f, recv_i = [], []
    for ci, dd in enumerate(DIRS):
        if ci == STAY:
            continue
        order1 = sum(abs(c) for c in dd)
        buf = (face_buf if order1 == 1 else
               edge_buf if order1 == 2 else corner_buf)
        seg = jax.lax.dynamic_slice_in_dim(xs, starts[ci], buf, axis=0)
        segv = jax.lax.dynamic_slice_in_dim(vs, starts[ci], buf, axis=0)
        segp = jax.lax.dynamic_slice_in_dim(ps, starts[ci], buf, axis=0)
        ok = jnp.arange(buf, dtype=jnp.int32) < counts[ci]
        fbuf = jnp.concatenate([seg, segv], axis=1)
        fbuf = jnp.where(ok[:, None], fbuf, 0.0)
        ibuf = jnp.stack([jnp.where(ok, segp, 0), ok.astype(jnp.int32)], 1)
        overflow = overflow + jnp.maximum(counts[ci] - buf, 0)
        if nd > 1:
            perm = _mesh_perm(nd, dd)
            fbuf = jax.lax.ppermute(fbuf, axis_names, perm)
            ibuf = jax.lax.ppermute(ibuf, axis_names, perm)
        recv_f.append(fbuf)
        recv_i.append(ibuf)

    # --- merge: stay segment + received --------------------------------
    stay_start = starts[STAY]
    n_stay = counts[STAY]
    stay_x = jax.lax.dynamic_slice_in_dim(xs, stay_start, max_np, axis=0)
    stay_v = jax.lax.dynamic_slice_in_dim(vs, stay_start, max_np, axis=0)
    stay_p = jax.lax.dynamic_slice_in_dim(ps, stay_start, max_np, axis=0)
    stay_ok = jnp.arange(max_np, dtype=jnp.int32) < n_stay

    rf = jnp.concatenate(recv_f)
    ri = jnp.concatenate(recv_i)
    all_x = jnp.concatenate([stay_x, rf[:, 0:3]])
    all_v = jnp.concatenate([stay_v, rf[:, 3:6]])
    all_p = jnp.concatenate([stay_p, ri[:, 0]])
    all_ok = jnp.concatenate([stay_ok, ri[:, 1] > 0])

    morder = jnp.argsort(~all_ok)          # compaction via (cheap) sort
    keep = morder[:max_np]
    n_valid = jnp.sum(all_ok.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_valid - max_np, 0)
    x_o = all_x[keep]
    v_o = all_v[keep]
    p_o = all_p[keep]
    ok_o = all_ok[keep]
    x_o = jnp.where(ok_o[:, None], x_o, 0.0)
    v_o = jnp.where(ok_o[:, None], v_o, 0.0)
    return ExchangeResult(x=x_o, v=v_o, pid=p_o, valid=ok_o,
                          overflow=overflow)