"""Particle ownership exchange (called inside shard_map).

Replaces the ownership-transfer role of `source_threads/particle_pass.f90`
and `delete_particles.f90`.  Unlike the reference we do NOT ship deep ghost
layers (grid halos replace them — see parallel/halo.py); only particles that
drifted out of the local subvolume move, via three sequential axis passes of
fixed-capacity buffers over `ppermute` rings.  Corner crossings resolve
exactly like the reference's 6-pass scheme: a particle that left in x and y
is forwarded along x first, then re-forwarded along y by the intermediate
owner within the same exchange.

Capacity overflows are counted and surfaced (the reference aborts,
`particle_pass.f90:96-99,136-139`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .mesh import AXES, ring_perm


class ExchangeResult(NamedTuple):
    x: jnp.ndarray
    v: jnp.ndarray
    pid: jnp.ndarray
    valid: jnp.ndarray
    overflow: jnp.ndarray   # () int32: particles dropped (buffer/capacity)


def _pack(x, v, pid, take_mask, max_buf, shift, axis):
    """Pack up to max_buf flagged particles into float (max_buf,6) and int
    (max_buf,2) buffers, shifting the crossing coordinate into the
    neighbor's frame."""
    order = jnp.argsort(~take_mask)           # selected first (stable)
    sel = order[:max_buf]
    ok = take_mask[sel]
    xs = x[sel]
    xs = xs.at[:, axis].add(shift)
    fbuf = jnp.concatenate([xs, v[sel]], axis=1)
    ibuf = jnp.stack([pid[sel], ok.astype(jnp.int32)], axis=1)
    dropped = (jnp.sum(take_mask.astype(jnp.int32))
               - jnp.sum(ok.astype(jnp.int32)))
    return fbuf, ibuf, dropped


def exchange_particles(x: jnp.ndarray, v: jnp.ndarray, pid: jnp.ndarray,
                       valid: jnp.ndarray, nf_node: int, max_buf: int,
                       axis_names=AXES) -> ExchangeResult:
    """Move particles whose coordinate left [0, nf_node) to ring neighbors."""
    overflow = jnp.asarray(0, jnp.int32)
    max_np = x.shape[0]
    for axis, name in enumerate(axis_names):
        size = jax.lax.axis_size(name)
        coord = x[:, axis]
        go_low = valid & (coord < 0.0)
        go_high = valid & (coord >= nf_node)
        stay = valid & ~go_low & ~go_high

        flo, ilo, d1 = _pack(x, v, pid, go_low, max_buf, float(nf_node), axis)
        fhi, ihi, d2 = _pack(x, v, pid, go_high, max_buf, -float(nf_node),
                             axis)
        overflow = overflow + d1 + d2
        if size == 1:
            rf_hi, ri_hi = flo, ilo     # wrap around: my own buffers return
            rf_lo, ri_lo = fhi, ihi
        else:
            # buf_low goes to the left neighbor (j -> j-1); I receive the
            # right neighbor's buf_low, and vice versa.
            rf_hi = jax.lax.ppermute(flo, name, ring_perm(size, -1))
            ri_hi = jax.lax.ppermute(ilo, name, ring_perm(size, -1))
            rf_lo = jax.lax.ppermute(fhi, name, ring_perm(size, 1))
            ri_lo = jax.lax.ppermute(ihi, name, ring_perm(size, 1))
        rx = jnp.concatenate([rf_hi[:, 0:3], rf_lo[:, 0:3]])
        rv = jnp.concatenate([rf_hi[:, 3:6], rf_lo[:, 3:6]])
        rpid = jnp.concatenate([ri_hi[:, 0], ri_lo[:, 0]])
        rvalid = jnp.concatenate([ri_hi[:, 1], ri_lo[:, 1]]) > 0

        # merge: stay + received, compacted to max_np capacity
        all_x = jnp.concatenate([x, rx])
        all_v = jnp.concatenate([v, rv])
        all_pid = jnp.concatenate([pid, rpid])
        all_valid = jnp.concatenate([stay, rvalid])
        order = jnp.argsort(~all_valid)
        keep = order[:max_np]
        lost = (jnp.sum(all_valid.astype(jnp.int32))
                - jnp.sum(all_valid[keep].astype(jnp.int32)))
        overflow = overflow + lost
        x, v, pid, valid = (all_x[keep], all_v[keep], all_pid[keep],
                            all_valid[keep])
    # park invalid slots at the origin so later grid ops see benign coords
    x = jnp.where(valid[:, None], x, 0.0)
    v = jnp.where(valid[:, None], v, 0.0)
    return ExchangeResult(x=x, v=v, pid=pid, valid=valid, overflow=overflow)
