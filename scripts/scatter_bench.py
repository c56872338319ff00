"""Micro-benchmarks for deposit/gather formulations on TPU.

The sweep's hot ops are particle<->grid scatters and gathers
(profile_step.py breakdown).  XLA lowers different but equivalent
formulations to wildly different TPU code; this harness measures the
candidates so ops/deposit.py picks the fastest:

  scatter-add (sorted hint)      -- current ngp_deposit path
  scatter-add (no hint)
  cumsum + boundary unique-set   -- segment sum as 2 parallel stores
  segment_sum
  CIC 8-corner scatter           -- current coarse deposit
  flat gather / 8-corner gather  -- current force interpolation

Run: python scripts/scatter_bench.py [--n 2726297] [--cpu]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2726297)
    ap.add_argument("--nf", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n, nf = args.n, args.nf
    nflat = nf ** 3
    rng = np.random.default_rng(0)
    # ~77% valid slots (round-number density like the sweep's)
    nv = int(n * 0.77)
    x_h = np.zeros((n, 3), np.float32)
    x_h[:nv] = rng.uniform(0, nf, (nv, 3)).astype(np.float32)
    key_h = ((x_h[:, 0].astype(np.int64) * nf
              + x_h[:, 1].astype(np.int64)) * nf
             + x_h[:, 2].astype(np.int64)).astype(np.int64)
    key_h[nv:] = nflat
    order = np.argsort(key_h)
    skey = jnp.asarray(key_h[order].astype(np.int32))
    w = jnp.asarray((np.arange(n) < nv).astype(np.float32)[order])
    x = jnp.asarray(x_h[order])
    grid = jnp.asarray(rng.normal(size=(nf, nf, nf)).astype(np.float32))
    grid3 = jnp.asarray(rng.normal(size=(3, nf, nf, nf)).astype(np.float32))

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *a):
        try:
            out = fn(*a)
            sync(out)
            t0 = time.time()
            for _ in range(args.reps):
                out = fn(*a)
                sync(out)
            dt = (time.time() - t0) / args.reps
            print(f"{name:>32}: {dt * 1e3:9.2f} ms", flush=True)
            return out
        except Exception as e:  # noqa
            print(f"{name:>32}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            return None

    clamped = jnp.minimum(skey, nflat - 1)

    def scat_sorted(k, ww):
        return jnp.zeros(nflat, jnp.float32).at[k].add(
            jnp.where(skey < nflat, ww, 0.0), indices_are_sorted=True)

    def scat_unsorted(k, ww):
        return jnp.zeros(nflat, jnp.float32).at[k].add(
            jnp.where(skey < nflat, ww, 0.0))

    def scat_boundary(k, ww):
        # segment sum over sorted keys: cumsum + run-boundary unique
        # scatters (mode='drop' parks non-boundary rows out of range)
        ww = jnp.where(skey < nflat, ww, 0.0)
        cum = jnp.cumsum(ww)
        nn = ww.shape[0]
        change = skey[1:] != skey[:-1]
        last = jnp.concatenate([change, jnp.ones(1, bool)])
        first = jnp.concatenate([jnp.ones(1, bool), change])
        tgt_last = jnp.where(last, skey, nflat)
        tgt_first = jnp.where(first, skey, nflat)
        g = jnp.zeros(nflat, jnp.float32)
        g = g.at[tgt_last].set(cum, mode="drop", unique_indices=True)
        g = g.at[tgt_first].add(-(cum - ww), mode="drop",
                                unique_indices=True)
        return g

    def seg_sum(k, ww):
        return jax.ops.segment_sum(jnp.where(skey < nflat, ww, 0.0), k,
                                   num_segments=nflat,
                                   indices_are_sorted=True)

    r1 = timeit("scatter-add sorted", jax.jit(scat_sorted), clamped, w)
    timeit("scatter-add no-hint", jax.jit(scat_unsorted), clamped, w)
    r3 = timeit("cumsum+boundary set", jax.jit(scat_boundary), clamped, w)
    timeit("segment_sum", jax.jit(seg_sum), clamped, w)
    if r1 is not None and r3 is not None:
        err = float(jnp.max(jnp.abs(r1 - r3)))
        print(f"# boundary-trick max |err| vs scatter: {err:.2e}")

    # CIC deposit (coarse-style): 8 corner scatters, scale 4
    from cubep3m_tpu.ops import deposit
    nc = nf // 4
    ncp = nc + 2

    def cic_dep(xx, ww):
        return deposit.cic_deposit(xx, ww, (ncp, ncp, ncp), scale=4.0,
                                   offset=-0.5, pad=1, sorted_cells=True)

    timeit("cic_deposit(coarse,sorted)", jax.jit(cic_dep), x, w)

    def cic_dep_u(xx, ww):
        return deposit.cic_deposit(xx, ww, (ncp, ncp, ncp), scale=4.0,
                                   offset=-0.5, pad=1, sorted_cells=False)

    timeit("cic_deposit(coarse,no-hint)", jax.jit(cic_dep_u), x, w)

    # gathers
    def g_flat(f):
        return f.reshape(-1)[clamped]

    timeit("ngp_gather flat", jax.jit(g_flat), grid)

    def g3(f):
        return deposit.ngp_gather(f, x, flat_cells=clamped)

    timeit("ngp_gather 3-comp", jax.jit(g3), grid3)

    def gc(f):
        return deposit.cic_gather(
            jnp.pad(f, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap"),
            x, scale=4.0, offset=-0.5, pad=1)

    timeit("cic_gather 3-comp coarse", jax.jit(gc), grid3)

    # one-hot matmul deposit within 512-particle tiles over a 4096 span
    def onehot_dep(k, ww):
        T, S = 512, 4096
        nn = k.shape[0]
        nt = -(-nn // T)
        pad = nt * T - nn
        kp = jnp.pad(k, (0, pad), constant_values=nflat)
        wp = jnp.pad(jnp.where(skey < nflat, ww, 0.0), (0, pad))
        kt = kp.reshape(nt, T)
        wt = wp.reshape(nt, T)
        base = kt[:, 0:1]
        loc = kt - base                       # (nt, T) offsets in tile
        oh = (loc[:, :, None]
              == jnp.arange(S)[None, None, :]).astype(jnp.float32)
        dense = jnp.einsum("tp,tps->ts", wt, oh)   # (nt, S)
        miss = jnp.sum(jnp.where((loc >= S) & (kt < nflat), wt, 0.0))
        g = jnp.zeros(nflat + S, jnp.float32)
        idx = base + jnp.arange(S)[None, :]
        g = g.at[jnp.minimum(idx, nflat + S - 1)].add(
            dense)  # tile spans overlap at boundaries -> scatter-add rows
        return g[:nflat], miss

    timeit("one-hot tile deposit", jax.jit(onehot_dep), clamped, w)


if __name__ == "__main__":
    main()
