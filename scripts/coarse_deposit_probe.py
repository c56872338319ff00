"""Probe: segmented-sum coarse CIC deposit candidates at 256^3 scale.

The coarse corner deposit is the fused step's largest phase at 256^3
(1139 ms windowed scatter-add; profile_step.py).  With coarse-sorted
particles the deposit is a segmented sum over ~8-long runs, expressible
in pure XLA as cumsum-along-particles + gathers at run boundaries
(~N/8 indices instead of N windowed-scatter indices).  This measures the
pieces on the real chip before committing to the design:

  1. windowed (8,ncells) scatter-add          (current, baseline)
  2. (8,N) fp32 cumsum along axis 1
  3. compensated-error pass (dense elementwise)
  4. boundary gathers: 2 x ncells-index, 16-wide payload
  5. 1-payload sorted scatter-add of ones     (histogram fallback)

Also verifies the compensated-cumsum precision argument numerically
against float64 on host.

Run in a FRESH process (a failed probe op poisons later compiles).
"""
import sys
import time

import numpy as np


def fence(x):
    import jax
    return np.asarray(jax.device_get(x))


def timeit(fn, *args, reps=5):
    """Per-rep host-scalar fence: a full-output device_get would be
    tunnel-transfer-bound (560 MB at ~40 MB/s dwarfs the op)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    fence(reduced(*args))   # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fence(reduced(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    n = 17_616_076          # max_np at 256^3 (density_buffer 1.05)
    nc = 130                # ncp = nc + 2 at nc=128
    ncells = nc * nc * nc
    rng = np.random.default_rng(0)

    # sorted coarse keys with ~8 particles/cell (realistic early universe)
    nvalid = 16_777_216
    keys = np.sort(rng.integers(0, ncells - 1, nvalid).astype(np.int32))
    keys = np.concatenate([keys, np.full(n - nvalid, ncells - 1, np.int32)])
    w8 = rng.uniform(0.0, 0.3, (8, n)).astype(np.float32)
    w8[:, nvalid:] = 0.0
    counts = np.bincount(keys[:nvalid], minlength=ncells).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)

    keys_d = jnp.asarray(keys)
    w8_d = jnp.asarray(w8)
    starts_d = jnp.asarray(starts)
    counts_d = jnp.asarray(counts)

    # --- precision check on host (float64 oracle) ---
    c1 = np.cumsum(w8[0].astype(np.float32), dtype=np.float32)
    d = np.diff(c1, prepend=np.float32(0.0)).astype(np.float32)
    e = (w8[0] - d).astype(np.float32)
    c2 = np.cumsum(e, dtype=np.float32)
    ends = starts + counts
    em1 = np.maximum(ends - 1, 0)
    sm1 = np.maximum(starts - 1, 0)
    tot = np.where(ends > 0, c1[em1], 0) - np.where(starts > 0, c1[sm1], 0)
    tot += np.where(ends > 0, c2[em1], 0) - np.where(starts > 0, c2[sm1], 0)
    oracle = np.zeros(ncells)
    np.add.at(oracle, keys[:nvalid], w8[0, :nvalid].astype(np.float64))
    naive = np.where(ends > 0, c1[em1], 0) - np.where(starts > 0, c1[sm1], 0)
    print(f"# precision: naive-cumsum max err "
          f"{np.abs(naive - oracle).max():.3e}, compensated "
          f"{np.abs(tot - oracle).max():.3e} (cell mass ~"
          f"{oracle.max():.1f})", flush=True)

    # --- device measurements ---
    @jax.jit
    def p1_windowed(k, w):
        acc = jnp.zeros((8, ncells), jnp.float32)
        return acc.at[:, k].add(w, indices_are_sorted=True)

    @jax.jit
    def p2_cumsum(w):
        return jnp.cumsum(w, axis=1)

    @jax.jit
    def p3_compensated(w):
        c1 = jnp.cumsum(w, axis=1)
        d = jnp.diff(c1, axis=1, prepend=jnp.float32(0.0))
        e = w - d
        c2 = jnp.cumsum(e, axis=1)
        return c1, c2

    @jax.jit
    def p4_boundary_gathers(c1, c2, st, ct):
        en = st + ct
        em1 = jnp.maximum(en - 1, 0)
        sm1 = jnp.maximum(st - 1, 0)
        c = jnp.concatenate([c1, c2], axis=0)         # (16, N)
        hi = c.at[:, em1].get(indices_are_sorted=True)
        lo = c.at[:, sm1].get(indices_are_sorted=True)
        hi = jnp.where(en > 0, hi, 0.0)
        lo = jnp.where(st > 0, lo, 0.0)
        tot = (hi[:8] - lo[:8]) + (hi[8:] - lo[8:])
        return tot

    @jax.jit
    def p5_hist(k):
        h = jnp.zeros((ncells,), jnp.float32)
        return h.at[k].add(1.0, indices_are_sorted=True)

    @jax.jit
    def p6_full_seg(k, w, st, ct):
        c1 = jnp.cumsum(w, axis=1)
        d = jnp.diff(c1, axis=1, prepend=jnp.float32(0.0))
        c2 = jnp.cumsum(w - d, axis=1)
        en = st + ct
        em1 = jnp.maximum(en - 1, 0)
        sm1 = jnp.maximum(st - 1, 0)
        c = jnp.concatenate([c1, c2], axis=0)
        hi = jnp.where(en > 0, c.at[:, em1].get(indices_are_sorted=True), 0.0)
        lo = jnp.where(st > 0, c.at[:, sm1].get(indices_are_sorted=True), 0.0)
        return (hi[:8] - lo[:8]) + (hi[8:] - lo[8:])

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    probes = {
        "p1": ("windowed (8,nc^3) scatter-add", lambda: timeit(
            p1_windowed, keys_d, w8_d)),
        "p2": ("(8,N) cumsum", lambda: timeit(p2_cumsum, w8_d)),
        "p3": ("compensated 2x cumsum", lambda: timeit(p3_compensated, w8_d)),
        "p4": ("2x boundary gathers (16-wide)", lambda: _p4()),
        "p5": ("1-payload hist scatter", lambda: timeit(p5_hist, keys_d)),
        "p6": ("FULL segmented deposit", lambda: timeit(
            p6_full_seg, keys_d, w8_d, starts_d, counts_d)),
    }

    def _p4():
        c1, c2 = p3_compensated(w8_d)
        fence(c1)
        return timeit(p4_boundary_gathers, c1, c2, starts_d, counts_d)

    for name, (desc, fn) in probes.items():
        if which not in ("all", name):
            continue
        t0 = time.time()
        dt = fn()
        print(f"# {name} {desc}: {dt * 1e3:.1f} ms "
              f"(incl compile {time.time() - t0:.1f}s)", flush=True)

    # correctness of the full segmented deposit vs oracle (all 8 rows)
    if which in ("all", "p6"):
        tot_d = fence(p6_full_seg(keys_d, w8_d, starts_d, counts_d))
        oracle8 = np.zeros((8, ncells))
        for c in range(8):
            np.add.at(oracle8[c], keys[:nvalid],
                      w8[c, :nvalid].astype(np.float64))
        err = np.abs(tot_d - oracle8).max()
        print(f"# p6 correctness: max abs err vs f64 oracle {err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
