"""Microbenchmark: argsort vs gather/scatter economics on the TPU.

Decides ROADMAP item 'merge the class sort into the cell sort': the merged
design replaces {argsort(N) + (7,N) gather} with {~4 extra N-index
gather/scatter ops}; it wins iff argsort costs >~3 index-op units.

Run on the real chip: python scripts/sort_bench.py [--n 2800000]
(each op timed with a device_get fence; axon block_until_ready lies).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_800_000)
    ap.add_argument("--cells", type=int, default=256 ** 3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n, ncells = args.n, args.cells
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, ncells, n, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    pay7 = jnp.asarray(rng.normal(size=(7, n)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(ncells,)).astype(np.float32))

    def fence(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))

    def bench(name, fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        fence(out)                      # compile
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        fence(out)
        dt = (time.time() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms")
        return dt

    bench("argsort_i32", lambda k: jnp.argsort(k), keys)
    bench("sort_pairs_i32", lambda k: jax.lax.sort(
        (k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1], keys)
    bench("gather_row7", lambda p, o: p[:, o], pay7, perm)
    bench("gather_row1", lambda t, k: t[k], table,
          jnp.clip(keys, 0, ncells - 1))
    bench("scatter_add_ones", lambda k: jnp.zeros(ncells + 1,
          jnp.float32).at[jnp.clip(k, 0, ncells)].add(1.0), keys)
    bench("scatter_set_row7", lambda p, o: jnp.zeros(
        (7, n + 1), jnp.float32).at[:, o].set(p), pay7, perm)
    bench("cumsum_cells", lambda t: jnp.cumsum(t), table)
    m = n // 20
    bench("argsort_small(R=N/20)", lambda k: jnp.argsort(k[:m]), keys)
    bench("searchsorted_R_in_N",
          lambda s, q: jnp.searchsorted(s, q),
          jnp.sort(keys), jnp.sort(keys[:m]))


if __name__ == "__main__":
    main()
