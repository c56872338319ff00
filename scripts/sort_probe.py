"""On-chip probe for the sort/reorder 40% (VERDICT r4 weak #4).

The 256^3 step spends ~40% in index machinery: cell argsort 221 ms +
packed (7,N) reorder 189 ms + coarse key sort 79 ms + coarse reorder.
Each op sits at its measured per-op floor; this probe tests whether the
*algorithm* can beat the floor:

  A. argsort on random keys                (the production baseline)
  B. argsort on already-sorted keys        (is XLA's sort data-dependent?
                                            if yes, temporal coherence is
                                            free — each sweep's input is
                                            the previous sweep's order)
  C. argsort on drift-perturbed keys       (the actual per-sweep input:
                                            sorted order + ~0.2-cell
                                            drift + uniform shake shift)
  D. ONE variadic lax.sort moving the 7 payload rows through the sort
     network vs argsort + one packed gather (saves the 189 ms gather iff
     the network's payload traffic is cheaper than one random gather)
  E. segment-local repair: drift only perturbs keys by +-1 cell along
     one axis for ~30% of particles; sort (key*K + local_rank) style
     re-keying is not tried here — E measures the cheapest lower bound,
     a masked compact of the ~30% movers + 70% keep (two N-index ops),
     to see if ANY repair scheme could beat A+gather.

Run: python scripts/sort_probe.py [--n 17616076] [--cpu]
Writes bench_cache/sort_probe.json with the verdict.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=17_616_076)
    ap.add_argument("--nf", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    n, nf = args.n, args.nf
    ncells = nf ** 3
    rng = np.random.default_rng(0)
    # clustered-ish positions: lattice + noise, sorted state as production
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    key0 = ((x[:, 0].astype(np.int64) * nf + x[:, 1].astype(np.int64))
            * nf + x[:, 2].astype(np.int64)).astype(np.int32)
    order0 = np.argsort(key0, kind="stable")
    keys_sorted = key0[order0]
    xs = x[order0]
    # drift + shake: uniform shift up to 2 cells + per-particle 0.2-cell
    # gaussian drift, periodic wrap — the next sweep's key array in the
    # PREVIOUS sweep's order
    shift = rng.uniform(-8, 8, 3)
    xd = np.mod(xs + shift + 0.2 * rng.normal(size=(n, 3)), nf)
    keyd = ((xd[:, 0].astype(np.int64) * nf + xd[:, 1].astype(np.int64))
            * nf + xd[:, 2].astype(np.int64)).astype(np.int32)

    pay = rng.normal(size=(7, n)).astype(np.float32)

    dev_rand = jnp.asarray(key0)
    dev_sorted = jnp.asarray(keys_sorted)
    dev_drift = jnp.asarray(keyd)
    dev_pay = jnp.asarray(pay)

    def fence(v):
        leaves = jax.tree.leaves(v)
        np.asarray(jax.device_get(leaves[0]))
        return v

    results = {}

    def bench(name, fn, *a):
        f = jax.jit(fn)
        fence(f(*a))  # compile
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        fence(out)
        ms = (time.time() - t0) / args.iters * 1e3
        results[name] = round(ms, 2)
        print(f"{name:>44}: {ms:9.2f} ms", flush=True)
        return out

    bench("A argsort random keys", lambda k: jnp.argsort(k), dev_rand)
    bench("B argsort sorted keys", lambda k: jnp.argsort(k), dev_sorted)
    bench("C argsort drifted keys", lambda k: jnp.argsort(k), dev_drift)
    bench("A+gather argsort + (7,N) reorder",
          lambda k, p: p[:, jnp.argsort(k)], dev_drift, dev_pay)
    bench("D variadic sort key + 7 payload rows",
          lambda k, p: jax.lax.sort((k,) + tuple(p[i] for i in range(7)),
                                    num_keys=1),
          dev_drift, dev_pay)
    # E: lower bound for ANY repair scheme — one boolean compact
    # (nonzero + gather) of 30% movers plus one merged write
    movers = jnp.asarray(
        (rng.uniform(size=n) < 0.3).astype(np.bool_))

    def repair_lb(mask, p):
        idx = jnp.nonzero(mask, size=int(0.31 * n), fill_value=n - 1)[0]
        sub = p[:, idx]
        return p.at[:, idx].set(sub)

    bench("E repair lower bound (compact+scatter 30%)",
          repair_lb, movers, dev_pay)

    out = {"n": n, "nf": nf, "backend": jax.default_backend(),
           "results_ms": results,
           "verdict": {
               "sort_data_dependent":
                   results["B argsort sorted keys"]
                   < 0.8 * results["A argsort random keys"],
           }}
    path = os.path.join(os.path.dirname(__file__), "..", "bench_cache",
                        "sort_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["verdict"]))


if __name__ == "__main__":
    main()
