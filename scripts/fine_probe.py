"""TPU probe: ranked streaming-window fine NGP deposit/gather vs XLA.

A/Bs ops/fine_pallas.py at bench-sized inputs (17.6M particles sorted by
512^3 fine cell) in a fresh process, gates the verdict on EXACTNESS
(power-of-two masses: the deposit must match the scatter bit-for-bit;
the gather is exact selection), and records it for cfg.fine_pallas=None
auto decisions.  Run: python scripts/fine_probe.py [--np-dim 256]
[--only pallas|xla] [--cpu]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np-dim", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--only", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--record", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cubep3m_tpu.ops import deposit
from cubep3m_tpu.experiments import fine_pallas

    nf = 2 * args.np_dim
    nflat = nf ** 3
    n = args.np_dim ** 3
    cap = int(n * 1.05)
    print(f"# n={n} cap={cap} nf={nf}", file=sys.stderr, flush=True)

    # clustered + uniform positions, sorted by flat fine cell (the
    # sweep's contract); ~5% invalid tail at the sentinel
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(0, nf, (n - n // 8, 3)),
        (rng.normal(0.37 * nf, 0.01 * nf, (n // 8, 3)) % nf)]).astype(
            np.float32)
    cells = np.floor(x).astype(np.int64)
    key_h = np.full(cap, nflat, np.int64)
    key_h[:n] = (cells[:, 0] * nf + cells[:, 1]) * nf + cells[:, 2]
    order = np.argsort(key_h, kind="stable")
    skey_h = key_h[order].astype(np.int32)
    w_h = np.where(skey_h < nflat, 8.0, 0.0).astype(np.float32)

    skey = jnp.asarray(skey_h)
    w = jnp.asarray(w_h)
    fld = jnp.asarray(rng.normal(size=(3, nf, nf, nf)).astype(np.float32))

    def sync(out):
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *a):
        t0 = time.time()
        out = fn(*a)
        sync(out)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*a)
            sync(out)
        dt = (time.time() - t0) / args.reps
        print(f"{name:>28}: {dt * 1e3:9.2f} ms (compile {tc:.1f}s)",
              flush=True)
        return out, dt * 1e3

    dep_x = gat_x = None
    ms_dep_x = ms_gat_x = None
    if args.only in ("", "xla"):
        dx = jax.jit(lambda k, ww: jnp.zeros(nflat, jnp.float32).at[
            jnp.minimum(k, nflat - 1)].add(
                jnp.where(k < nflat, ww, 0.0),
                indices_are_sorted=True).reshape(nf, nf, nf))
        dep_x, ms_dep_x = timeit("XLA scatter-add deposit", dx, skey, w)
        gx = jax.jit(lambda f, k: deposit.ngp_gather_t(
            f, jnp.clip(k, 0, nflat - 1)))
        gat_x, ms_gat_x = timeit("XLA 3-comp NGP gather", gx, fld, skey)

    if args.only in ("", "pallas"):
        backend = jax.default_backend()
        try:
            dp = jax.jit(lambda k, ww: fine_pallas.ngp_deposit_ranked(
                k, ww, (nf, nf, nf), interpret=args.cpu))
            dep_p, ms_dep = timeit("RANKED window deposit", dp, skey, w)
            gp = jax.jit(lambda f, k, ww: fine_pallas.ngp_gather_ranked(
                f, k, ww, interpret=args.cpu))
            gat_p, ms_gat = timeit("RANKED window gather", gp, fld, skey, w)

            # exactness gates (both must be bit-equal to the XLA ops)
            dh = np.asarray(jax.device_get(dep_p))
            gh = np.asarray(jax.device_get(gat_p))
            dref = (np.asarray(jax.device_get(dep_x)) if dep_x is not None
                    else None)
            if dref is None:
                hist = np.zeros(nflat, np.float32)
                np.add.at(hist, np.minimum(skey_h, nflat - 1),
                          np.where(skey_h < nflat, w_h, 0.0))
                dref = hist.reshape(nf, nf, nf)
            err_d = float(np.max(np.abs(dh - dref))) if n else 0.0
            gref = np.asarray(fld.reshape(3, -1))[
                :, np.minimum(skey_h, nflat - 1)]
            gref = np.where(skey_h[None, :] < nflat, gref, 0.0)
            err_g = float(np.max(np.abs(gh - gref))) if n else 0.0
            exact = err_d == 0.0 and err_g == 0.0
            print(f"# deposit max abs diff {err_d:.3e}, gather "
                  f"{err_g:.3e} -> {'EXACT' if exact else 'INEXACT'}",
                  flush=True)
            # speed gate: the kernels sit on the production deposit path,
            # so an exact-but-slower A/B must NOT auto-enable them
            faster = True
            msg = ""
            if ms_dep_x is not None:
                faster = (ms_dep + ms_gat) < (ms_dep_x + ms_gat_x)
                msg = (f"pallas {ms_dep + ms_gat:.1f} ms vs xla "
                       f"{ms_dep_x + ms_gat_x:.1f} ms")
                print(f"# A/B: {msg} -> "
                      f"{'FASTER' if faster else 'SLOWER'}", flush=True)
            ok = exact and faster
            if args.record:
                fine_pallas.record_probe_verdict(
                    backend, ok, ms_deposit=ms_dep, ms_gather=ms_gat,
                    error="" if ok else
                    (f"inexact: deposit {err_d:.3e} gather {err_g:.3e}"
                     if not exact else f"slower: {msg}"))
                print(f"# recorded ok={exact} verdict for backend "
                      f"{backend}", file=sys.stderr, flush=True)
        except Exception as e:
            if args.record:
                fine_pallas.record_probe_verdict(backend, False,
                                                 error=repr(e))
                print(f"# recorded FAILED verdict for backend "
                      f"{backend}: {e!r}", file=sys.stderr, flush=True)
            raise


if __name__ == "__main__":
    main()
