"""TPU probe: Pallas ranked-window coarse gather vs the XLA corner gather.

Measures both at bench-sized inputs (17.6M particles, 130^3 coarse cells)
in a fresh process.  Run: python scripts/gather_probe.py [--np-dim 256]
[--only pallas|xla]
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
                    default=True,
                    help="persist the Pallas verdict (bench_cache/"
                         "gather_pallas_probe.json) so cfg auto decisions "
                         "skip a kernel that fails on this backend")
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cubep3m_tpu.ops import deposit
    from cubep3m_tpu.ops.gather_pallas import cic_gather_corner_ranked

    nf = 2 * args.np_dim
    ms = 4
    nc = nf // ms
    ncp = nc + 2
    n = args.np_dim ** 3
    cap = int(n * 1.05)
    print(f"# n={n} cap={cap} ncp={ncp}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    x = np.zeros((cap, 3), np.float32)
    x[:n] = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    valid_h = np.arange(cap) < n

    # host-side coarse-key sort (mirrors cfg.coarse_sort state)
    b = np.clip(np.floor(x[:n] / ms - 0.5).astype(np.int64) + 1, 0, ncp - 2)
    key_h = np.full(cap, ncp ** 3, np.int64)
    key_h[:n] = (b[:, 0] * ncp + b[:, 1]) * ncp + b[:, 2]
    order = np.argsort(key_h, kind="stable")
    xs = x[order]
    keys_s = key_h[order].astype(np.int32)
    vs = valid_h[order]
    counts_h = np.bincount(key_h[:n], minlength=ncp ** 3 + 1)[
        :ncp ** 3].astype(np.int32)

    field = rng.normal(size=(3, ncp, ncp, ncp)).astype(np.float32)

    xt = jnp.asarray(xs.T)
    keys = jnp.asarray(keys_s)
    counts = jnp.asarray(counts_h)
    fld = jnp.asarray(field)
    v = jnp.asarray(vs)

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
        return out

    want = got = None
    if args.only in ("", "xla"):
        gx = jax.jit(lambda f, xx: deposit.cic_gather_corner_t(
            f, xx, scale=ms, offset=-0.5, pad=1, valid=v,
            sorted_cells=True))
        want = timeit("XLA corner gather (sorted)", gx, fld, xt)
    if args.only in ("", "pallas"):
        from cubep3m_tpu.ops.gather_pallas import record_probe_verdict
        backend = jax.default_backend()
        gp = jax.jit(lambda f, xx, kk, cc: cic_gather_corner_ranked(
            f, xx, kk, cc, scale=ms, offset=-0.5))
        try:
            t_probe = time.time()
            got = timeit("PALLAS ranked gather", gp, fld, xt, keys, counts)
            ms_pallas = (time.time() - t_probe) * 1e3
            # EXACTNESS gate against a float64 host reference: the
            # verdict drives unattended runs (bench exe + validation),
            # so a kernel that lowers but rounds (e.g. a default-
            # precision MXU pass quantizing the f32 table to bf16,
            # 1.3e-2 max abs measured 2026-08-18) must record FAILED.
            g = np.asarray(jax.device_get(got))[:, vs]
            xs_v = xs[vs].astype(np.float64)
            t = xs_v / ms - 0.5
            c0 = np.clip(np.floor(t).astype(np.int64) + 1, 0, ncp - 2)
            fr = t - np.floor(t)
            ref = np.zeros((3, len(xs_v)))
            f64 = field.astype(np.float64)
            for dx in (0, 1):
                wx = fr[:, 0] if dx else 1.0 - fr[:, 0]
                for dy in (0, 1):
                    wy = fr[:, 1] if dy else 1.0 - fr[:, 1]
                    for dz in (0, 1):
                        wz = fr[:, 2] if dz else 1.0 - fr[:, 2]
                        ref += (wx * wy * wz) * f64[
                            :, c0[:, 0] + dx, c0[:, 1] + dy, c0[:, 2] + dz]
            err_ref = float(np.max(np.abs(g - ref)))
            scale_ref = float(np.max(np.abs(ref)))
            exact = err_ref <= 1e-5 * max(scale_ref, 1.0)
            print(f"# pallas vs float64 host ref: max abs diff "
                  f"{err_ref:.3e} (field scale {scale_ref:.2f}) -> "
                  f"{'EXACT' if exact else 'INEXACT'}", flush=True)
            if args.record:
                record_probe_verdict(
                    backend, exact, ms=ms_pallas,
                    error="" if exact else
                    f"inexact: max abs diff {err_ref:.3e}")
                print(f"# recorded ok={exact} verdict for backend "
                      f"{backend}", file=sys.stderr, flush=True)
        except Exception as e:
            if args.record:
                record_probe_verdict(backend, False, error=repr(e))
                print(f"# recorded FAILED verdict for backend {backend}: "
                      f"{e!r}", file=sys.stderr, flush=True)
            raise
    if want is not None and got is not None:
        w = np.asarray(jax.device_get(want))[:, vs]
        g = np.asarray(jax.device_get(got))[:, vs]
        err = np.max(np.abs(w - g))
        print(f"# max abs diff vs XLA (valid slots): {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
