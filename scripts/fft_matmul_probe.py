"""TPU probe: MXU matmul DFT (ops/dftmm.py) vs XLA's FFT on the fine
force solve.

Times `force_from_density` at the bench tile size (288^3, the 256^3
run's fine FFT tile) both ways in a fresh process, checks exactness, and
records the verdict (bench_cache/fft_matmul_probe.json) that
cfg.fft_matmul=None (auto) consults — so the unattended bench only
enables the matmul path where an on-hardware A/B showed it both exact
and faster.

Run: python scripts/fft_matmul_probe.py [--n 288] [--only mm|fft]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=288)
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
    from cubep3m_tpu.ops import dftmm, fftconv

    n = args.n
    rng = np.random.default_rng(0)
    rho = rng.standard_normal((n, n, n)).astype(np.float32)
    kern = rng.standard_normal((3, n, n, n)).astype(np.float32)
    rho_d, kern_d = jnp.asarray(rho), jnp.asarray(kern)

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

    backend = jax.default_backend()
    want = got = None
    ms_fft = ms_mm = None
    if args.only in ("", "fft"):
        f_fft = jax.jit(lambda r, k: fftconv.force_from_density(r, k))
        want, ms_fft = timeit(f"XLA FFT solve ({n}^3)", f_fft, rho_d,
                              kern_d)
    if args.only in ("", "mm"):
        f_mm = jax.jit(lambda r, k: fftconv.force_from_density(
            r, k, use_mm=True))
        try:
            got, ms_mm = timeit(f"MXU matmul DFT solve ({n}^3)", f_mm,
                                rho_d, kern_d)
        except Exception as e:
            if args.record:
                dftmm.record_probe_verdict(backend, False, error=repr(e))
                print(f"# recorded FAILED verdict for {backend}: {e!r}",
                      file=sys.stderr, flush=True)
            raise

    err = None
    if want is not None and got is not None:
        w = np.asarray(jax.device_get(want))
        g = np.asarray(jax.device_get(got))
        err = float(np.max(np.abs(w - g)) / max(np.max(np.abs(w)), 1e-30))
        print(f"# max rel diff: {err:.3e}", flush=True)

    if args.record and ms_mm is not None:
        # ok = exact AND faster; a one-sided run (--only mm) records
        # exactness-unknown as ok=False so auto stays conservative
        ok = (err is not None and err < 1e-4
              and ms_fft is not None and ms_mm < ms_fft)
        dftmm.record_probe_verdict(backend, ok, ms_mm=ms_mm,
                                   ms_fft=ms_fft, max_rel_err=err)
        print(f"# recorded verdict ok={ok} for backend {backend}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
