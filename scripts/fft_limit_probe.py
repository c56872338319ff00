"""Probe the axon backend's c2c transform limit (fresh process per size:
one failed compile poisons later compiles).  Usage:
    python scripts/fft_limit_probe.py 512
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((n, n, n), jnp.complex64)
    t0 = time.time()
    f = jax.jit(lambda a: jnp.fft.ifftn(jnp.fft.fftn(a)))
    out = f(x)
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"# {n}^3 c2c fft+ifft OK in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
