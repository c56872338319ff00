"""cubep3m_tpu: TPU-native cosmological N-body (P3M) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of CubeP3M
(reference: jharno/cubep3m): two-level particle-mesh gravity with
particle-particle corrections, FLRW expansion, Zel'dovich ICs, adaptive
leapfrog stepping, checkpoint/restart, halofinding, projections and
power spectra, scaling over a 3-D `jax.sharding.Mesh`.
"""
import os as _os

from .config import SimConfig, Cosmology, G, small_config


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache: sweeps/chunks compile once per
    config across processes (remote TPU compiles take minutes).

    Default location is REPO-LOCAL (bench_cache/jax_cache, gitignored),
    not /tmp: the repo directory outlives driver sessions, so a warm
    cache survives into the next session/round — the r3 BENCH paid
    245.9 s of first-step compile at 256^3 every session because the
    /tmp cache died with it.  Override with $CUBEP3M_JAX_CACHE."""
    import jax
    if path is None:
        path = _os.environ.get("CUBEP3M_JAX_CACHE") or _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "bench_cache", "jax_cache")
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def relay_alive(port: int = None, timeout: float = 3.0) -> bool:
    """TCP-probe the axon TPU tunnel relay.

    A DEAD relay blocks jax backend init forever (the relay process is
    stdio-driven by an external parent and cannot be restarted from
    inside the container) — entry points probe this before touching
    `jax.devices()` so a missing tunnel fails fast instead of hanging.
    """
    import socket
    if port is None:
        port = int(_os.environ.get("CUBEP3M_AXON_RELAY_PORT", "8113"))
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout):
            return True
    except OSError:
        return False


__version__ = "0.1.0"
__all__ = ["SimConfig", "Cosmology", "G", "small_config",
           "enable_compilation_cache", "relay_alive"]
