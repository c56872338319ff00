"""cubep3m_tpu: TPU-native cosmological N-body (P3M) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of CubeP3M
(reference: jharno/cubep3m): two-level particle-mesh gravity with
particle-particle corrections, FLRW expansion, Zel'dovich ICs, adaptive
leapfrog stepping, checkpoint/restart, halofinding, projections and
power spectra, scaling over a 3-D `jax.sharding.Mesh`.
"""
import os as _os

from .config import SimConfig, Cosmology, G, small_config


def enable_compilation_cache(path: str = "/tmp/cubep3m_tpu_jax_cache"):
    """Persistent XLA compilation cache: sweeps/chunks compile once per
    config across processes (remote TPU compiles take minutes)."""
    import jax
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


__version__ = "0.1.0"
__all__ = ["SimConfig", "Cosmology", "G", "small_config",
           "enable_compilation_cache"]
