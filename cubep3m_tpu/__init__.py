"""cubep3m_tpu: TPU-native cosmological N-body (P3M) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of CubeP3M
(reference: jharno/cubep3m): two-level particle-mesh gravity with
particle-particle corrections, FLRW expansion, Zel'dovich ICs, adaptive
leapfrog stepping, checkpoint/restart, halofinding, projections and
power spectra, scaling over a 3-D `jax.sharding.Mesh`.
"""
from .config import SimConfig, Cosmology, G, small_config

__version__ = "0.1.0"
__all__ = ["SimConfig", "Cosmology", "G", "small_config"]
