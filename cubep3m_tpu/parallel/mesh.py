"""Device mesh and sharding layout.

Replaces the reference's MPI cartesian topology
(`source_threads/mpi_initialization.f90:53-76`: `mpi_cart_create` over
`nodes_dim^3` ranks with periodic wrap and `cart_neighbor(6)`) with a 3-D
`jax.sharding.Mesh`.  Neighbor communication becomes `jax.lax.ppermute`
ring shifts along the named axes; XLA schedules them over ICI.

Particle arrays are sharded on their leading axis across all three mesh
axes (device (ix,iy,iz) owns block ix*ny*nz + iy*nz + iz); each device's
block holds the particles of its cubic subvolume in node-local coordinates,
exactly like a reference rank.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("x", "y", "z")


def make_sim_mesh(nodes_dim: int, devices=None) -> Mesh:
    """3-D periodic cartesian device mesh, `nodes_dim` per axis."""
    n = nodes_dim ** 3
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for nodes_dim={nodes_dim}, "
            f"have {len(devices)}")
    dev = np.array(devices[:n]).reshape(nodes_dim, nodes_dim, nodes_dim)
    return Mesh(dev, AXES)


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over all three mesh axes."""
    return NamedSharding(mesh, P(AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ring_perm(size: int, shift: int) -> list[tuple[int, int]]:
    """ppermute permutation sending device j's data to (j+shift) mod size."""
    return [(j, (j + shift) % size) for j in range(size)]
