"""Simulation state and particle initialization.

Replaces the reference's giant COMMON block + equivalence overlays
(`source_threads/cubep3m.fh:33-171`) with an immutable pytree of
fixed-capacity padded arrays, and `particle_initialization.f90`'s compile-time
IC dispatch with runtime constructors.

Particles live in node-local fine-cell coordinates `[0, nf_physical_node_dim)`
like the reference; slots `>= np_local` are padding (zero weight everywhere).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimState:
    """Per-device simulation state (a pure pytree; all fields device arrays)."""

    x: jnp.ndarray            # (devices*max_np, 3) f32 positions, node coords
    v: jnp.ndarray            # (devices*max_np, 3) f32 velocities (cells/dtau)
    pid: jnp.ndarray          # (devices*max_np,) int32 particle IDs
    np_local: jnp.ndarray     # (devices,) int32 valid count per device

    # time integration scalars (mirrored on host by the controller)
    a: jnp.ndarray            # () f32 scale factor
    tau: jnp.ndarray          # () f32 super-comoving time
    t: jnp.ndarray            # () f32 accumulated dt
    dt_old: jnp.ndarray       # () f32 previous step dt (for the drift)
    nts: jnp.ndarray          # () int32 sweep counter

    # dt limiters from the last sweep (primed to 1000, variable_initialization.f90:22-28)
    dt_f_acc: jnp.ndarray     # () f32
    dt_pp_acc: jnp.ndarray    # () f32
    dt_pp_ext_acc: jnp.ndarray  # () f32
    dt_c_acc: jnp.ndarray     # () f32
    dt_gas_acc: jnp.ndarray   # () f32 gas CFL limit (MHD; dta/dtc role)

    # mesh shake accumulator (DISP_MESH, update_position.f90:25-63)
    shake_offset: jnp.ndarray  # (3,) f32

    # overflow diagnostics (reference aborts; we count and surface)
    pp_overflow: jnp.ndarray   # () int32: PP pairs dropped (dense window
                               # or dense buffer exhausted)
    exchange_overflow: jnp.ndarray  # () int32: particles dropped by the
                               # ghost exchange (buffer or capacity)
    bucket_overflow: jnp.ndarray  # () int32
    clamp_count: jnp.ndarray   # () int32: particles position-clamped after
                               # the ownership exchange (should stay 0; a
                               # nonzero count means a particle moved more
                               # than one node width in a step)

    # RNG for the mesh shake
    rng: jnp.ndarray           # PRNG key

    # optional MHD gas state (cfg.mhd): conserved fields on the fine grid
    # (module mpi_tvd_mhd's u/b); empty (0,) arrays when disabled
    gas_u: jnp.ndarray  # (5, nf, nf, nf) or (0,)
    gas_b: jnp.ndarray  # (3, nf, nf, nf) or (0,)

    @property
    def valid(self) -> jnp.ndarray:
        """Valid-slot mask (single-device layouts only)."""
        return jnp.arange(self.x.shape[0]) < self.np_local[0]

    @property
    def np_total_local(self) -> int:
        return int(jnp.sum(self.np_local))


def _base_state(cfg: SimConfig, x: np.ndarray, v: np.ndarray,
                pid: Optional[np.ndarray] = None,
                seed: int = 0) -> SimState:
    n = x.shape[0]
    cap = cfg.max_np
    if n > cap:
        raise ValueError(f"np_local {n} exceeds max_np {cap}")
    xp = np.zeros((cap, 3), np.float32)
    vp = np.zeros((cap, 3), np.float32)
    pp = np.zeros((cap,), np.int32)
    xp[:n] = x
    vp[:n] = v
    pp[:n] = pid if pid is not None else np.arange(1, n + 1, dtype=np.int32)
    f32 = lambda v_: jnp.asarray(v_, jnp.float32)
    return SimState(
        x=jnp.asarray(xp), v=jnp.asarray(vp), pid=jnp.asarray(pp),
        np_local=jnp.asarray([n], jnp.int32),
        a=f32(cfg.a_i if cfg.cosmo_expansion else 1.0),
        tau=f32(-3.0 / np.sqrt(cfg.a_i) if cfg.cosmo_expansion else 0.0),
        t=f32(0.0), dt_old=f32(0.0), nts=jnp.asarray(0, jnp.int32),
        dt_f_acc=f32(1000.0), dt_pp_acc=f32(1000.0),
        dt_pp_ext_acc=f32(1000.0), dt_c_acc=f32(1000.0),
        dt_gas_acc=f32(1000.0),
        shake_offset=jnp.zeros(3, jnp.float32),
        pp_overflow=jnp.asarray(0, jnp.int32),
        exchange_overflow=jnp.asarray(0, jnp.int32),
        bucket_overflow=jnp.asarray(0, jnp.int32),
        clamp_count=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
        gas_u=_default_gas(cfg)[0], gas_b=_default_gas(cfg)[1],
    )


def _default_gas(cfg: SimConfig):
    """Uniform gas at mean density (mhd_init simplest mode) or empty."""
    if not getattr(cfg, "mhd", False):
        e = jnp.zeros((0,), jnp.float32)
        return e, e
    from .mhd.tvd import uniform_gas
    nf = cfg.nf_physical_dim
    # mean gas density 1 (the omega_b/omega_m weighting happens at deposit)
    return uniform_gas((nf, nf, nf), rho=1.0, p=cfg.gas_p_init,
                       gamma=cfg.gas_gamma)


# ----------------------------------------------------------------------
# IC modes (particle_initialization.f90 dispatch)
# ----------------------------------------------------------------------
def grid_ic(cfg: SimConfig, seed: int = 0) -> SimState:
    """Uniform lattice, one particle per 2^3 fine cells; forces must vanish."""
    nf = cfg.nf_physical_node_dim
    g = np.arange(nf // 2, dtype=np.float32) * 2.0 + 0.5
    x = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    return _base_state(cfg, x, np.zeros_like(x), seed=seed)


def random_ic(cfg: SimConfig, seed: int = 0,
              fraction: float = 1.0) -> SimState:
    """Uniform random positions, zero velocities."""
    rng = np.random.default_rng(seed)
    n = int(cfg.np_node_avg * fraction)
    x = rng.uniform(0.0, cfg.nf_physical_node_dim, (n, 3)).astype(np.float32)
    return _base_state(cfg, x, np.zeros_like(x), seed=seed)


def pair_ic(cfg: SimConfig, x1, x2, v1=None, v2=None, seed: int = 0
            ) -> SimState:
    """Two particles at given positions (pairwise/pair_infall harness,
    set_pair.f90)."""
    x = np.array([x1, x2], np.float32)
    v = np.zeros((2, 3), np.float32)
    if v1 is not None:
        v[0] = v1
    if v2 is not None:
        v[1] = v2
    return _base_state(cfg, x, v, seed=seed)


def particles_ic(cfg: SimConfig, x: np.ndarray, v: np.ndarray,
                 pid: Optional[np.ndarray] = None, seed: int = 0) -> SimState:
    """Arbitrary particle load (used by the Zel'dovich IC generator and
    checkpoint restart)."""
    return _base_state(cfg, x, v, pid, seed=seed)


def gather_global(cfg: SimConfig, state: SimState):
    """Collect a (possibly multi-device) state into global-coordinate numpy
    arrays (x_global, v, pid), dropping padding (recompose.f90 role)."""
    nd = cfg.nodes_dim
    cap = cfg.max_np
    nf_node = cfg.nf_physical_node_dim
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    pid = np.asarray(state.pid)
    counts = np.asarray(state.np_local)
    xs, vs, ps = [], [], []
    for d in range(counts.size):
        n = int(counts[d])
        origin = (np.array(np.unravel_index(d, (nd, nd, nd)))
                  * nf_node).astype(np.float32)
        xs.append(x[d * cap:d * cap + n] + origin)
        vs.append(v[d * cap:d * cap + n])
        ps.append(pid[d * cap:d * cap + n])
    return np.concatenate(xs), np.concatenate(vs), np.concatenate(ps)


def distribute_global(cfg: SimConfig, x_global: np.ndarray,
                      v_global: np.ndarray,
                      pid: Optional[np.ndarray] = None,
                      seed: int = 0) -> SimState:
    """Distribute globally-coordinated particles over the device grid.

    x_global in [0, nf_physical_dim)^3; device (ix,iy,iz) gets the particles
    of its cubic subvolume in node-local coordinates, packed into its block
    of the (devices*max_np, ...) layout (mpi cubic decomposition analog,
    `utils/dist_init` pass_particles role for the initial load).
    """
    nd = cfg.nodes_dim
    nf_node = cfg.nf_physical_node_dim
    cap = cfg.max_np
    n = x_global.shape[0]
    if pid is None:
        pid = np.arange(1, n + 1, dtype=np.int32)
    node = np.clip((x_global // nf_node).astype(np.int64), 0, nd - 1)
    flat = (node[:, 0] * nd + node[:, 1]) * nd + node[:, 2]
    nodes = nd ** 3
    xp = np.zeros((nodes * cap, 3), np.float32)
    vp = np.zeros((nodes * cap, 3), np.float32)
    pp = np.zeros((nodes * cap,), np.int32)
    counts = np.zeros((nodes,), np.int32)
    for d in range(nodes):
        sel = np.where(flat == d)[0]
        if sel.size > cap:
            raise ValueError(f"device {d}: {sel.size} particles > max_np "
                             f"{cap}")
        origin = (np.array(np.unravel_index(d, (nd, nd, nd)))
                  * nf_node).astype(np.float32)
        xp[d * cap:d * cap + sel.size] = x_global[sel] - origin
        vp[d * cap:d * cap + sel.size] = v_global[sel]
        pp[d * cap:d * cap + sel.size] = pid[sel]
        counts[d] = sel.size
    f32 = lambda v_: jnp.asarray(v_, jnp.float32)
    return SimState(
        x=jnp.asarray(xp), v=jnp.asarray(vp), pid=jnp.asarray(pp),
        np_local=jnp.asarray(counts, jnp.int32),
        a=f32(cfg.a_i if cfg.cosmo_expansion else 1.0),
        tau=f32(-3.0 / np.sqrt(cfg.a_i) if cfg.cosmo_expansion else 0.0),
        t=f32(0.0), dt_old=f32(0.0), nts=jnp.asarray(0, jnp.int32),
        dt_f_acc=f32(1000.0), dt_pp_acc=f32(1000.0),
        dt_pp_ext_acc=f32(1000.0), dt_c_acc=f32(1000.0),
        dt_gas_acc=f32(1000.0),
        shake_offset=jnp.zeros(3, jnp.float32),
        pp_overflow=jnp.asarray(0, jnp.int32),
        exchange_overflow=jnp.asarray(0, jnp.int32),
        bucket_overflow=jnp.asarray(0, jnp.int32),
        clamp_count=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
        gas_u=_default_gas(cfg)[0], gas_b=_default_gas(cfg)[1],
    )
