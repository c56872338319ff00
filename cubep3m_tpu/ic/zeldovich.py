"""Zel'dovich initial condition generator.

Replaces `utils/dist_init/dist_init.f90` (the `dist_init` MPI binary):
Gaussian random field with the target linear power, Zel'dovich displacement
through the discrete Poisson kernel, velocities from the same displacement
field.  Numerical contract (dist_init.f90):

* `deltafield` (:851-947): delta_k = sqrt(Delta^2(k)/(4 pi k_r^3) * N^3)
  * whitenoise_k, k_r in grid wavenumbers.
* `potentialfield` (:1320-1524): phi_k = -4 pi delta_k / k_d^2 with
  k_d = 2 sin(pi k / N) per axis; the Ewald-matched `correct_kernel`
  option is implemented in `_corrected_inv_kd2` (replicated path only).
* displacement = central-difference gradient: psi_k = i sin(2 pi k / N)
  * delta_k / k_d^2 (dist_init.f90:1507-1509 combined with the -4pi kernel).
* particles at cell centers of every 2nd fine cell, displaced by psi at
  their lattice site (:1552-1560); velocities = vfactor * psi CIC-sampled
  at the displaced position (`cicvelocity` :2067-2128),
  vfactor = a^2 H(a) = da/dtau (:2674-2687).

The field is generated on the global fine mesh on device (jnp complex FFT)
and distributed to the device grid with `state.distribute_global`.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import SimState, distribute_global, particles_ic
from . import transfer as transfer_mod
from ..ops import dftmm


def vfactor(a: float, c) -> float:
    """a^2 H(a) in code time units = da/dtau (dist_init.f90:2674-2687)."""
    lm = c.omega_l / c.omega_m
    km = (1 - c.omega_m - c.omega_l) / c.omega_m
    h = 2 / (3 * math.sqrt(a ** 3)) * math.sqrt(1 + a * km + a ** 3 * lm)
    return a ** 2 * h


def _discrete_phi(nf: int, inv_kd2: np.ndarray):
    """phi(r) = IFFT(-4 pi / k_d^2) of the discrete Poisson kernel, plus
    the r=8 shell matching offset phi8 (dist_init.f90 correct_kernel's
    phi8 average, :1368-1466).  One host-side global IFFT (setup time)."""
    phi_k = -4.0 * math.pi * inv_kd2.astype(np.float64)
    phi = np.fft.ifftn(phi_k).real
    d = np.fft.fftfreq(nf) * nf
    dx, dy, dz = np.meshgrid(d, d, d, indexing="ij")
    r = np.sqrt(dx * dx + dy * dy + dz * dz)
    shell = (np.abs(r - 8.0) < 0.5)
    phi8 = phi[shell].mean() + 1.0 / 8.0
    return phi, r, phi8


def _corrected_inv_kd2(nf: int, inv_kd2: np.ndarray) -> np.ndarray:
    """Ewald-match the near field of the discrete Poisson kernel.

    Builds phi(r) = IFFT(-4 pi / k_d^2), replaces r < 8 cells by the exact
    -1/r (offset-matched at the r=8 shell like dist_init's phi8 average),
    and returns the equivalent corrected 1/k_d^2 multiplier.
    """
    phi, r, phi8 = _discrete_phi(nf, inv_kd2)
    near = r < 8.0
    phi_corr = np.where(near, -1.0 / np.maximum(r, 1.0) + phi8, phi)
    phi_corr[0, 0, 0] = phi[0, 0, 0] + phi8  # self term offset-consistent
    phi_k_corr = np.fft.fftn(phi_corr).real
    out = (-phi_k_corr / (4.0 * math.pi)).astype(np.float32)
    out.flat[0] = 0.0
    return out


EWALD_REACH = 8  # correction support radius in fine cells (dist_init.f90)


def ewald_patch(nf: int, _cache={}) -> np.ndarray:
    """Compact real-space Ewald correction kernel for the DISTRIBUTED IC
    path: g(d) = -(phi_corr - phi)(d) / (4 pi) on offsets |d| <= 8, zero
    outside.  Convolving the local delta field with g and taking the
    spectral central difference (i sin(2 pi k/N) == centered difference)
    adds exactly the displacement correction the replicated path applies
    through `_corrected_inv_kd2` — no device ever holds a global kernel.
    The one global IFFT happens on the HOST at setup time.
    """
    if nf in _cache:
        return _cache[nf]
    k = np.fft.fftfreq(nf) * nf
    kd2 = (2 * np.sin(math.pi * k / nf)) ** 2
    kd2_tot = (kd2[:, None, None] + kd2[None, :, None]
               + kd2[None, None, :])
    inv_kd2 = np.where(kd2_tot > 0, 1.0 / np.maximum(kd2_tot, 1e-20), 0.0)
    phi, _, phi8 = _discrete_phi(nf, inv_kd2)
    R = EWALD_REACH
    g = np.arange(-R, R + 1)
    dx, dy, dz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
    phi_near = phi[dx % nf, dy % nf, dz % nf]
    dphi = np.where(r < R, (-1.0 / np.maximum(r, 1.0) + phi8) - phi_near,
                    0.0)
    dphi[R, R, R] = phi8  # origin: phi_corr[0] = phi[0] + phi8
    out = (-dphi / (4.0 * math.pi)).astype(np.float32)
    _cache[nf] = out
    return out


def gaussian_delta_k(nf: int, pk_grid, key) -> jnp.ndarray:
    """delta_k on the full nf^3 grid: FFT of unit white noise x sqrt(P N^3).

    pk_grid: callable k_r (grid units, |k| in [0, nf/2*sqrt(3)]) -> P_grid.
    """
    noise = jax.random.normal(key, (nf, nf, nf), dtype=jnp.float32)
    noise_k = jnp.fft.fftn(noise.astype(jnp.complex64))
    k = np.fft.fftfreq(nf) * nf
    kx = k[:, None, None]
    ky = k[None, :, None]
    kz = k[None, None, :]
    kr = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    amp = np.sqrt(np.where(kr > 0, pk_grid(np.maximum(kr, 1e-10)), 0.0)
                  * float(nf) ** 3).astype(np.float32)
    return noise_k * jnp.asarray(amp)


def zeldovich_ic(cfg: SimConfig, seed: int = 0,
                 transfer_file: Optional[str] = None,
                 return_delta: bool = False,
                 host_fft: bool = False,
                 use_mm: Optional[bool] = None):
    """Generate a SimState with Zel'dovich ICs at cfg.z_i.

    Single global-field generation (host+device); distributed over the
    device grid by subvolume.

    host_fft=True runs the field generation (noise, delta_k, the three
    displacement transforms and the velocity CIC gather) in numpy on the
    HOST: insurance for backends whose c2c transform limit is below
    nf^3 (the axon TPU backend reports UNIMPLEMENTED for 576^3 c2c; at a
    256^3 box nf = 512).  Same spectra/physics; a different white-noise
    realization than the device RNG stream for the same seed.

    use_mm (None = probe-verdict auto, ops/dftmm.py) runs the device
    transforms as MXU matmul DFTs instead — same realization as the
    default device path, no backend c2c size limit, and faster where the
    on-hardware A/B says so.
    """
    if use_mm is None:
        use_mm = dftmm.auto_enabled()
    _fftn = dftmm.fftn_mm if use_mm else jnp.fft.fftn
    _ifftn = dftmm.ifftn_mm if use_mm else jnp.fft.ifftn
    c = cfg.cosmo
    nf = cfg.nf_physical_dim
    a_i = cfg.a_i
    lin = transfer_mod.linear_power(c, a_i, transfer_file=transfer_file)

    # grid wavenumber -> physical k [h/Mpc]; P in grid units:
    # Delta^2(k_phys) / (4 pi k_r^3)   (deltafield contract)
    k_fac = 2 * math.pi / cfg.box

    def pk_grid(kr):
        return lin.delta2(kr * k_fac) / (4 * math.pi * kr ** 3)

    # precompute k-space factors on host
    k = np.fft.fftfreq(nf) * nf
    sin_g = np.sin(2 * math.pi * k / nf).astype(np.float32)
    kd2 = (2 * np.sin(math.pi * k / nf)) ** 2
    kd2_tot = (kd2[:, None, None] + kd2[None, :, None]
               + kd2[None, None, :]).astype(np.float32)
    inv_kd2 = np.where(kd2_tot > 0, 1.0 / np.maximum(kd2_tot, 1e-20),
                       0.0).astype(np.float32)
    if cfg.ic_correct_kernel:
        # Ewald-matched short-range correction (dist_init.f90
        # `correct_kernel`, :1368-1466): replace the discrete Poisson
        # kernel's near field (r < 8 cells) by the exact -1/r potential,
        # matched at the r=8 shell average.
        inv_kd2 = _corrected_inv_kd2(nf, inv_kd2)
    kr = np.sqrt(k[:, None, None] ** 2 + k[None, :, None] ** 2
                 + k[None, None, :] ** 2)
    amp = np.sqrt(np.where(kr > 0, pk_grid(np.maximum(kr, 1e-10)), 0.0)
                  * float(nf) ** 3).astype(np.float32)
    shapes = [(nf, 1, 1), (1, nf, 1), (1, 1, nf)]

    vf = vfactor(a_i, c)
    npd = nf // 2
    from ..ops.deposit import cic_gather_t
    # delta/psi fields are only materialized as jit outputs when a caller
    # needs them (1.6+ GB residents at 256^3 otherwise); the "particles"
    # gas IC deposits from x/v directly and needs neither
    want_fields = bool(return_delta or (cfg.mhd and cfg.gas_from_delta
                                        and cfg.gas_ic == "delta"))

    # jitted, fully device-resident: eager complex ops with weak python
    # scalars are unsupported on the axon TPU backend, and host<->device
    # transfers through the TPU tunnel run at ~50 MB/s — everything from
    # the noise to the padded particle arrays stays on device.
    # amp/inv_kd2 are nf^3 fields: pass as ARGUMENTS, not closures — the
    # axon remote-compile path embeds closed-over constants in the request
    # body (HTTP 413 at production sizes)
    @jax.jit
    def _make(key, amp_d, inv_kd2_d):
        noise = jax.random.normal(key, (nf, nf, nf), dtype=jnp.float32)
        delta_k = _fftn(noise.astype(jnp.complex64)) * amp_d
        psi = []
        for axis in range(3):
            grad = jnp.asarray(sin_g.reshape(shapes[axis]))
            psi_k = 1j * grad * delta_k * inv_kd2_d
            psi.append(_ifftn(psi_k).real.astype(jnp.float32))
        psi = jnp.stack(psi)

        # particles at centers of every 2nd cell, displaced by psi at the
        # site (dist_init.f90:1552-1560): strided views, no gathers.
        # SoA (3, N) throughout — any (N, small) minor-axis intermediate
        # lane-pads 42x on TPU (a (3, 16.8M, 8) gather temp is 25.8 GB)
        disp = psi[:, ::2, ::2, ::2]
        q = jnp.arange(npd, dtype=jnp.float32) * 2.0 + 0.5
        xT = jnp.stack(
            [(q[:, None, None] + disp[0]).reshape(-1),
             (q[None, :, None] + disp[1]).reshape(-1),
             (q[None, None, :] + disp[2]).reshape(-1)])
        xT = jnp.mod(xT, float(nf))

        psi_pad = jnp.pad(psi, ((0, 0), (1, 1), (1, 1), (1, 1)),
                          mode="wrap")
        vT = vf * cic_gather_t(psi_pad, xT, scale=1.0, offset=-0.5, pad=1)
        x = xT.T.astype(jnp.float32)
        v = vT.T.astype(jnp.float32)
        if want_fields:
            return x, v, delta_k, psi
        return x, v

    if host_fft:
        rng_h = np.random.default_rng(seed)
        noise = rng_h.standard_normal((nf, nf, nf)).astype(np.float32)
        delta_k_h = np.fft.fftn(noise.astype(np.complex64)) * amp
        del noise
        psi_h = np.empty((3, nf, nf, nf), np.float32)
        for axis in range(3):
            grad = sin_g.reshape(shapes[axis])
            psi_h[axis] = np.fft.ifftn(
                1j * grad * delta_k_h * inv_kd2).real.astype(np.float32)
        disp = psi_h[:, ::2, ::2, ::2]
        q = np.arange(npd, dtype=np.float32) * 2.0 + 0.5
        xh = np.stack(
            [(q[:, None, None] + disp[0]).reshape(-1),
             (q[None, :, None] + disp[1]).reshape(-1),
             (q[None, None, :] + disp[2]).reshape(-1)])
        xh = np.mod(xh, np.float32(nf))
        # CIC gather of psi at the displaced positions (velocities)
        t = xh - 0.5
        c0 = np.floor(t).astype(np.int64)
        frac = (t - c0).astype(np.float32)
        vh = np.zeros((3, xh.shape[1]), np.float32)
        for dx in (0, 1):
            wx = frac[0] if dx else 1.0 - frac[0]
            ix = (c0[0] + dx) % nf
            for dy in (0, 1):
                wy = frac[1] if dy else 1.0 - frac[1]
                iy = (c0[1] + dy) % nf
                for dz in (0, 1):
                    wz = frac[2] if dz else 1.0 - frac[2]
                    iz = (c0[2] + dz) % nf
                    wgt = (wx * wy * wz).astype(np.float32)
                    vh += wgt[None, :] * psi_h[:, ix, iy, iz]
        x_dev = jnp.asarray(xh.T)
        v_dev = jnp.asarray(np.float32(vf) * vh.T)
        # keep the fields on HOST (numpy): this path exists because the
        # device cannot transform nf^3, and shipping GB-scale fields over
        # the ~50 MB/s tunnel only to pull them back would defeat it
        delta_k = delta_k_h.astype(np.complex64) if want_fields else None
        psi = psi_h if want_fields else None
    else:
        out = _make(jax.random.PRNGKey(seed), jnp.asarray(amp),
                    jnp.asarray(inv_kd2))
        if want_fields:
            x_dev, v_dev, delta_k, psi = out
        else:
            x_dev, v_dev = out
            delta_k = psi = None

    if cfg.nodes_dim == 1:
        # pack into the padded state layout on device
        cap = cfg.max_np
        n = npd ** 3
        xp = jnp.zeros((cap, 3), jnp.float32).at[:n].set(x_dev)
        vp = jnp.zeros((cap, 3), jnp.float32).at[:n].set(v_dev)
        st = particles_ic(cfg, np.zeros((0, 3), np.float32),
                          np.zeros((0, 3), np.float32), seed=seed)
        st = dataclasses.replace(
            st, x=xp, v=vp,
            pid=jnp.arange(1, cap + 1, dtype=jnp.int32),
            np_local=jnp.asarray([n], jnp.int32))
    else:
        st = distribute_global(cfg, np.asarray(x_dev), np.asarray(v_dev),
                               seed=seed)
    def _delta_real():
        if host_fft:
            # delta_k is a host numpy array here; transform on host
            return jnp.asarray(np.fft.ifftn(delta_k).real.astype(
                np.float32))
        return _ifftn(delta_k).real.astype(jnp.float32)

    if cfg.mhd and cfg.gas_from_delta:
        if cfg.gas_ic == "particles":
            # reference-faithful construction: CIC-deposit the displaced
            # particles (mhd_init.f90 GetU); periodic pad fold on the
            # single global grid
            from ..core.step import fold_pads
            u_pad = gas_ic_from_particles(cfg, jnp.asarray(x_dev).T,
                                          jnp.asarray(v_dev).T)
            u = jnp.stack([fold_pads(u_pad[i], 1) for i in range(5)])
            st = dataclasses.replace(st, gas_u=gas_ic_finalize(cfg, u))
        else:
            st = dataclasses.replace(st, gas_u=gas_ic_from_delta(
                cfg, _delta_real(), jnp.asarray(psi), vf))
    if return_delta:
        return st, np.asarray(_delta_real())
    return st


def zeldovich_ic_distributed(cfg: SimConfig, mesh, seed: int = 0,
                             transfer_file: Optional[str] = None,
                             noise_block: int = 16,
                             return_delta: bool = False):
    """Fully distributed Zel'dovich ICs: no device ever holds a global
    field (the reference dist_init is likewise distributed, with per-slab
    noise seeds, dist_init.f90:628-749).

    * White noise is generated per `noise_block`^3 block with a key folded
      on the GLOBAL block index, so the realization is identical for any
      device count whose nf_physical_node_dim is divisible by noise_block.
    * All spectral factors (amplitude, discrete Poisson kernel, gradient)
      are evaluated per-device on its own k-space block; transforms go
      through the all_to_all pencil FFT (parallel/pfft.pfft3d).
    * Particles are displaced locally and routed to their owning device
      with the standard ownership exchange.
    * `cfg.ic_correct_kernel` applies the Ewald near-field correction as a
      LOCAL convolution with the compact `ewald_patch` kernel (support
      r <= 8 cells) + spectral central difference — equal to the
      replicated path's corrected global kernel, without any device
      holding a global field (dist_init.f90:1367-1466 role).
    """
    import dataclasses as _dc
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import AXES
    from ..parallel import halo as halo_mod
    from ..parallel import exchange as exchange_mod
    from ..parallel import pfft as pfft_mod
    from ..ops.deposit import cic_gather

    c = cfg.cosmo
    nf = cfg.nf_physical_dim
    nfn = cfg.nf_physical_node_dim
    nd = cfg.nodes_dim
    if nfn % noise_block != 0:
        raise ValueError(f"noise_block={noise_block} must divide "
                         f"nf_physical_node_dim={nfn}")
    a_i = cfg.a_i
    lin = transfer_mod.linear_power(c, a_i, transfer_file=transfer_file)
    k_fac = 2 * math.pi / cfg.box
    vf = vfactor(a_i, c)

    # 1-D log-spaced amplitude table: kr -> sqrt(P_grid(kr) * nf^3)
    # (the global-path formula, evaluated by interpolation on device)
    kr_tab = np.geomspace(0.5, nf * math.sqrt(3.0) / 2.0, 8192)
    amp_tab = np.sqrt(lin.delta2(kr_tab * k_fac)
                      / (4 * math.pi * kr_tab ** 3) * float(nf) ** 3)
    log_kr = jnp.asarray(np.log(kr_tab), jnp.float32)
    log_amp = jnp.asarray(np.log(np.maximum(amp_tab, 1e-30)), jnp.float32)

    nb = noise_block
    nblk = nfn // nb          # owned noise blocks per axis
    NB = nf // nb             # global noise blocks per axis
    npd_loc = nfn // 2        # particles per axis per device
    cap = cfg.max_np
    # face buffers sized by PHYSICS like the sweep's (core/step.py
    # face_buffer_size): Zel'dovich displacements at z_i are O(cells),
    # far under the sweep's 4*mesh_scale shake reach, so the same bound
    # holds; overflow is surfaced below (the reference aborts,
    # particle_pass.f90:96-99)
    from ..core.step import face_buffer_size
    max_buf = face_buffer_size(cfg)
    mhd_gas = cfg.mhd and cfg.gas_from_delta
    g_patch = (jnp.asarray(ewald_patch(nf)) if cfg.ic_correct_kernel
               else None)

    def _local_k(coord):
        """Global integer wavenumbers of this device's k block along one
        axis (fftfreq convention)."""
        gi = coord * nfn + jnp.arange(nfn)
        return jnp.where(gi <= nf // 2, gi, gi - nf).astype(jnp.float32)

    def local_make(key):
        cx, cy, cz = halo_mod.device_coords()
        # --- block-keyed white noise (global-index folded) -------------
        bx = cx * nblk + jnp.arange(nblk)
        by = cy * nblk + jnp.arange(nblk)
        bz = cz * nblk + jnp.arange(nblk)
        gb = ((bx[:, None, None] * NB + by[None, :, None]) * NB
              + bz[None, None, :]).reshape(-1)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(gb)
        blocks = jax.vmap(
            lambda k: jax.random.normal(k, (nb, nb, nb), jnp.float32))(keys)
        noise = blocks.reshape(nblk, nblk, nblk, nb, nb, nb).transpose(
            0, 3, 1, 4, 2, 5).reshape(nfn, nfn, nfn)

        # --- spectral factors on this device's k block ------------------
        kx = _local_k(cx)
        ky = _local_k(cy)
        kz = _local_k(cz)
        kr = jnp.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                      + kz[None, None, :] ** 2)
        amp = jnp.where(kr > 0, jnp.exp(jnp.interp(
            jnp.log(jnp.maximum(kr, 1e-10)), log_kr, log_amp)), 0.0)
        kd2 = lambda k: (2.0 * jnp.sin(math.pi * k / nf)) ** 2
        kd2_tot = (kd2(kx)[:, None, None] + kd2(ky)[None, :, None]
                   + kd2(kz)[None, None, :])
        inv_kd2 = jnp.where(kd2_tot > 0,
                            1.0 / jnp.maximum(kd2_tot, 1e-20), 0.0)
        sin_g = lambda k: jnp.sin(2.0 * math.pi * k / nf)

        delta_k = pfft_mod.pfft3d(noise) * amp
        psi = []
        grads = (sin_g(kx)[:, None, None], sin_g(ky)[None, :, None],
                 sin_g(kz)[None, None, :])
        for axis in range(3):
            psi_k = 1j * grads[axis] * delta_k * inv_kd2
            psi.append(pfft_mod.pfft3d(psi_k, inverse=True).real
                       .astype(jnp.float32))
        psi = jnp.stack(psi)

        delta = None
        if (cfg.ic_correct_kernel or return_delta
                or (mhd_gas and cfg.gas_ic == "delta")):
            delta = pfft_mod.pfft3d(delta_k, inverse=True).real.astype(
                jnp.float32)
        if cfg.ic_correct_kernel:
            # Ewald near-field correction as a LOCAL convolution with the
            # compact patch + spectral central difference (i sin(2 pi k/N)
            # == centered difference), equal to the replicated corrected
            # kernel (pinned by tests/test_ic_power.py)
            R = EWALD_REACH
            dpad = halo_mod.halo_pad(delta, R + 1)
            phi_c = jax.lax.conv_general_dilated(
                dpad[None, None], g_patch[None, None],
                (1, 1, 1), "VALID")[0, 0]             # (nfn+2)^3
            dpsi = []
            for axis in range(3):
                lo = jax.lax.slice_in_dim(phi_c, 0, nfn, axis=axis)
                hi = jax.lax.slice_in_dim(phi_c, 2, nfn + 2, axis=axis)
                sl = [slice(1, nfn + 1)] * 3
                sl[axis] = slice(None)
                dpsi.append((0.5 * (hi - lo))[tuple(sl)])
            psi = psi + jnp.stack(dpsi)

        # --- particles on the local every-2nd-cell lattice ---------------
        disp = psi[:, ::2, ::2, ::2]
        q = jnp.arange(npd_loc, dtype=jnp.float32) * 2.0 + 0.5
        x = jnp.stack(
            [q[:, None, None] + disp[0],
             q[None, :, None] + disp[1],
             q[None, None, :] + disp[2]], axis=-1).reshape(-1, 3)
        psi_pad = halo_mod.halo_pad(psi, 1)
        v = vf * cic_gather(psi_pad, x, scale=1.0, offset=-0.5, pad=1)
        # global PID from the lattice site
        npd_glob = nf // 2
        gi = cx * npd_loc + jnp.arange(npd_loc)
        gj = cy * npd_loc + jnp.arange(npd_loc)
        gk = cz * npd_loc + jnp.arange(npd_loc)
        pid = (1 + ((gi[:, None, None] * npd_glob + gj[None, :, None])
                    * npd_glob + gk[None, None, :])).reshape(-1)

        n = npd_loc ** 3
        xp = jnp.zeros((cap, 3), jnp.float32).at[:n].set(x)
        vp = jnp.zeros((cap, 3), jnp.float32).at[:n].set(v)
        pp = jnp.zeros((cap,), jnp.int32).at[:n].set(pid.astype(jnp.int32))
        valid = jnp.arange(cap) < n
        ex = exchange_mod.exchange_particles(xp, vp, pp, valid, nfn,
                                             max_buf)
        np_local = jnp.sum(ex.valid.astype(jnp.int32))[None]
        # overflow is COUNTED and surfaced — silently dropped particles
        # at IC time would corrupt a run undetectably (the reference
        # aborts, particle_pass.f90:96-99)
        overflow = jax.lax.psum(ex.overflow, AXES)
        outs = (ex.x, ex.v, ex.pid, np_local, overflow)
        if mhd_gas:
            if cfg.gas_ic == "particles":
                # deposit from the post-exchange resident particles;
                # pad mass folds to the owning neighbor (GetU +
                # mhd_init's pass_particles roles combined)
                u_pad = gas_ic_from_particles(cfg, ex.x.T, ex.v.T,
                                              valid=ex.valid)
                outs = outs + (gas_ic_finalize(
                    cfg, halo_mod.halo_fold(u_pad, 1)),)
            else:
                outs = outs + (gas_ic_from_delta(cfg, delta, psi, vf),)
        if return_delta:
            outs = outs + (delta,)
        return outs

    pa = P(AXES)
    out_specs = [pa, pa, pa, pa, P()]
    if mhd_gas:
        out_specs.append(P(None, *AXES))
    if return_delta:
        out_specs.append(P(*AXES))
    made = jax.jit(shard_map(local_make, mesh=mesh, in_specs=(P(),),
                             out_specs=tuple(out_specs), check_vma=False))
    outs = made(jax.random.PRNGKey(seed))
    x, v, pid, np_local, overflow = outs[:5]
    if int(overflow) > 0:
        raise RuntimeError(
            f"zeldovich_ic_distributed: {int(overflow)} particles dropped "
            "in the IC ownership exchange (displacements exceeded the "
            "face-buffer bound); the run would be silently corrupted")

    skel = particles_ic(cfg, np.zeros((0, 3), np.float32),
                        np.zeros((0, 3), np.float32), seed=seed)
    st = _dc.replace(skel, x=x, v=v, pid=pid,
                     np_local=np_local.astype(jnp.int32))
    i = 5
    if mhd_gas:
        st = _dc.replace(st, gas_u=outs[i])
        i += 1
    if return_delta:
        return st, np.asarray(outs[i])
    return st


def gas_ic_from_delta(cfg: SimConfig, delta, psi, vf):
    """Gas conserved fields tracing the matter field (Eulerian
    approximation of mhd_init): rho_gas = 1 + delta (clipped), momentum =
    rho * vfactor * psi, thermal energy from cfg.gas_p_init (cold
    start).  The reference-faithful construction is
    `gas_ic_from_particles` (cfg.gas_ic = "particles")."""
    rho = jnp.maximum(1.0 + delta, 0.05)
    mom = rho[None] * (vf * psi)
    eth = cfg.gas_p_init / (cfg.gas_gamma - 1.0)
    e = eth + 0.5 * jnp.sum(mom * mom, axis=0) / rho
    return jnp.concatenate([rho[None], mom, e[None]]).astype(jnp.float32)


def cmb_thermal_specific(cfg: SimConfig) -> float:
    """Specific (per unit sim mass) thermal energy of CMB-coupled gas at
    z_i, in simulation units (mhd_init.f90:793-807, flag CMB_coupling).

    The reference's formula computes the per-particle thermal energy
    E_thermal = Econst * Nprime * k_B * T_CMB * (1+z_i) * Ephys2sim and
    only applies it for z_i > 150 (above Compton-decoupling, where gas
    still tracks T_CMB; below, the cold start + first shocks dominate).
    Deviation (documented): the reference adds E_thermal UNWEIGHTED to
    all 8 CIC corners of every particle (GetU :873-880), an ~8x
    overcount of the intended per-particle budget; we deposit it with
    the same CIC mass weights (u5 gains rho * e_specific), which is the
    physically-normalized version of the same floor.
    """
    if not (cfg.gas_cmb_coupling and cfg.z_i > 150.0):
        return 0.0
    c = cfg.cosmo
    ncr = cfg.nf_physical_dim           # gas grid == fine mesh
    box = cfg.box                       # Mpc/h
    a_i = cfg.a_i
    mu, mproton, k_B, T_CMB = 1.22, 1.6726e-27, 1.38065e-23, 2.725
    econst = (4.0 / 9.0) * 1e-10
    nprime = c.omega_b * box ** 3 / mu / mproton / ncr ** 3
    ephys2sim = a_i ** 2 * ncr ** 5 / c.omega_m ** 2 / box ** 5
    e_particle = econst * nprime * k_B * T_CMB * (1.0 + cfg.z_i) * ephys2sim
    return float(e_particle / cfg.mass_p)


def gas_ic_from_particles(cfg: SimConfig, xT, vT, valid=None):
    """Gas conserved fields CIC-deposited from the DISPLACED Zel'dovich
    particles — the reference's production gas IC (mhd_init.f90 GetU,
    :774-885): u1 = CIC(mass), u2:4 = CIC(mass*v), u5 = CIC(mass*v^2/2)
    + thermal floor.  Mean density normalizes to 1 exactly (mass_p *
    np_total = nf^3); the baryon fraction is applied at the coupling
    points, not here, exactly like the reference (mp carries no omega_b
    factor, GetU:776).

    `xT`, `vT`: SoA (3, N) positions/velocities on the LOCAL gas grid
    (single-device: the global grid).  Local-grid deposit with a 1-layer
    pad; the caller folds pads across devices (single-device: periodic
    fold).  CIC nodes sit at INTEGER coordinates (offset 0.0), exactly
    the reference's convention (GetU: i1=floor(x)+1, dx1=i1-x) — this
    matters: lattice particles live at half-integer cell centers, so
    integer nodes spread each particle evenly over its 2^3 cell block
    and the undisplaced lattice deposits EXACTLY uniform density 1,
    while half-integer nodes would degenerate to NGP (frac = 0) and
    leave 7/8 of the gas cells at rho = 0, which the TVD solver cannot
    evolve (1/rho)."""
    from ..ops.deposit import cic_deposit_t
    nf = cfg.nf_physical_node_dim
    shape = (nf + 2, nf + 2, nf + 2)
    mass = jnp.float32(cfg.mass_p)
    if valid is None:
        w = jnp.full((xT.shape[1],), mass, jnp.float32)
    else:
        w = jnp.where(valid, mass, 0.0)
    e_spec = cmb_thermal_specific(cfg)

    def dep(weights):
        return cic_deposit_t(xT, weights, shape, scale=1.0, offset=0.0,
                             pad=1)

    rho = dep(w)
    mom = jnp.stack([dep(w * vT[0]), dep(w * vT[1]), dep(w * vT[2])])
    ekin = dep(w * 0.5 * jnp.sum(vT * vT, axis=0))
    # every term here is a deposit (fold-linear); the CONSTANT
    # gas_p_init floor is added by `gas_ic_finalize` AFTER the pads are
    # folded (a constant on pad cells would double-count at faces)
    e = ekin + jnp.float32(e_spec) * rho
    return jnp.concatenate([rho[None], mom, e[None]]).astype(jnp.float32)


def gas_ic_finalize(cfg: SimConfig, u_folded):
    """Post-fold finalization for the particle-deposited gas ICs: the
    cold pressure floor, plus a tiny density floor (1e-3 of mean) for
    cells left empty by large z_i displacements — the TVD solver divides
    by rho (the reference's Emin floor guards energy only,
    mpi_tvd_mhd.f90:591).  All deposit terms fold linearly; only these
    constants must come after the fold."""
    u_folded = u_folded.at[0].set(jnp.maximum(u_folded[0], 1e-3))
    return u_folded.at[4].add(
        jnp.float32(cfg.gas_p_init / (cfg.gas_gamma - 1.0)))
