"""FFT force solves (fine and coarse levels).

TPU-native replacement for the reference's per-tile FFTW convolution
(`source_threads/particle_mesh_threaded.f90:176-204`, `fft_fine.f90`) and the
slab-decomposed coarse FFT (`fft_coarse.f90`, `coarse_force.f90`).

Key design departure: instead of `tiles_node**3` overlapping tile FFTs per
device (the reference's OpenMP strategy — each tile redundantly recomputes a
2*nf_buf-deep halo), we run ONE FFT over the device's halo-padded fine grid.
Because the fine kernel's support (sphere radius < nf_cutoff) is smaller than
the halo depth nf_buf, circular-wrap artifacts land entirely inside the
cropped-away halo, so the result over the physical region is the exact linear
convolution — identical math, ~(nf_tile/nf_physical_tile)^3 x less FFT work,
and one big FFT maps onto the TPU far better than many small ones.

FFT strategy: the axon TPU backend implements complex-to-complex FFTs only
(no r2c/c2r), so we use complex transforms and pack PAIRS of force
components into one inverse FFT: for real spectra products A, B of real
fields a, b, `ifftn(A + iB) = a + ib` exactly, so one c2c inverse yields two
real force components.  Total: 1 forward + 2 inverse c2c ≈ the reference's
1 r2c + 3 c2r per solve.

Force kernels are odd => purely imaginary transforms; kern_im holds Im parts
(the reference keeps Im in `kern_f`/`kern_c` and swaps/negates real and
imaginary words explicitly, `particle_mesh_threaded.f90:188-194`,
`coarse_force.f90:36-42`).  `ifftn` applies the single 1/N^3 normalization,
matching `fft_fine.f90` / `fft_coarse.f90:187`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import dftmm


def _fft_fns(use_mm: bool):
    """(fftn, ifftn) — XLA's FFT or the MXU matmul DFT (ops/dftmm.py)."""
    if use_mm:
        return dftmm.fftn_mm, dftmm.ifftn_mm
    return jnp.fft.fftn, jnp.fft.ifftn


def force_from_density(rho: jnp.ndarray, kern_im: jnp.ndarray,
                       use_mm: bool = False) -> jnp.ndarray:
    """Convolve density with a 3-component odd force kernel.

    rho: (n, n, n) float32.  kern_im: (3, n, n, n) float32 imaginary parts
    of the kernel DFT (full spectrum).  Returns (3, n, n, n) float32 force.
    """
    fftn, ifftn = _fft_fns(use_mm)
    # pass the REAL density through: jnp.fft casts internally, and
    # fftn_mm's real-input path does 2 matmuls instead of 4 on the
    # first transformed axis
    rho_k = fftn(rho)
    # spectra of the three (real) force components
    fx_k = (1j * kern_im[0]) * rho_k
    fy_k = (1j * kern_im[1]) * rho_k
    fz_k = (1j * kern_im[2]) * rho_k
    # pack x and y into one inverse transform: ifftn(Fx + i*Fy) = fx + i*fy
    fxy = ifftn(fx_k + 1j * fy_k)
    fz = ifftn(fz_k)
    return jnp.stack([fxy.real, fxy.imag, fz.real]).astype(jnp.float32)


def fine_force(rho_halo: jnp.ndarray, kern_f_im: jnp.ndarray,
               nf_buf: int, nf_node: int,
               use_mm: bool = False) -> jnp.ndarray:
    """Fine-level force on the physical node region.

    rho_halo: (nf_node + 2*nf_buf,)^3 density including neighbor halos.
    Returns (3, nf_node, nf_node, nf_node) force over the physical region.
    """
    f = force_from_density(rho_halo, kern_f_im, use_mm=use_mm)
    return f[:, nf_buf:nf_buf + nf_node,
             nf_buf:nf_buf + nf_node,
             nf_buf:nf_buf + nf_node]


def fine_force_potential(rho_halo: jnp.ndarray, pot_kern: jnp.ndarray,
                         nf_buf: int, nf_node: int,
                         use_mm: bool = False) -> jnp.ndarray:
    """Fine force via the potential formulation: ONE scalar solve + central
    differences (the reference's `wg1.ascii` potential-kernel mode,
    kernels/README; `dist_init.f90:1507-1509` differencing convention).

    2 complex FFTs instead of 3, and a scalar kernel instead of three
    components (1/3 the kernel memory).  pot_kern: (n, n, n) float32 REAL
    spectrum from `kernels.potential_kernel_fourier`.
    """
    fftn, ifftn = _fft_fns(use_mm)
    rho_k = fftn(rho_halo)          # real input: see force_from_density
    phi = ifftn(rho_k * pot_kern).real.astype(jnp.float32)
    lo = nf_buf
    hi = nf_buf + nf_node

    def diff(axis):
        # F = (phi(i-1) - phi(i+1)) / 2 on the physical region
        down = jax.lax.slice_in_dim(phi, lo - 1, hi - 1, axis=axis)
        up = jax.lax.slice_in_dim(phi, lo + 1, hi + 1, axis=axis)
        other = [a for a in range(3) if a != axis]
        sl = [slice(None)] * 3
        for a in other:
            sl[a] = slice(lo, hi)
        return (0.5 * (down - up))[tuple(sl)]

    return jnp.stack([diff(0), diff(1), diff(2)])


def coarse_force(rho_c: jnp.ndarray, kern_c_im: jnp.ndarray,
                 use_mm: bool = False) -> jnp.ndarray:
    """Coarse-level force on the (global, periodic) coarse mesh.

    rho_c: (nc, nc, nc) global coarse density.  Returns (3, nc, nc, nc).
    Multi-device: callers shard rho_c and run this under shard_map /
    with sharded FFT (see parallel/pfft.py).
    """
    return force_from_density(rho_c, kern_c_im, use_mm=use_mm)


def fine_force_tiled(rho_halo: jnp.ndarray, kern_f_im: jnp.ndarray,
                     nf_buf: int, nf_node: int, tiles: int,
                     use_mm: bool = False) -> jnp.ndarray:
    """Fine force via tiles^3 overlapping tile FFTs — the reference's
    per-tile strategy (`particle_mesh_threaded.f90:72-628`), used when the
    single padded-node transform exceeds the backend's FFT limits (the
    axon TPU backend compiles a 288^3 c2c fine solve but reports
    UNIMPLEMENTED at 576^3).  Same linear-convolution-by-cropping argument
    as `fine_force`, applied per tile: each tile carries the full nf_buf
    halo, so its cropped physical region is exact.

    kern_f_im: (3, tpad, tpad, tpad) spectrum at the TILE size
    (tpad = nf_node//tiles + 2*nf_buf).
    """
    tp = nf_node // tiles
    tpad = tp + 2 * nf_buf
    assert kern_f_im.shape[-1] == tpad, (kern_f_im.shape, tpad)
    fftn, ifftn = _fft_fns(use_mm)
    coords = [(ix, iy, iz) for ix in range(tiles) for iy in range(tiles)
              for iz in range(tiles)]
    t3 = len(coords)
    npair = t3 // 2
    sl = slice(nf_buf, nf_buf + tp)

    def tile(c):
        return jax.lax.slice(
            rho_halo, (c[0] * tp, c[1] * tp, c[2] * tp),
            (c[0] * tp + tpad, c[1] * tp + tpad, c[2] * tp + tpad))

    # two-for-one packing over tile PAIRS: Z = fft(a + i*b) and, for each
    # real odd kernel component, ifft(i*K*Z) = (K*a) + i*(K*b) by
    # linearity — so one forward and THREE inverses serve TWO tiles
    # (2 c2c per tile instead of 3; at 8 tiles: 24 -> 16 transforms).
    # Pairs are processed SEQUENTIALLY via lax.scan over dynamic tile
    # offsets — ONE compiled fft+ifft instance dispatched npair times
    # (the staged path's per-tile strategy): batching all tiles' spectra
    # at once keeps two (3*T^3/2, tpad^3) complex64 arrays live (~4.6 GB
    # at 256^3, the fused program's peak-memory region), and unrolling
    # the pair loop compiles 2*npair separate FFT instances.
    f0 = jnp.zeros((3, nf_node, nf_node, nf_node), jnp.float32)
    offs = jnp.asarray(
        [[[c[0] * tp, c[1] * tp, c[2] * tp] for c in pair]
         for pair in zip(coords[0:2 * npair:2], coords[1:2 * npair:2])],
        jnp.int32)                                   # (npair, 2, 3)

    def pair_body(f, off):
        oa, ob = off[0], off[1]
        a = jax.lax.dynamic_slice(rho_halo, (oa[0], oa[1], oa[2]),
                                  (tpad, tpad, tpad))
        b = jax.lax.dynamic_slice(rho_halo, (ob[0], ob[1], ob[2]),
                                  (tpad, tpad, tpad))
        z = fftn(a + 1j * b)
        w = ifftn(
            jnp.stack([(1j * kern_f_im[c]) * z for c in range(3)]),
            axes=(1, 2, 3))[:, sl, sl, sl]
        f = jax.lax.dynamic_update_slice(
            f, w.real.astype(jnp.float32), (0, oa[0], oa[1], oa[2]))
        f = jax.lax.dynamic_update_slice(
            f, w.imag.astype(jnp.float32), (0, ob[0], ob[1], ob[2]))
        return f, None

    if npair:
        f, _ = jax.lax.scan(pair_body, f0, offs)
    else:
        f = f0  # single tile: offs would be shape-(0,); only the odd tail runs
    if t3 % 2:
        # odd tile count: last tile classically (1 fwd + 2 packed inv)
        cl = coords[-1]
        rho_k = fftn(tile(cl))
        fxy = ifftn((1j * kern_f_im[0]) * rho_k
                    + 1j * ((1j * kern_f_im[1]) * rho_k))
        fz = ifftn((1j * kern_f_im[2]) * rho_k)
        f_last = jnp.stack([fxy.real, fxy.imag, fz.real]
                           ).astype(jnp.float32)[:, sl, sl, sl]
        f = jax.lax.dynamic_update_slice(
            f, f_last, (0, cl[0] * tp, cl[1] * tp, cl[2] * tp))
    return f


def fine_force_potential_tiled(rho_halo: jnp.ndarray, pot_kern: jnp.ndarray,
                               nf_buf: int, nf_node: int,
                               tiles: int, use_mm: bool = False
                               ) -> jnp.ndarray:
    """Tiled variant of `fine_force_potential` (2 FFTs per tile + central
    differences inside the tile halo)."""
    tp = nf_node // tiles
    tpad = tp + 2 * nf_buf
    assert pot_kern.shape[-1] == tpad, (pot_kern.shape, tpad)
    fftn, ifftn = _fft_fns(use_mm)
    coords = [(ix, iy, iz) for ix in range(tiles) for iy in range(tiles)
              for iz in range(tiles)]
    t3 = len(coords)
    npair = t3 // 2
    lo, hi = nf_buf, nf_buf + tp

    def tile(c):
        return jax.lax.slice(
            rho_halo, (c[0] * tp, c[1] * tp, c[2] * tp),
            (c[0] * tp + tpad, c[1] * tp + tpad, c[2] * tp + tpad))

    def diff(phi, axis):
        down = jax.lax.slice_in_dim(phi, lo - 1, hi - 1, axis=axis)
        up = jax.lax.slice_in_dim(phi, lo + 1, hi + 1, axis=axis)
        other = [a for a in range(3) if a != axis]
        sl = [slice(None)] * 3
        for a in other:
            sl[a] = slice(lo, hi)
        return (0.5 * (down - up))[tuple(sl)]

    def grad(phi):
        return jnp.stack([diff(phi, 0), diff(phi, 1), diff(phi, 2)])

    # two-for-one pairing: ifft(P * fft(a + i*b)) = phi_a + i*phi_b for
    # the real even potential kernel — HALF the transforms per solve.
    # Pairs run sequentially via lax.scan over dynamic tile offsets (one
    # compiled fft+ifft instance; see fine_force_tiled for the memory and
    # compile-time argument).
    f0 = jnp.zeros((3, nf_node, nf_node, nf_node), jnp.float32)
    offs = jnp.asarray(
        [[[c[0] * tp, c[1] * tp, c[2] * tp] for c in pair]
         for pair in zip(coords[0:2 * npair:2], coords[1:2 * npair:2])],
        jnp.int32)                                   # (npair, 2, 3)

    def pair_body(f, off):
        oa, ob = off[0], off[1]
        a = jax.lax.dynamic_slice(rho_halo, (oa[0], oa[1], oa[2]),
                                  (tpad, tpad, tpad))
        b = jax.lax.dynamic_slice(rho_halo, (ob[0], ob[1], ob[2]),
                                  (tpad, tpad, tpad))
        z = ifftn(pot_kern * fftn(a + 1j * b))
        f = jax.lax.dynamic_update_slice(
            f, grad(z.real.astype(jnp.float32)), (0, oa[0], oa[1], oa[2]))
        f = jax.lax.dynamic_update_slice(
            f, grad(z.imag.astype(jnp.float32)), (0, ob[0], ob[1], ob[2]))
        return f, None

    if npair:
        f, _ = jax.lax.scan(pair_body, f0, offs)
    else:
        f = f0  # single tile: offs would be shape-(0,); only the odd tail runs
    if t3 % 2:
        cl = coords[-1]
        zl = ifftn(pot_kern * fftn(tile(cl)))
        f = jax.lax.dynamic_update_slice(
            f, grad(zl.real.astype(jnp.float32)),
            (0, cl[0] * tp, cl[1] * tp, cl[2] * tp))
    return f
