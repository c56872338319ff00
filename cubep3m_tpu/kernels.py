"""Two-level force kernel construction.

The reference reads precomputed least-squares-fitted kernel tables
(`source_threads/kernel_initialization.f90`, data in `kernels/wfxyzf.3.ascii`
and `kernels/wfxyzc.2.ascii`).  We do NOT copy those tables: both kernels are
regenerated from first principles —

* **fine kernel** (`fine_kernel_*`): exact inverse-square force
  `k(d) = -d/|d|^3` tabulated on the cube `|d_i| <= nf_cutoff-1`, zero at the
  origin and outside the cube (kernel_initialization.f90:2-99 behavior); under
  pp_ext the inner `(pp_range+1)^3` cube is zeroed (`:40-54`) since PP covers it.

* **coarse kernel** (`coarse_kernel_fourier`): `-x/r^3` at coarse-grid
  separations (in fine-cell units, x = mesh_scale * coarse offset) with the
  inner 4^3-per-octant region replaced by a matching table
  (kernel_initialization.f90:300-457).  The reference's table was fitted
  offline; ours is fitted at init time by `fit_coarse_matching_table`: a
  linear least-squares force-match of the full two-level pipeline
  (NGP fine deposit/gather + CIC coarse deposit/gather) against the exact
  1/r^2 force over random particle pairs.  Deterministic, cached on disk.

* **LRCKCORR** long-range correction (kernel_initialization.f90:465-689):
  for coarse modes with `|k| <= 8`, rescale the kernel to the exact spectral
  force kernel `4*pi*k_a/k_d^2 / mesh_scale^2` with `k_a = 2 sin(pi k/n)`.

Fourier convention: force kernels are odd in real space, so their DFT is
purely imaginary; we store the imaginary part as float32 and convolve with
`rho_k * (1j * kern_im)` followed by a normalized inverse FFT — matching the
reference's single 1/N^3 normalization (fft_fine.f90, fft_coarse.f90:187).
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np

from .config import SimConfig

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_kernel_cache")
_MATCH_VERSION = 2


def wrapped_coords(n: int) -> np.ndarray:
    """Signed periodic offsets for an n-point FFT grid: 0,1,..,n/2,-(n/2-1),..,-1."""
    c = np.arange(n)
    return np.where(c <= n // 2, c, c - n).astype(np.float64)


def split_taper(r: np.ndarray, nf_cutoff: int) -> np.ndarray:
    """Short-range force fraction of the two-level split.

    The S2 force-matching polynomial `1 - 7/4 s^3 + 3/4 s^5`, s = r/nf_cutoff
    — the same taper PP_EXT applies to pair forces
    (`particle_mesh_threaded.f90:558-565`); the reference's fitted fine-kernel
    table (`kernels/wfxyzf.3.ascii`) is the exact force times this taper,
    zero outside the sphere r >= nf_cutoff (verified numerically against the
    table's radial profile).  The coarse kernel carries the complement, so
    the split is smooth at the hand-off instead of a sharp cube cutoff.
    """
    s = np.minimum(r / nf_cutoff, 1.0)
    return 1.0 - 1.75 * s ** 3 + 0.75 * s ** 5


def fine_kernel_real(n: int, nf_cutoff: int, pp_ext: bool = False,
                     pp_range: int = 2) -> np.ndarray:
    """(3, n, n, n) real-space fine force kernel on a periodic n^3 grid.

    Exact inverse-square force times the short-range split taper, supported
    on the sphere r < nf_cutoff.
    """
    dt = np.float64 if n <= 256 else np.float32
    d = wrapped_coords(n).astype(dt)
    dx = d[:, None, None]
    dy = d[None, :, None]
    dz = d[None, None, :]
    r2 = dx * dx + dy * dy + dz * dz
    r = np.sqrt(r2)
    r3 = np.where(r2 > 0, r2, 1.0) ** 1.5
    inside = (r2 > 0) & (r < nf_cutoff)
    if pp_ext:
        # PP covers the inner (pp_range+1)^3 cube; zero the mesh kernel there.
        inner = ((np.abs(dx) <= pp_range) & (np.abs(dy) <= pp_range)
                 & (np.abs(dz) <= pp_range))
        inside &= ~inner
    k = np.where(inside, -split_taper(r, nf_cutoff) / r3, 0.0)
    del r2, r, r3, inside
    return np.stack([(k * dx).astype(np.float32),
                     (k * dy).astype(np.float32),
                     (k * dz).astype(np.float32)])


def fine_kernel_fourier(n: int, nf_cutoff: int, pp_ext: bool = False,
                        pp_range: int = 2, device: bool = False):
    """(3, n, n, n) float32 imaginary parts of the fine kernel DFT.

    Full spectrum (not the r2c half): the TPU backend lacks r2c transforms,
    so the convolution path uses complex FFTs (ops/fftconv.py).

    device=True builds and transforms entirely on the default JAX device
    (fast path for production grids; host numpy FFTs of a 576^3 kernel take
    minutes) and returns a jnp array.
    """
    if device:
        return _fine_kernel_fourier_device(n, nf_cutoff, pp_ext, pp_range)
    # float64 for small grids; float32 beyond (a 576^3 complex128 FFT would
    # need ~3 GB per component on host)
    dt = np.float64 if n <= 256 else np.float32
    kr = fine_kernel_real(n, nf_cutoff, pp_ext, pp_range)
    return np.stack([np.fft.fftn(kr[c].astype(dt)).imag.astype(np.float32)
                     for c in range(3)])


def _fine_kernel_fourier_device(n: int, nf_cutoff: int, pp_ext: bool,
                                pp_range: int):
    """On-device fine kernel build: same math as the numpy path."""
    import jax
    import jax.numpy as jnp

    d_host = wrapped_coords(n).astype(np.float32)

    @jax.jit
    def build():
        d = jnp.asarray(d_host)
        dx = d[:, None, None]
        dy = d[None, :, None]
        dz = d[None, None, :]
        r2 = dx * dx + dy * dy + dz * dz
        r = jnp.sqrt(r2)
        r3 = jnp.where(r2 > 0, r2, 1.0) ** 1.5
        inside = (r2 > 0) & (r < nf_cutoff)
        if pp_ext:
            inner = ((jnp.abs(dx) <= pp_range) & (jnp.abs(dy) <= pp_range)
                     & (jnp.abs(dz) <= pp_range))
            inside = inside & ~inner
        s = jnp.minimum(r / nf_cutoff, 1.0)
        taper = 1.0 - 1.75 * s ** 3 + 0.75 * s ** 5
        k = jnp.where(inside, -taper / r3, 0.0)
        comps = []
        for dd in (dx, dy, dz):
            comps.append(jnp.fft.fftn((k * dd).astype(jnp.complex64)).imag)
        return jnp.stack(comps)

    return build()


# ----------------------------------------------------------------------
# Coarse kernel
# ----------------------------------------------------------------------
def _expand_matching_table(table: np.ndarray, nc: int) -> np.ndarray:
    """(3, 4, 4, 4) positive-octant x/y/z table -> (3, nc, nc, nc) patch mask+values.

    Applies the odd/even reflection symmetry the reference encodes octant by
    octant (kernel_initialization.f90:365-457): component c is odd under
    reflection of axis c, even under the others.
    Returns (patch, mask) where mask marks patched cells.
    """
    m = table.shape[1]
    patch = np.zeros((3, nc, nc, nc), dtype=np.float64)
    mask = np.zeros((nc, nc, nc), dtype=bool)
    idx = wrapped_coords(nc).astype(np.int64)
    ax = np.abs(idx)
    sx = np.sign(idx)
    sel = np.where(ax < m)[0]  # grid indices whose |offset| < m
    for i in sel:
        for j in sel:
            for k in sel:
                a, b, c0 = ax[i], ax[j], ax[k]
                patch[0, i, j, k] = sx[i] * table[0, a, b, c0]
                patch[1, i, j, k] = sx[j] * table[1, a, b, c0]
                patch[2, i, j, k] = sx[k] * table[2, a, b, c0]
                mask[i, j, k] = True
    return patch, mask


def coarse_kernel_real(nc: int, mesh_scale: int,
                       table: Optional[np.ndarray] = None,
                       nf_cutoff: Optional[int] = None) -> np.ndarray:
    """(3, nc, nc, nc) real-space coarse force kernel in fine-cell units.

    Base values: the long-range complement of the two-level split,
    `-x/r^3 * (1 - split_taper(r))` inside the fine cutoff, exact beyond.
    The innermost 4^3-per-octant region is replaced by the fitted matching
    `table` when given (kernel_initialization.f90:340-457 role).
    """
    d = wrapped_coords(nc) * mesh_scale
    dx, dy, dz = np.meshgrid(d, d, d, indexing="ij")
    r2 = dx * dx + dy * dy + dz * dz
    r = np.sqrt(r2)
    r3 = np.where(r2 > 0, r2 ** 1.5, 1.0)
    frac = 1.0
    if nf_cutoff is not None:
        frac = 1.0 - split_taper(r, nf_cutoff)
    k = np.where(r2 > 0, -frac / r3, 0.0)
    kern = np.stack([k * dx, k * dy, k * dz])
    if table is not None:
        patch, mask = _expand_matching_table(table.astype(np.float64), nc)
        kern = np.where(mask[None], patch, kern)
    return kern


def coarse_kernel_fourier(nc: int, mesh_scale: int,
                          table: Optional[np.ndarray] = None,
                          lrckcorr: bool = True,
                          nf_cutoff: Optional[int] = None) -> np.ndarray:
    """(3, nc, nc, nc) float32 imaginary parts of the coarse kernel DFT
    (full spectrum; see fine_kernel_fourier)."""
    kern = coarse_kernel_real(nc, mesh_scale, table, nf_cutoff)
    out = np.stack([np.fft.fftn(kern[c]).imag for c in range(3)])
    if lrckcorr:
        uncorr = coarse_kernel_real(nc, mesh_scale, None)
        unc = np.stack([np.fft.fftn(uncorr[c]).imag for c in range(3)])
        kidx = wrapped_coords(nc)
        kx, ky, kz = np.meshgrid(kidx, kidx, kidx, indexing="ij")
        kr = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
        ka = 2.0 * np.sin(np.pi * kx / nc)
        kb = 2.0 * np.sin(np.pi * ky / nc)
        kc = 2.0 * np.sin(np.pi * kz / nc)
        kd2 = ka ** 2 + kb ** 2 + kc ** 2
        kd2 = np.where(kd2 > 0, kd2, 1.0)
        for c, (kcomp, kacomp) in enumerate([(kx, ka), (ky, kb), (kz, kc)]):
            wc = 4.0 * np.pi * kacomp / kd2 / mesh_scale ** 2
            apply = (kr <= 8.0) & (kcomp != 0) & (np.abs(unc[c]) > 1e-12)
            out[c] = np.where(apply, out[c] * wc / np.where(apply, unc[c], 1.0),
                              out[c])
    return out.astype(np.float32)


# ----------------------------------------------------------------------
# Two-level matching fit
# ----------------------------------------------------------------------
def _cic_cells_weights(p: np.ndarray, mesh_scale: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Coarse CIC cells (S,8,3) and weights (S,8) for fine-unit positions (S,3)."""
    xs = p / mesh_scale - 0.5
    c0 = np.floor(xs)
    f = xs - c0
    cells = []
    wts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cells.append(c0 + [dx, dy, dz])
                wts.append((f[:, 0] if dx else 1 - f[:, 0])
                           * (f[:, 1] if dy else 1 - f[:, 1])
                           * (f[:, 2] if dz else 1 - f[:, 2]))
    return (np.stack(cells, 1).astype(np.int64), np.stack(wts, 1))


def _table_param_index(m: int = 4) -> Tuple[np.ndarray, int]:
    """Map (a,b,c) in [0,m)^3 -> parameter id for x-component values.

    Symmetry: v(a,b,c) = v(a,c,b); v(0,:,:) = 0 (odd component).  Returns
    (index array (m,m,m) with -1 for forced zeros, n_params).
    """
    idx = -np.ones((m, m, m), dtype=np.int64)
    n = 0
    for a in range(1, m):
        for b in range(m):
            for c in range(b, m):
                idx[a, b, c] = n
                idx[a, c, b] = n
                n += 1
    return idx, n


def fit_coarse_matching_table(nf_cutoff: int, mesh_scale: int,
                              pp_ext: bool = False, pp_range: int = 2,
                              n_samples: int = 120_000,
                              seed: int = 20260816,
                              use_cache: bool = True,
                              ngp: bool = True) -> np.ndarray:
    """Least-squares fit of the (3,4,4,4) inner coarse kernel table.

    Minimizes |F_fine(s) + F_coarse(s; theta) - F_exact(s)|^2 over random
    particle pairs, where F_fine is the NGP-mesh response with our fine
    kernel and F_coarse is the CIC-CIC coarse mesh response, linear in the
    unknown inner-kernel values theta.  This reproduces the role of the
    reference's precomputed `wfxyzc.2.ascii` without copying it.
    """
    key = (f"v{_MATCH_VERSION}-{nf_cutoff}-{mesh_scale}-{pp_ext}-"
           f"{pp_range}-{n_samples}-{seed}-{ngp}")
    cache = os.path.join(_CACHE_DIR,
                         hashlib.sha1(key.encode()).hexdigest()[:16] + ".npy")
    if use_cache and os.path.exists(cache):
        return np.load(cache)

    rng = np.random.default_rng(seed)
    m = 4  # table extent in coarse cells per octant
    inner_max = m - 1

    # --- sample pairs ---------------------------------------------------
    # separations spanning the matching shell; bias toward the hand-off
    # region [nf_cutoff/2, nf_cutoff + 2*mesh_scale].
    smag = np.concatenate([
        rng.uniform(1.0, nf_cutoff * 0.5, n_samples // 4),
        rng.uniform(nf_cutoff * 0.5, nf_cutoff + 2 * mesh_scale,
                    n_samples // 2),
        rng.uniform(nf_cutoff + 2 * mesh_scale,
                    (inner_max + 2) * mesh_scale + nf_cutoff,
                    n_samples - n_samples // 4 - n_samples // 2),
    ])
    u = rng.normal(size=(smag.size, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sep = u * smag[:, None]
    p2 = rng.uniform(0.0, 4.0 * mesh_scale, size=(smag.size, 3))
    p1 = p2 + sep

    # Exclude pairs whose force is (partly) provided by the PP level, where
    # the mesh is not meant to supply the full force: same fine cell for
    # plain PP, the zeroed pp_range cube for pp_ext.
    coff = np.abs(np.floor(p1) - np.floor(p2))
    if pp_ext:
        covered = np.all(coff <= pp_range, axis=1)
    else:
        covered = np.all(coff == 0, axis=1)
    keep = ~covered
    smag, sep, p1, p2 = smag[keep], sep[keep], p1[keep], p2[keep]

    # --- exact force on p1 (unit mass) ---------------------------------
    r3 = smag[:, None] ** 3
    f_exact = -sep / r3

    # --- fine mesh force ---------------------------------------------
    n_k = 2 * nf_cutoff + 8
    kf = fine_kernel_real(n_k, nf_cutoff, pp_ext, pp_range).astype(np.float64)
    if ngp:
        # NGP: mesh force = kernel at the cell offset
        c1 = np.floor(p1).astype(np.int64)
        c2 = np.floor(p2).astype(np.int64)
        doff = (c1 - c2) % n_k
        f_fine = kf[:, doff[:, 0], doff[:, 1], doff[:, 2]].T  # (S,3)
    else:
        # CIC build: deconvolved kernel convolved with the CIC-CIC pair
        # response (cell centers at i+0.5: weights about x-0.5)
        kf_im = np.stack([np.fft.fftn(kf[c]).imag for c in range(3)])
        kf = np.stack([np.fft.ifftn(1j * cic_deconvolve(
            kf_im.astype(np.float32))[c]).real for c in range(3)])
        g1, w1 = _cic_cells_weights(p1, 1.0)
        g2, w2 = _cic_cells_weights(p2, 1.0)
        doff = (g1[:, :, None, :] - g2[:, None, :, :]) % n_k  # (S,8,8,3)
        kvals = kf[:, doff[..., 0], doff[..., 1], doff[..., 2]]  # (3,S,8,8)
        f_fine = np.einsum("si,sj,csij->sc", w1, w2, kvals)

    # --- coarse response -------------------------------------------------
    g_cells, g_w = _cic_cells_weights(p1, mesh_scale)   # gather at p1
    d_cells, d_w = _cic_cells_weights(p2, mesh_scale)   # deposit at p2
    # all 64 (E, weight) combos per sample
    E = g_cells[:, :, None, :] - d_cells[:, None, :, :]        # (S,8,8,3)
    W = g_w[:, :, None] * d_w[:, None, :]                       # (S,8,8)
    absE = np.abs(E)
    inner = np.all(absE <= inner_max, axis=-1)                  # (S,8,8)

    # outer contribution: fixed long-range complement values
    Ef = E.astype(np.float64) * mesh_scale
    rE2 = np.sum(Ef ** 2, axis=-1)
    rE = np.sqrt(rE2)
    rE3 = np.where(rE2 > 0, rE2 ** 1.5, 1.0)
    frac = 1.0 - split_taper(rE, nf_cutoff)
    k_out = np.where(((~inner) & (rE2 > 0))[..., None],
                     -(frac / rE3)[..., None] * Ef, 0.0)
    f_outer = np.sum(W[..., None] * k_out, axis=(1, 2))         # (S,3)

    resid = (f_exact - f_fine - f_outer)                        # (S,3)

    # --- assemble LSQ for inner table values -----------------------------
    pidx, n_par = _table_param_index(m)
    S = smag.size
    A = np.zeros((S, 3, n_par))
    aE = absE  # (S,8,8,3)
    sE = np.sign(E)
    flat_inner = inner.reshape(S, 64)
    W64 = W.reshape(S, 64)
    aE64 = aE.reshape(S, 64, 3)
    sE64 = sE.reshape(S, 64, 3)
    # component 0 param id: pidx[|Ex|,|Ey|,|Ez|]; comp 1: pidx[|Ey|,|Ex|,|Ez|]; etc.
    comp_perm = [(0, 1, 2), (1, 0, 2), (2, 0, 1)]
    for comp, (a_ax, b_ax, c_ax) in enumerate(comp_perm):
        pid = np.where(flat_inner,
                       pidx[np.clip(aE64[:, :, a_ax], 0, m - 1),
                            np.clip(aE64[:, :, b_ax], 0, m - 1),
                            np.clip(aE64[:, :, c_ax], 0, m - 1)],
                       -1)
        wgt = np.where((pid >= 0), W64 * sE64[:, :, a_ax], 0.0)
        np.add.at(A[:, comp, :], (np.arange(S)[:, None].repeat(64, 1)[pid >= 0],
                                  pid[pid >= 0]), wgt[pid >= 0])
    # Relative-error objective: weight each sample row by 1/|f_exact| so the
    # fit minimizes fractional force error (what the reference's error curves
    # measure), not absolute error dominated by close pairs.
    fmag = np.maximum(np.linalg.norm(f_exact, axis=1), 1e-12)[:, None]
    A2 = (A / fmag[..., None]).reshape(S * 3, n_par)
    b2 = (resid / fmag).reshape(S * 3)

    # Ridge toward the physical prior: the analytic long-range complement
    # at each offset.  This removes the on-axis degeneracy of the raw
    # normal equations (rarely-excited corner/axis parameters) while letting
    # the fit absorb CIC-smoothing corrections.
    prior = np.zeros(n_par)
    for a in range(1, m):
        for b in range(m):
            for c in range(b, m):
                pid = pidx[a, b, c]
                x, y, z = a * mesh_scale, b * mesh_scale, c * mesh_scale
                r = np.sqrt(x * x + y * y + z * z)
                frac_p = 1.0 - split_taper(np.array(r), nf_cutoff)
                prior[pid] = -frac_p * x / r ** 3
    col_scale = np.sqrt(np.mean(A2 ** 2) * A2.shape[0] / n_par)
    lam = 0.03 * col_scale * np.sqrt(A2.shape[0])
    A_aug = np.vstack([A2, lam * np.eye(n_par)])
    b_aug = np.concatenate([b2, lam * prior])
    theta, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)

    # --- expand params to (3,4,4,4) table --------------------------------
    table = np.zeros((3, m, m, m))
    for a in range(m):
        for b in range(m):
            for c in range(m):
                pid = pidx[a, b, c]
                if pid >= 0:
                    table[0, a, b, c] = theta[pid]
    # y/z components by axis permutation of the x table
    for b in range(m):
        for a in range(m):
            for c in range(m):
                table[1, a, b, c] = table[0, b, a, c]
                table[2, a, b, c] = table[0, c, a, b]
    table = table.astype(np.float32)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    np.save(cache, table)
    return table


def cic_deconvolve(kern_im: np.ndarray, kmax_frac: float = 0.9) -> np.ndarray:
    """Divide a fine-kernel spectrum by the squared CIC window.

    The S2-tapered exact kernel is NGP-optimal (mesh force = kernel at the
    cell offset).  The CIC build smooths deposit+gather by W_cic^2 =
    prod_c sinc^4(k_c/n); deconvolving restores the matched pair force
    (standard PM practice; clipped near Nyquist to avoid noise blowup).
    """
    n = kern_im.shape[1]
    k = wrapped_coords(n)
    w1 = np.sinc(k / n) ** 2          # CIC window per axis (deposit+gather)
    w1 = np.maximum(w1, np.sinc(kmax_frac / 2) ** 2 * 0.2)
    inv = 1.0 / (w1[:, None, None] * w1[None, :, None] * w1[None, None, :])
    return (kern_im * inv[None]).astype(np.float32)


def potential_kernel_fourier(kern_f_im: np.ndarray) -> np.ndarray:
    """Project the 3-component force kernel onto a scalar potential kernel.

    The potential formulation (the reference's `wg1.ascii` fine potential
    kernel + finite differencing, kernels/README) costs 2 FFTs per solve
    instead of 3.  We fit P(k) per mode by least squares so that the
    central-difference gradient reproduces the matched force kernel:
      K_c(k) ~ -sin(2 pi k_c / n) * P(k)   =>
      P(k) = -sum_c K_c sin_c / max(sum_c sin_c^2, eps).
    The non-gradient residual is zero for an exact gradient field and
    small near the Nyquist modes otherwise.
    """
    n = kern_f_im.shape[1]
    k = wrapped_coords(n)
    s = np.sin(2.0 * np.pi * k / n)
    sx = s[:, None, None]
    sy = s[None, :, None]
    sz = s[None, None, :]
    num = -(kern_f_im[0] * sx + kern_f_im[1] * sy + kern_f_im[2] * sz)
    den = sx ** 2 + sy ** 2 + sz ** 2
    return np.where(den > 1e-12, num / np.maximum(den, 1e-12), 0.0
                    ).astype(np.float32)


def build_kernels(cfg: SimConfig, use_cache: bool = True,
                  device: Optional[bool] = None):
    """Build (kern_f_im, kern_c_im) for a config.

    kern_f_im: (3, nf_h, nf_h, nf_h) full spectrum on the halo-padded node
    grid; kern_c_im: (3, nc, nc, nc) on the global coarse grid.  Large fine
    kernels build on-device by default (host FFTs of a 576^3 grid take
    minutes); the small coarse kernel always builds on host in float64.
    """
    nf_h = cfg.fine_solve_pad
    if device is None:
        device = nf_h > 192
    kern_f = fine_kernel_fourier(nf_h, cfg.nf_cutoff, cfg.pp_ext,
                                 cfg.pp_range, device=device)
    if cfg.fine_potential:
        # scalar potential kernel (wg1.ascii mode): least-squares gradient
        # projection of the matched force kernel
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _project(kf):
            k = jnp.asarray(wrapped_coords(nf_h).astype(np.float32))
            sv = jnp.sin(2.0 * jnp.pi * k / nf_h)
            sx = sv[:, None, None]
            sy = sv[None, :, None]
            sz = sv[None, None, :]
            num = -(kf[0] * sx + kf[1] * sy + kf[2] * sz)
            den = sx ** 2 + sy ** 2 + sz ** 2
            return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12),
                             0.0).astype(jnp.float32)

        kern_f = _project(jnp.asarray(kern_f))
    if not cfg.ngp:
        import jax.numpy as jnp
        kern_f = jnp.asarray(cic_deconvolve(np.asarray(kern_f))) \
            if device else cic_deconvolve(kern_f)
    table = fit_coarse_matching_table(cfg.nf_cutoff, cfg.mesh_scale,
                                      cfg.pp_ext, cfg.pp_range,
                                      use_cache=use_cache, ngp=cfg.ngp)
    kern_c = coarse_kernel_fourier(cfg.nc_dim, cfg.mesh_scale, table,
                                   cfg.lrckcorr, nf_cutoff=cfg.nf_cutoff)
    return kern_f, kern_c
