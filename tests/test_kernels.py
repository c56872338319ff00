"""Force kernel construction tests."""
import numpy as np
import pytest

from cubep3m_tpu import kernels


def test_fine_kernel_values():
    k = kernels.fine_kernel_real(64, 16)
    # offset (1,0,0): exact -1 times the S2 taper at s=1/16
    t1 = 1.0 - 1.75 * (1 / 16) ** 3 + 0.75 * (1 / 16) ** 5
    assert np.isclose(k[0, 1, 0, 0], -t1, rtol=1e-6)
    # matches the reference's fitted table at the diagonal d=6
    # (wfxyzf.3.ascii gives -0.003246 there)
    assert np.isclose(k[0, 6, 6, 6], -0.003246, atol=2e-4)
    # odd in x: mirrored offset
    assert np.isclose(k[0, -1, 0, 0], t1)
    # even in y for x-component
    assert np.isclose(k[0, 1, 1, 0], k[0, 1, -1, 0])
    # zero at origin and outside the sphere r >= nf_cutoff
    assert k[0, 0, 0, 0] == 0.0
    assert k[0, 16, 0, 0] == 0.0
    assert k[0, 12, 12, 0] == 0.0  # r = 17 > 16, inside the cube


def test_fine_kernel_pp_ext_zeroed_inner():
    k = kernels.fine_kernel_real(32, 8, pp_ext=True, pp_range=2)
    assert k[0, 1, 0, 0] == 0.0
    assert k[0, 2, 2, 2] == 0.0
    assert k[0, 3, 0, 0] != 0.0


def test_fine_kernel_matches_reference_table():
    """Regenerated kernel vs the reference's fitted table (spot values).

    wfxyzf.3.ascii values (1-based indices -> offsets): the S2-tapered exact
    force; our analytic regeneration should agree to the table's fit noise.
    """
    k = kernels.fine_kernel_real(64, 16)
    ref = {  # (dx,dy,dz): x-component from wfxyzf.3.ascii
        (1, 0, 0): -0.99957371,
        (2, 0, 0): -0.24915129,
        (4, 0, 0): -0.060836807,
        (1, 1, 0): -0.35312769,
        (1, 1, 1): -0.19202499,
        (8, 8, 8): -0.00068769674,
    }
    for (dx, dy, dz), v in ref.items():
        assert abs(k[0, dx, dy, dz] - v) < max(6e-3 * abs(v), 2e-4), \
            f"offset {(dx, dy, dz)}: {k[0, dx, dy, dz]} vs {v}"


def test_fine_kernel_fourier_is_imaginary():
    """Odd kernel => real part of DFT vanishes."""
    kr = kernels.fine_kernel_real(16, 4).astype(np.float64)
    kf = np.fft.fftn(kr[0])
    assert np.max(np.abs(kf.real)) < 1e-10


def test_coarse_kernel_outer_values():
    kc = kernels.coarse_kernel_real(16, 4, nf_cutoff=16)
    # offset (4,0,0) coarse = 16 fine cells = the cutoff: full exact force
    assert np.isclose(kc[0, 4, 0, 0], -16.0 / 16.0 ** 3)
    # odd symmetry
    assert np.isclose(kc[0, -4, 0, 0], 16.0 / 16.0 ** 3)
    # inside the cutoff the kernel carries only the long-range complement
    r = 8.0
    frac = 1.75 * (r / 16) ** 3 - 0.75 * (r / 16) ** 5
    assert np.isclose(kc[0, 2, 0, 0], -frac * 8.0 / r ** 3, rtol=1e-6)


def test_matching_table_symmetries_and_reference_parity():
    t = kernels.fit_coarse_matching_table(16, 4, n_samples=60000,
                                          use_cache=False)
    assert t.shape == (3, 4, 4, 4)
    # x-component zero at Ex=0 (odd)
    assert np.allclose(t[0, 0], 0.0)
    # v(a,b,c) == v(a,c,b)
    assert np.allclose(t[0, :, 1, 2], t[0, :, 2, 1])
    # y-table is permuted x-table
    assert np.isclose(t[1, 2, 3, 1], t[0, 3, 2, 1])
    # our independent fit must land near the reference's fitted value
    # (wfxyzc.2.ascii has -0.0016632 at coarse offset (1,0,0))
    assert np.isclose(t[0, 1, 0, 0], -0.0016632, atol=2e-4)
    # inner values are small (fine level carries most of the force)
    assert np.max(np.abs(t)) < 0.02


def test_pairwise_force_error_through_matched_kernels():
    """End-to-end force-error harness (report_pair.f90 analog, mesh only):

    two NGP-deposited particles, fine+coarse mesh force vs exact 1/r^2,
    over separations spanning the two-level hand-off.  RMS error must be
    small; this is the core physics acceptance test for the kernel split.
    """
    nf_cutoff, ms = 16, 4
    n = 128  # periodic test box (fine cells)
    kf = kernels.fine_kernel_real(n, nf_cutoff).astype(np.float64)
    table = kernels.fit_coarse_matching_table(nf_cutoff, ms, n_samples=60000)
    nc = n // ms
    # lrckcorr off: it makes the kernel periodic-correct at large scales,
    # which this isolated-pair harness would mis-score.
    kc_f = kernels.coarse_kernel_fourier(nc, ms, table, lrckcorr=False,
                                         nf_cutoff=nf_cutoff)

    rng = np.random.default_rng(7)
    errs = []
    smags = []
    for _ in range(300):
        smag = rng.uniform(2.0, 40.0)
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        p2 = rng.uniform(8.0, 16.0, 3)
        p1 = np.mod(p2 + u * smag, n)
        # fine force via direct kernel lookup (NGP)
        c1 = np.floor(p1).astype(int) % n
        c2 = np.floor(p2).astype(int) % n
        d = tuple((c1 - c2) % n)
        f_fine = kf[:, d[0], d[1], d[2]]
        # coarse force via the actual CIC -> FFT -> CIC pipeline
        rho = np.zeros((nc, nc, nc))
        xs = p2 / ms - 0.5
        c0 = np.floor(xs).astype(int)
        fr = xs - c0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = ((fr[0] if dx else 1 - fr[0])
                           * (fr[1] if dy else 1 - fr[1])
                           * (fr[2] if dz else 1 - fr[2]))
                    rho[(c0[0] + dx) % nc, (c0[1] + dy) % nc,
                        (c0[2] + dz) % nc] += wgt
        fc_grid = np.stack([
            np.fft.ifftn(np.fft.fftn(rho) * 1j * kc_f[c]).real
            for c in range(3)])
        xs1 = p1 / ms - 0.5
        c0 = np.floor(xs1).astype(int)
        fr = xs1 - c0
        f_coarse = np.zeros(3)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = ((fr[0] if dx else 1 - fr[0])
                           * (fr[1] if dy else 1 - fr[1])
                           * (fr[2] if dz else 1 - fr[2]))
                    f_coarse += wgt * fc_grid[:, (c0[0] + dx) % nc,
                                              (c0[1] + dy) % nc,
                                              (c0[2] + dz) % nc]
        sep = p1 - p2
        sep -= n * np.round(sep / n)
        r = np.linalg.norm(sep)
        f_exact = -sep / r ** 3
        f_tot = f_fine + f_coarse
        # fractional error wrt exact magnitude
        errs.append(np.linalg.norm(f_tot - f_exact) / np.linalg.norm(f_exact))
        smags.append(r)
    errs = np.array(errs)
    smags = np.array(smags)
    # Thresholds calibrated against the reference's own tabulated kernels
    # run through this same harness (they score median 0.011 overall,
    # ~0.24 at r=2-5 from NGP quantization, <=0.03 beyond the hand-off).
    assert np.median(errs) < 0.05
    far = smags > 18.0
    assert np.median(errs[far]) < 0.03
    mid = (smags > 8.0) & (smags <= 18.0)
    assert np.median(errs[mid]) < 0.12
