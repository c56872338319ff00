"""Native C++ halo-growth loop vs the numpy reference implementation."""
import numpy as np
import pytest

from cubep3m_tpu import native
from cubep3m_tpu.analysis.halofind import _shell_offsets


def test_native_builds():
    assert native.load() is not None, "g++ build of libhalogrowth failed"


def test_native_matches_numpy():
    rng = np.random.default_rng(2)
    nf = 32
    rho = rng.random((nf, nf, nf)).astype(np.float32)
    # two dense blobs
    for c, amp in (((8, 8, 8), 300.0), ((20, 22, 9), 500.0)):
        rho[c] += amp
        for d in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
            rho[tuple((np.array(c) + d) % nf)] += amp / 3
            rho[tuple((np.array(c) - d) % nf)] += amp / 3
    offsets, rdist = _shell_offsets(8)
    peaks = np.array([[20, 22, 9], [8, 8, 8]], np.int64)
    odc, min_mass = 178.0, 10.0

    def numpy_growth(rho_in):
        rho_l = rho_in.copy()
        out = []
        for h in range(peaks.shape[0]):
            c = peaks[h]
            if rho_l[tuple(c)] <= 0:
                out.append((0.0, 0.0, False))
                continue
            cells = (c[None, :] + offsets) % nf
            dens = rho_l[cells[:, 0], cells[:, 1], cells[:, 2]]
            csum = np.cumsum(dens)
            mean_od = csum / np.arange(1, dens.size + 1)
            below = np.where(mean_od < odc)[0]
            stop = below[0] if below.size else dens.size
            stop = max(stop, 1)
            mass = float(csum[stop - 1])
            radius = float(rdist[stop - 1]) if stop > 1 else 1.0
            if mass < min_mass:
                out.append((0.0, 0.0, False))
                continue
            used = cells[:stop]
            rho_l[used[:, 0], used[:, 1], used[:, 2]] = 0.0
            out.append((mass, radius, True))
        return rho_l, out

    rho_np, ref = numpy_growth(rho)
    res = native.grow_halos(rho.copy(), peaks, offsets, rdist, odc, min_mass)
    assert res is not None
    rho_nat, mass, radius, kept, ncells = res
    for h in range(peaks.shape[0]):
        m_ref, r_ref, k_ref = ref[h]
        assert bool(kept[h]) == k_ref
        if k_ref:
            assert abs(mass[h] - m_ref) < 1e-2 * max(m_ref, 1)
            assert radius[h] == pytest.approx(r_ref, abs=1e-5)
            # actual mean overdensity stays >= odc by construction
            assert mass[h] / ncells[h] >= odc - 1e-3
    np.testing.assert_allclose(rho_nat, rho_np, atol=1e-5)
