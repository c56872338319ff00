"""3-D DFT by MXU matmul — a TPU-native alternative to XLA's FFT.

The fine-level force solve (reference `fft_fine.f90` via FFTW; ours
`ops/fftconv.py`) is FFT-bound: at 256^3 the 288^3-tile c2c transforms
cost ~52 ms each through XLA's TPU FFT — roughly 10x off the HBM
roofline, because XLA lowers FFT to VPU butterfly passes.  A dense DFT
is O(n) matmuls per axis instead of O(log n) butterflies, i.e. ~17x the
FLOPs at n=288 — but those FLOPs run on the MXU at two orders of
magnitude higher throughput, pencilling out at ~5 ms per 288^3
transform at fp32-equivalent precision.

Numerics: `precision=HIGHEST` keeps the matmuls at fp32-equivalent
accuracy (bf16x6 passes on v5e).  A length-n dense-DFT dot accumulates
~sqrt(n)*eps relative error (vs log2(n)*eps for FFT) — ~2e-6 at n=288,
far below the fp32 physics noise floor; `tests/test_dftmm.py` pins
equality against `jnp.fft` and the probe re-checks it on hardware.

Enabled via `SimConfig.fft_matmul` (None = auto: an on-hardware probe
verdict recorded by `scripts/fft_matmul_probe.py`, same pattern as the
Pallas gather kernel — unproven backends default OFF).
"""
from __future__ import annotations

import functools
import json
import os

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _dft_mats_np(n: int, inverse: bool):
    """(Wr, Wi, Wr+Wi, Wi-Wr) of the n x n DFT matrix, float32.

    The two sum matrices feed the 3-multiplication complex product below;
    they are formed in float64 BEFORE the float32 cast so they carry no
    extra rounding."""
    k = np.arange(n, dtype=np.float64)
    sign = 1.0 if inverse else -1.0
    ang = (sign * 2.0 * np.pi / n) * np.outer(k, k)
    wr, wi = np.cos(ang), np.sin(ang)
    return (wr.astype(np.float32), wi.astype(np.float32),
            (wr + wi).astype(np.float32), (wi - wr).astype(np.float32))


def _axis_mm(re, im, n: int, axis: int, inverse: bool):
    """Complex contraction of `axis` with the n-point DFT matrix.

    re/im: float32 arrays; the (B, n) x (n, n) shapes tile the MXU
    directly at HIGHEST precision.  Complex x complex uses the
    3-multiplication (Karatsuba) form — m1=(re+im)@Wr, m2=im@(Wr+Wi),
    m3=re@(Wi-Wr); out = (m1-m2) + i(m1+m3) — 3 real matmuls instead of
    4 (25% fewer MXU FLOPs; the extra (B, n) adds ride the VPU).  The
    error bound grows by a small constant over the 4-matmul form and
    stays ~1e-6 relative at n=288 (pinned by tests/test_dftmm.py and
    re-checked on hardware by scripts/fft_matmul_probe.py).  `im=None`
    marks a purely real input (first transformed axis of a real field):
    2 matmuls.
    """
    P = jax.lax.Precision.HIGHEST
    Wr, Wi, Wrpi, Wimr = (jnp.asarray(m) for m in _dft_mats_np(n, inverse))
    sh = jnp.moveaxis(re, axis, -1).shape

    def to2d(a):
        return jnp.moveaxis(a, axis, -1).reshape(-1, n)

    def back(a):
        return jnp.moveaxis(a.reshape(sh), -1, axis)

    rr = to2d(re)
    if im is None:
        outr = jnp.dot(rr, Wr, precision=P)
        outi = jnp.dot(rr, Wi, precision=P)
    else:
        ii = to2d(im)
        m1 = jnp.dot(rr + ii, Wr, precision=P)
        m2 = jnp.dot(ii, Wrpi, precision=P)
        m3 = jnp.dot(rr, Wimr, precision=P)
        outr = m1 - m2
        outi = m1 + m3
    return back(outr), back(outi)


def _transform(z, axes, inverse: bool):
    if axes is None:
        axes = tuple(range(z.ndim))
    if jnp.iscomplexobj(z):
        re, im = jnp.real(z).astype(jnp.float32), \
            jnp.imag(z).astype(jnp.float32)
    else:
        re, im = z.astype(jnp.float32), None
    for ax in axes:
        re, im = _axis_mm(re, im, z.shape[ax], ax, inverse)
    if inverse:
        norm = np.float32(1.0 / np.prod([z.shape[a] for a in axes]))
        re, im = re * norm, im * norm
    return jax.lax.complex(re, im)


def fftn_mm(z, axes=None):
    """`jnp.fft.fftn` drop-in (c2c, all axes by default) via MXU matmuls."""
    return _transform(z, axes, inverse=False)


def ifftn_mm(z, axes=None):
    """`jnp.fft.ifftn` drop-in (1/N normalization) via MXU matmuls."""
    return _transform(z, axes, inverse=True)


# ---------------------------------------------------------------------------
# on-hardware probe verdict (same contract as ops/gather_pallas.py)

def probe_verdict_path() -> str:
    override = os.environ.get("CUBEP3M_FFT_MATMUL_PROBE_FILE")
    if override:
        return override
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "bench_cache", "fft_matmul_probe.json")


def record_probe_verdict(backend: str, ok: bool, ms_mm: float | None = None,
                         ms_fft: float | None = None,
                         max_rel_err: float | None = None,
                         error: str = "") -> None:
    """Persist an A/B probe result (scripts/fft_matmul_probe.py): `ok`
    means the matmul DFT was both exact (vs jnp.fft) AND faster on this
    backend, so the auto decision may enable it unattended."""
    path = probe_verdict_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"backend": backend, "ok": bool(ok), "ms_mm": ms_mm,
                   "ms_fft": ms_fft, "max_rel_err": max_rel_err,
                   "error": error[:500]}, f)
    os.replace(tmp, path)


def auto_enabled(backend: str | None = None) -> bool:
    """Resolve cfg.fft_matmul=None (auto).

    Priority: CUBEP3M_FFT_MATMUL env (0/1), then the recorded probe
    verdict for this backend, then OFF — unlike the Pallas gather this
    path trades exactness-class numerics for speed only when an
    on-hardware A/B has shown both (CPU backends keep pocketfft, which a
    dense DFT cannot beat)."""
    env = os.environ.get("CUBEP3M_FFT_MATMUL")
    if env is not None and env != "":
        return env not in ("0", "false", "False", "off")
    if backend is None:
        backend = jax.default_backend()
    try:
        with open(probe_verdict_path()) as f:
            verdict = json.load(f)
        if verdict.get("backend") == backend:
            return bool(verdict.get("ok"))
    except (OSError, ValueError):
        pass
    return False
