"""The artifact-report tool (scripts/artifact_report.py) renders the
acceptance tables VALIDATION.md publishes; pin its two input shapes:
a current-format npz (stored theory columns) and a legacy one (columns
recomputed), checking the weighted ratios and mass-function rows land.
"""
import os
import subprocess
import sys

import numpy as np

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "artifact_report.py")


def _synthetic_npz(path, with_theory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu.ic import transfer as tr
    from cubep3m_tpu.analysis import halofit as hft

    cfg = SimConfig(nodes_dim=1, tiles_node_dim=2, nf_tile=48,
                    nf_cutoff=16, box=100.0)
    k = np.geomspace(0.08, 8.0, 40)
    lin = tr.linear_power(cfg.cosmo, 1.0)
    lin2 = lin.delta2(k)
    nl2 = hft.nonlinear_delta2(lin, k)
    data = dict(k=k, delta2=nl2 * 1.05, pk=nl2, nmodes=np.full(40, 100),
                halo_mass=np.full(300, 2000.0), halo_imass=np.full(300, 8),
                n_steps=100, a_final=1.0)
    if with_theory:
        data.update(lin_delta2=lin2, nl_delta2=nl2)
    np.savez(path, **data)


def _run(path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, SCRIPT, str(path), "--np-dim", "16"],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_report_with_stored_theory(tmp_path):
    p = tmp_path / "a.npz"
    _synthetic_npz(p, with_theory=True)
    out = _run(p)
    # the spectrum was built at exactly 1.05x halofit
    for band in ("0.3-1", "1-3", "3-8"):
        line = next(l for l in out.splitlines()
                    if f"sim/halofit {band}" in l)
        assert abs(float(line.split()[-1]) - 1.05) < 1e-3, line
    assert "mass function vs Sheth-Tormen" in out
    # 300 halos of 250 particle masses each: one populated row
    assert any(l.strip().split()[1] == "300" for l in out.splitlines()
               if l.strip() and l.strip()[0].isdigit())


def test_report_legacy_npz_recomputes_theory(tmp_path):
    p = tmp_path / "b.npz"
    _synthetic_npz(p, with_theory=False)
    out = _run(p)
    line = next(l for l in out.splitlines() if "sim/halofit 0.3-1" in l)
    assert abs(float(line.split()[-1]) - 1.05) < 1e-3, line
