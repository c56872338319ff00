"""End-to-end coverage of the acceptance tool (scripts/validate_lcdm.py).

This script drives every 256^3 campaign leg; round 4 lost TPU windows to
bugs in its RESUME edge cases (stale cursors, resume-at-target), so the
three paths are pinned here at 16^3 on CPU:

1. fresh run to a target redshift with checkpoint rungs,
2. resume from a rung below the target (steps, then measures),
3. resume from the target rung itself (measure-directly path).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "validate_lcdm.py")


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--np-dim", "16", "--cpu"] + args,
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise AssertionError(f"no JSON summary in output:\n{proc.stdout[-2000:]}")


@pytest.fixture(scope="module")
def leg1(tmp_path_factory):
    d = tmp_path_factory.mktemp("vck")
    out = str(d / "leg1.npz")
    summary = _run(["--z-final", "4.0", "--max-steps", "400",
                    "--ckpt-dir", str(d), "--out", out])
    return d, out, summary


def test_fresh_run_writes_rungs_and_artifact(leg1):
    d, out, summary = leg1
    assert summary["a_final"] == pytest.approx(0.2, abs=1e-3)
    art = np.load(out)
    for key in ("k", "delta2", "lin_delta2", "nl_delta2", "halo_mass"):
        assert key in art
    # rungs above the target exist (10, 5) plus the target itself
    for z in ("10.000", "5.000", "4.000"):
        assert (d / f"ckpt_{z}.npz").exists()


def test_resume_below_target_steps_then_measures(leg1):
    d, out, _ = leg1
    out2 = str(d / "leg2.npz")
    summary = _run(["--z-final", "4.0", "--max-steps", "400",
                    "--ckpt-dir", str(d), "--out", out2,
                    "--resume-from", str(d / "ckpt_5.000.npz")])
    assert summary["a_final"] == pytest.approx(0.2, abs=1e-3)
    # the resumed leg must re-land the z=4 trigger, not skip it
    a = np.load(out2)
    assert float(a["a_final"]) == pytest.approx(0.2, abs=1e-3)


def test_resume_at_target_measures_directly(leg1):
    d, out, base = leg1
    out3 = str(d / "leg3.npz")
    summary = _run(["--z-final", "4.0", "--max-steps", "400",
                    "--ckpt-dir", str(d), "--out", out3,
                    "--resume-from", str(d / "ckpt_4.000.npz")])
    # no further stepping happened (same sweep count as the writing leg)
    assert summary["n_steps"] == base["n_steps"]
    # and the measurement equals the original leg's (same state measured)
    a, b = np.load(out), np.load(out3)
    np.testing.assert_allclose(b["delta2"], a["delta2"], rtol=1e-5)
    assert b["halo_mass"].size == a["halo_mass"].size
