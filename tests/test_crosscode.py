"""Cross-code harness (scripts/crosscode_compare.py) on a synthetic
"external" snapshot.

The fixture is written as RAW BYTES in the documented Fortran -DBINARY
layout (checkpoint.f90:73-95) — independently of io/checkpoint.py's
writer — simulating a snapshot the Fortran code produced.  The harness
must ingest it, measure P(k) with the reference estimator conventions,
and emit a passing <1% table against our own artifact of the same
particle set.
"""
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from cubep3m_tpu.config import SimConfig
from cubep3m_tpu.ic import zeldovich as zl

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "crosscode_compare.py")


def _cfg(np_dim=32, box=100.0):
    nf = 2 * np_dim
    cfg = SimConfig(nodes_dim=1, tiles_node_dim=2, nf_tile=nf // 2 + 32,
                    nf_cutoff=16, buf_extra=0, box=box, z_i=3.0,
                    pid=False, shake=False)
    cfg.validate()
    return cfg


def _write_fortran_style(dirname, z, x, v, a, mass_p):
    """Raw-byte header + xv stream, independent of io/checkpoint.py."""
    n = x.shape[0]
    hdr = struct.pack("<i3fi3f3if", n, a, 1.0, -3.0, 17,
                      1000.0, 1000.0, 1000.0, 1, 0, 0, mass_p)
    xv = np.concatenate([x, v], axis=1).astype("<f4")
    with open(os.path.join(dirname, f"{z:.3f}xv0.dat"), "wb") as f:
        f.write(hdr)
        f.write(xv.tobytes())


def test_crosscode_harness_synthetic_fixture(tmp_path):
    cfg = _cfg()
    st = zl.zeldovich_ic(cfg, seed=21)
    n = int(st.np_local[0])
    x = np.asarray(st.x)[:n]
    v = np.asarray(st.v)[:n]
    a = float(st.a)
    z = 1.0 / a - 1.0
    fdir = tmp_path / "fortran"
    fdir.mkdir()
    _write_fortran_style(str(fdir), z, x, v, a, cfg.mass_p)

    # our artifact: the same particles through our estimator (the harness
    # validates INGESTION + table plumbing; physics parity needs a real
    # Fortran snapshot, which cannot be produced in this environment)
    from cubep3m_tpu.analysis import power as pw
    ps = pw.power_of_particles(cfg, x, assignment="cic",
                               subtract_shot=True)
    ours = tmp_path / "ours.npz"
    np.savez(ours, k=ps.k, delta2=ps.delta2, pk=ps.pk,
             nmodes=ps.nmodes, a_final=a)

    proc = subprocess.run(
        [sys.executable, SCRIPT, "--cpu",
         "--fortran-dir", str(fdir), "--z", f"{z}",
         "--np-dim", "32", "--box", "100",
         "--ours", str(ours), "--out", str(tmp_path / "table.txt")],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["pass"] is True
    assert abs(verdict["quasi_linear"] - 1.0) <= 0.01
    assert (tmp_path / "table.txt").exists()


def test_infer_ranks_rejects_gaps(tmp_path):
    sys.path.insert(0, os.path.dirname(SCRIPT))
    import crosscode_compare as cc
    (tmp_path / "3.000xv0.dat").write_bytes(b"")
    (tmp_path / "3.000xv2.dat").write_bytes(b"")
    with pytest.raises(ValueError):
        cc.infer_ranks(str(tmp_path), 3.0)
    with pytest.raises(FileNotFoundError):
        cc.infer_ranks(str(tmp_path), 5.0)
