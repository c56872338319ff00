"""End-to-end CLI pipeline (`python -m cubep3m_tpu ...`) on a tiny box.

The CLI is the reference's batch chain (dist_init -> cubep3m -> tools,
`batch/EXAMPLES/cubep3m.pbs.example`); this drives the same surface
in-process via main(argv).
"""
import json
import os

import numpy as np
import pytest

from cubep3m_tpu.__main__ import main, _apply_platform


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cfg = {
        "_comment": "tiny smoke box",
        "nodes_dim": 1, "tiles_node_dim": 2, "nf_tile": 40,
        "nf_cutoff": 8, "buf_extra": 4,
        "box": 20.0, "z_i": 20.0, "pid": True,
        "cosmo": {"omega_m": 0.27, "omega_l": 0.73},
        "checkpoints": [0.0], "projections": [0.0], "halofinds": [0.0],
    }
    cfgf = d / "cfg.json"
    cfgf.write_text(json.dumps(cfg))
    return d, str(cfgf)


def _run(argv):
    main(argv)


def test_cli_mem(outdir, capsys):
    d, cfgf = outdir
    _run(["mem", "--config", cfgf, "--cpu"])
    out = capsys.readouterr().out
    assert "GiB" in out or "memory" in out.lower()


def test_cli_pipeline(outdir, capsys):
    d, cfgf = outdir
    _run(["ic", "--config", cfgf, "--cpu", "--outdir", str(d)])
    assert (d / "ic.npz").exists()

    _run(["run", "--config", cfgf, "--cpu", "--outdir", str(d),
          "--max-steps", "3"])
    out = capsys.readouterr().out
    assert "done: 3 sweeps" in out

    snap = str(d / "ic.npz")
    _run(["power", "--config", cfgf, "--cpu", "--snapshot", snap,
          "--out", str(d / "pk.txt")])
    pk = np.loadtxt(d / "pk.txt")
    assert pk.shape[0] > 0 and np.all(np.isfinite(pk[:, 0]))

    _run(["project", "--config", cfgf, "--cpu", "--snapshot", snap,
          "--outdir", str(d)])
    assert any(f.name.endswith("proj_xy.dat") for f in d.iterdir())

    _run(["halofind", "--config", cfgf, "--cpu", "--snapshot", snap,
          "--outdir", str(d)])
    halo_files = [f for f in d.iterdir() if f.name.endswith("halo.dat")]
    assert halo_files  # tiny unclustered box: a valid (likely empty) catalog

    _run(["recompose", "--config", cfgf, "--cpu", "--snapshot", snap,
          "--out", str(d / "global.npz")])
    g = np.load(d / "global.npz")
    from cubep3m_tpu.__main__ import load_config
    cfg, _ = load_config(cfgf)
    assert g["x"].shape[0] == cfg.np_total


def test_apply_platform_env(monkeypatch):
    """JAX_PLATFORMS is re-applied after the sitecustomize pre-import
    (a dead TPU relay otherwise blocks backend init forever)."""
    import jax
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    _apply_platform(False)
    assert jax.config.jax_platforms == "cpu"
    _apply_platform(True)
    assert jax.config.jax_platforms == "cpu"
