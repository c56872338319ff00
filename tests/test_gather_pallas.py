"""Pallas ranked-window coarse gather == XLA corner gather (interpret)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cubep3m_tpu.ops import deposit
from cubep3m_tpu.ops.gather_pallas import cic_gather_corner_ranked


@pytest.mark.parametrize("n_valid", [5000, 0, 4096 * 3])
def test_ranked_gather_matches_xla(n_valid):
    rng = np.random.default_rng(3)
    ncp, ms = 18, 4
    nf = (ncp - 2) * ms
    cap = 4096 * 3 + 512            # force padding + a partial tail block
    x = np.zeros((cap, 3), np.float32)
    x[:n_valid] = rng.uniform(0, nf, (n_valid, 3)).astype(np.float32)
    # a few empty-run stress regions: cluster many particles in one cell
    if n_valid > 1000:
        x[:300] = np.float32([1.0, 2.0, 3.0]) + rng.uniform(
            0, 1, (300, 3)).astype(np.float32)
    valid = np.arange(cap) < n_valid

    field = rng.normal(size=(3, ncp, ncp, ncp)).astype(np.float32)

    xt = jnp.asarray(x.T)
    v = jnp.asarray(valid)
    keys = deposit.cic_base_key_t(xt, (ncp, ncp, ncp), scale=ms,
                                  offset=-0.5, pad=1, valid=v)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    xt_s = xt[:, order]
    v_s = v[order]

    want = deposit.cic_gather_corner_t(jnp.asarray(field), xt_s, scale=ms,
                                       offset=-0.5, pad=1, valid=v_s,
                                       sorted_cells=True)

    counts = jnp.zeros((ncp ** 3,), jnp.int32).at[
        jnp.minimum(keys_s, ncp ** 3 - 1)].add(
        jnp.where(v_s, 1, 0), mode="drop")
    got = cic_gather_corner_ranked(jnp.asarray(field), xt_s, keys_s,
                                   counts, scale=ms, offset=-0.5,
                                   interpret=True)

    w = np.asarray(want)[:, np.asarray(v_s)]
    g = np.asarray(got)[:, np.asarray(v_s)]
    np.testing.assert_array_equal(g, w)


def test_ranked_gather_sentinels_zero():
    """Sentinel (invalid) slots produce exactly zero force."""
    rng = np.random.default_rng(4)
    ncp, ms = 10, 4
    nf = (ncp - 2) * ms
    cap, n_valid = 2048, 700
    x = np.zeros((cap, 3), np.float32)
    x[:n_valid] = rng.uniform(0, nf, (n_valid, 3)).astype(np.float32)
    v = jnp.asarray(np.arange(cap) < n_valid)
    xt = jnp.asarray(x.T)
    keys = deposit.cic_base_key_t(xt, (ncp, ncp, ncp), scale=ms,
                                  offset=-0.5, pad=1, valid=v)
    order = jnp.argsort(keys)
    keys_s, xt_s, v_s = keys[order], xt[:, order], v[order]
    field = rng.normal(size=(3, ncp, ncp, ncp)).astype(np.float32)
    counts = jnp.zeros((ncp ** 3,), jnp.int32).at[
        jnp.minimum(keys_s, ncp ** 3 - 1)].add(
        jnp.where(v_s, 1, 0), mode="drop")
    got = cic_gather_corner_ranked(jnp.asarray(field), xt_s, keys_s,
                                   counts, scale=ms, offset=-0.5,
                                   interpret=True)
    g = np.asarray(got)[:, ~np.asarray(v_s)]
    np.testing.assert_array_equal(g, np.zeros_like(g))


def test_auto_enabled_precedence(tmp_path, monkeypatch):
    """env var > recorded probe verdict > backend default."""
    import json
    from cubep3m_tpu.ops import gather_pallas as gp

    pf = tmp_path / "verdict.json"
    monkeypatch.setenv("CUBEP3M_GATHER_PROBE_FILE", str(pf))
    monkeypatch.delenv("CUBEP3M_GATHER_PALLAS", raising=False)

    # backend default: on for tpu, off for cpu
    assert gp.auto_enabled("tpu") is True
    assert gp.auto_enabled("cpu") is False

    # a recorded bad verdict for the SAME backend turns auto off
    gp.record_probe_verdict("tpu", False, error="Mosaic says no")
    assert gp.auto_enabled("tpu") is False
    assert json.loads(pf.read_text())["ok"] is False
    # ... but a verdict for a DIFFERENT backend is ignored
    assert gp.auto_enabled("cpu") is False
    gp.record_probe_verdict("cpu", True)
    assert gp.auto_enabled("tpu") is True   # falls back to default
    assert gp.auto_enabled("cpu") is True

    # env var beats everything
    monkeypatch.setenv("CUBEP3M_GATHER_PALLAS", "0")
    assert gp.auto_enabled("tpu") is False
    monkeypatch.setenv("CUBEP3M_GATHER_PALLAS", "1")
    gp.record_probe_verdict("tpu", False, error="x")
    assert gp.auto_enabled("tpu") is True

    # a corrupt file degrades to the backend default
    monkeypatch.delenv("CUBEP3M_GATHER_PALLAS")
    pf.write_text("{not json")
    assert gp.auto_enabled("tpu") is True
