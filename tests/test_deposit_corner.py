"""Corner-split CIC deposit/gather vs the reference 8-scatter/8-gather
formulations (must agree to fp32 rounding — they are the sweep's coarse
mass/kick path, coarse_mass.f90 / coarse_velocity.f90 contract)."""
import numpy as np
import jax.numpy as jnp

from cubep3m_tpu.ops import deposit


def _cloud(n, nf, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, nf, (n, 3)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w)


def test_cic_deposit_corner_matches():
    nf, ms = 32, 4
    nc = nf // ms
    ncp = nc + 2
    x, w = _cloud(5000, nf, seed=0)
    old = deposit.cic_deposit(x, w, (ncp, ncp, ncp), scale=ms, offset=-0.5,
                              pad=1)
    new = deposit.cic_deposit_corner(x, w, (ncp, ncp, ncp), scale=ms,
                                     offset=-0.5, pad=1)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-5, atol=1e-5)
    # mass conserved
    np.testing.assert_allclose(float(jnp.sum(new)), float(jnp.sum(w)),
                               rtol=1e-5)


def test_cic_gather_corner_matches():
    nf, ms = 32, 4
    nc = nf // ms
    ncp = nc + 2
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.normal(size=(3, ncp, ncp, ncp))
                        .astype(np.float32))
    x, _ = _cloud(4000, nf, seed=2)
    old = deposit.cic_gather(field, x, scale=ms, offset=-0.5, pad=1)
    new = deposit.cic_gather_corner(field, x, scale=ms, offset=-0.5, pad=1)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-4, atol=1e-5)


def test_cic_deposit_corner_fine_pad1():
    """Fine-level CIC build usage (scale=1, offset=-0.5, pad=1)."""
    nf = 16
    x, w = _cloud(2000, nf, seed=3)
    shape = (nf + 2, nf + 2, nf + 2)
    old = deposit.cic_deposit(x, w, shape, scale=1.0, offset=-0.5, pad=1)
    new = deposit.cic_deposit_corner(x, w, shape, scale=1.0, offset=-0.5,
                                     pad=1)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-5, atol=1e-5)
