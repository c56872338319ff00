"""Distributed pencil FFT tests (fft_coarse/p3dfft_coarse role)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax import shard_map
from jax.sharding import PartitionSpec as P

from cubep3m_tpu import small_config
from cubep3m_tpu.parallel.mesh import make_sim_mesh, AXES
from cubep3m_tpu.parallel import pfft
from cubep3m_tpu import state as state_mod
from cubep3m_tpu.core import step as step_mod
from cubep3m_tpu.core.driver import Simulation

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@requires_8
def test_pfft3d_matches_fftn():
    mesh = make_sim_mesh(2)
    N = 16
    rng = np.random.default_rng(0)
    field = rng.standard_normal((N, N, N)).astype(np.float32)

    fwd = jax.jit(shard_map(lambda b: pfft.pfft3d(b),
                            mesh=mesh, in_specs=P(*AXES),
                            out_specs=P(*AXES), check_vma=False))
    got = np.asarray(fwd(jnp.asarray(field)))
    want = np.fft.fftn(field.astype(np.complex64))
    np.testing.assert_allclose(got, want, atol=1e-3)

    inv = jax.jit(shard_map(lambda b: pfft.pfft3d(b, inverse=True),
                            mesh=mesh, in_specs=P(*AXES),
                            out_specs=P(*AXES), check_vma=False))
    back = np.asarray(inv(jnp.asarray(got))).real
    np.testing.assert_allclose(back, field, atol=1e-4)


@requires_8
def test_pencil_sweep_matches_allgather():
    """The sweep with the pencil coarse solve reproduces the default."""
    rng = np.random.default_rng(6)
    cfgA = small_config(nodes_dim=2, tiles_node_dim=2,
                        cosmo_expansion=False, shake=False)
    cfgB = small_config(nodes_dim=2, tiles_node_dim=2,
                        cosmo_expansion=False, shake=False,
                        coarse_pencil_fft=True)
    nf = cfgA.nf_physical_dim
    x = rng.uniform(0, nf, (2000, 3)).astype(np.float32)
    v = (0.1 * rng.standard_normal((2000, 3))).astype(np.float32)

    def run(cfg):
        sim = Simulation(cfg, pp_band=16)
        st = state_mod.distribute_global(cfg, x, v)
        st = step_mod.shard_state(st, sim.mesh)
        for i in range(2):
            st = sim.sweep(st, sim.kern_f, sim.kern_c, 1.0, 0.2, 1.0,
                           0.0, 0.0)
        return state_mod.gather_global(cfg, st)

    xa, va, pa = run(cfgA)
    xb, vb, pb = run(cfgB)
    oa, ob = np.argsort(pa), np.argsort(pb)
    np.testing.assert_allclose(xa[oa], xb[ob], atol=2e-4)
    np.testing.assert_allclose(va[oa], vb[ob], atol=2e-4)
