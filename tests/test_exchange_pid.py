"""Particle-identity preservation through the packed exchange payload.

pids travel bit-cast into the float32 payload matrix; the encoding must
keep every value out of the float32 denormal range (a flushing copy on any
backend would silently zero small pids) and out of NaN patterns (advisor
round-2 finding).  Exercises denormal-range, 2^23-range, and 512^3-range
ids.
"""
import numpy as np
import jax.numpy as jnp

from cubep3m_tpu.parallel import exchange as ex_mod


def test_pid_encoding_avoids_denormals_and_nans():
    ids = np.array([0, 1, 7, 1000, (1 << 23) - 1, 1 << 23,
                    (1 << 27) - 1, 1 << 27, 512 ** 3 - 1], np.int32)
    enc = np.asarray(ex_mod.pid_to_f32(jnp.asarray(ids)))
    bits = enc.view(np.uint32)
    exp = (bits >> 23) & 0xFF
    assert np.all(exp != 0), "encoded pid landed in the denormal range"
    assert np.all(exp != 0xFF), "encoded pid aliases NaN/Inf"
    dec = np.asarray(ex_mod.pid_from_f32(jnp.asarray(enc)))
    np.testing.assert_array_equal(dec, ids)


def test_exchange_noncubic_mesh_routes_correctly():
    """The 26-class exchange works on non-cubic meshes (per-axis sizes,
    not nd^3): a (2,1,1) mesh routes +x/-x leavers to the neighbor and
    wraps y/z locally."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from cubep3m_tpu.parallel.mesh import AXES

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1, 1), AXES)
    nf, cap = 16, 8
    x = np.zeros((2 * cap, 3), np.float32)
    v = np.zeros_like(x)
    pid = np.zeros(2 * cap, np.int32)
    valid = np.zeros(2 * cap, bool)
    # device 0: pid 100 leaves +x; device 1: pid 200 leaves -x
    x[0] = (16.5, 5.0, 5.0)
    pid[0] = 100
    valid[0] = True
    x[cap] = (-0.5, 3.0, 3.0)
    pid[cap] = 200
    valid[cap] = True

    def local(x, v, p, val):
        ex = ex_mod.exchange_particles(jnp.asarray(x), jnp.asarray(v),
                                       jnp.asarray(p), jnp.asarray(val),
                                       nf, max_buf=4, compact=True)
        return ex.x, ex.pid, ex.valid, ex.overflow

    pa = P(AXES)
    fn = shard_map(local, mesh=mesh, in_specs=(pa, pa, pa, pa),
                   out_specs=(pa, pa, pa, P()), check_vma=False)
    xo, po, vo, ov = jax.jit(fn)(x, v, pid, valid)
    xo, po, vo = np.asarray(xo), np.asarray(po), np.asarray(vo)
    assert int(ov) == 0
    # device 0 now owns pid 200 at x=15.5; device 1 owns pid 100 at 0.5
    d0 = po[:cap][vo[:cap]]
    d1 = po[cap:][vo[cap:]]
    assert list(d0) == [200] and list(d1) == [100]
    np.testing.assert_allclose(xo[:cap][vo[:cap]][0], [15.5, 3.0, 3.0])
    np.testing.assert_allclose(xo[cap:][vo[cap:]][0], [0.5, 5.0, 5.0])


def test_exchange_preserves_pids_across_ranges():
    """Round-trip through the full packed exchange (sort + slice + merge)
    with ids spanning the denormal-hazard range."""
    rng = np.random.default_rng(0)
    n, nf = 512, 16
    x = rng.uniform(-2.0, nf + 2.0, (n, 3)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    # half tiny ids (denormal-range if raw-bit-cast), half huge
    pid = np.concatenate([np.arange(n // 2, dtype=np.int32),
                          np.arange(n // 2, dtype=np.int32)
                          + (512 ** 3 - n)])
    valid = np.ones(n, bool)
    res = ex_mod.exchange_particles(
        jnp.asarray(x), jnp.asarray(v), jnp.asarray(pid),
        jnp.asarray(valid), nf, max_buf=256)
    out_valid = np.asarray(res.valid)
    out_pid = np.asarray(res.pid)[out_valid]
    assert int(res.overflow) == 0
    # single-device periodic wrap: every particle survives with its id
    np.testing.assert_array_equal(np.sort(out_pid), np.sort(pid))
