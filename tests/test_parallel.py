"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from crowdsam_tpu.parallel.mesh import create_mesh, data_sharded, shard_batch


def test_create_mesh_shapes():
    mesh = create_mesh((4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = create_mesh()
    assert mesh1.shape["data"] == len(jax.devices())


def test_shard_batch_placement():
    mesh = create_mesh((8, 1))
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding == data_sharded(mesh, 2)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_reduction_matches_single_device():
    mesh = create_mesh((8, 1))
    x = jnp.arange(32 * 8, dtype=jnp.float32).reshape(32, 8)

    @jax.jit
    def f(v):
        return jnp.sum(v * 2.0, axis=0)

    want = f(x)
    got = f(shard_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_dryrun_multichip_full_train_step():
    """The driver contract: full training step jitted over an 8-device mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
