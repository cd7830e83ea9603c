"""Model-axis-sharded covariance matvec == single-device matvec, on a
(data x model) mesh of 8 virtual CPU devices."""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.ops import lowrank
from free_hunch_tpu.parallel.mesh import make_mesh
from free_hunch_tpu.parallel.sharded_cov import shard_state, sharded_matvec


def test_sharded_matvec_matches_local():
    mesh = make_mesh("model:4")
    d, K = 64, 8
    rng = np.random.default_rng(0)
    diag = jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)
    rep = lowrank.init(diag, K)
    rep = lowrank.append_pair(rep, jnp.asarray(rng.normal(size=d), jnp.float32), 0.5,
                              jnp.asarray(rng.normal(size=d), jnp.float32), -0.3)
    v = jnp.asarray(rng.normal(size=d), jnp.float32)
    want = lowrank.matvec(rep, v)

    sharded = shard_state(rep, mesh)
    f = jax.jit(sharded_matvec(mesh))
    got = f(sharded.diag, sharded.Ut, sharded.M,
            jax.device_put(v, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("model"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_data_by_model_mesh():
    mesh = make_mesh("data:2,model:4")
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 2, "model": 4}
    d, K = 32, 4
    rng = np.random.default_rng(1)
    diag = jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)
    rep = lowrank.init(diag, K)
    v = jnp.asarray(rng.normal(size=d), jnp.float32)
    f = jax.jit(sharded_matvec(mesh))
    sharded = shard_state(rep, mesh)
    got = f(sharded.diag, sharded.Ut, sharded.M, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lowrank.matvec(rep, v)),
                               rtol=1e-5)
