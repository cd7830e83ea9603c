"""Model-axis sharding of the covariance matvec.

The reference's only parallelism is data-parallel evaluation; its scaling
story in the state dimension is algorithmic (matrix-free low-rank + FFT,
SURVEY.md §5). Beyond 256 px the (d, K) covariance factors and the d-length
diagonals outgrow one chip's HBM share; this module shards them over a
'model' mesh axis with ``shard_map``:

    Sigma0 @ v = diag * v + Ut^T @ (M @ psum_shards(Ut_shard v_shard))

Each device holds a d/n_model slice of diag/Ut/v (Ut is the (K, d)
transposed factor storage — see ``ops/lowrank.py``); the only communication
is one K-length psum per matvec (riding ICI), after which the rank-K inner
product is replicated and the final (K, d_shard) matmul is local. Composes
with the 'data' axis: a (data, model) mesh shards the batch and the state
dimension simultaneously.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from free_hunch_tpu.ops.lowrank import LowRank


def shard_state(cov: LowRank, mesh: Mesh, model_axis: str = "model") -> LowRank:
    """Place a (possibly batched) LowRank state with diag/Ut sharded on their
    d dimension over the model axis; M and k replicated."""
    d_axis = cov.diag.ndim - 1  # last axis of diag is d
    diag_spec = [None] * cov.diag.ndim
    diag_spec[d_axis] = model_axis
    u_spec = [None] * cov.Ut.ndim
    u_spec[cov.Ut.ndim - 1] = model_axis  # d is the last (lane) dim of Ut
    return LowRank(
        diag=jax.device_put(cov.diag, NamedSharding(mesh, P(*diag_spec))),
        Ut=jax.device_put(cov.Ut, NamedSharding(mesh, P(*u_spec))),
        M=jax.device_put(cov.M, NamedSharding(mesh, P())),
        k=jax.device_put(cov.k, NamedSharding(mesh, P())),
    )


def sharded_matvec(mesh: Mesh, model_axis: str = "model"):
    """Build f(cov, v) computing Sigma0 @ v with d sharded over ``model_axis``.

    cov leaves and v are unbatched ((d,), (d, K), (K, K)); vmap for batches.
    """

    def local(diag, Ut, M, v):
        # local partial inner product, then one K-length psum over shards
        inner = Ut @ v
        inner = jax.lax.psum(inner, model_axis)
        return diag * v + (M @ inner) @ Ut

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(model_axis), P(None, model_axis), P(None, None), P(model_axis)),
        out_specs=P(model_axis),
    )
