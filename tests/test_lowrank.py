"""Dense-vs-factored equivalence for the LowRank representation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from free_hunch_tpu.ops import lowrank


def _random_rep(key, d=12, K=8, k=4, dtype=jnp.float64):
    k1, k2, k3 = jax.random.split(key, 3)
    diag = jax.random.uniform(k1, (d,), dtype, 0.5, 2.0)
    rep = lowrank.init(diag, K)
    U = jax.random.normal(k2, (d, K), dtype)
    U = U.at[:, k:].set(0.0)
    M = jax.random.normal(k3, (K, K), dtype)
    M = 0.5 * (M + M.T)
    mask = (jnp.arange(K) < k)
    M = jnp.where(mask[:, None] & mask[None, :], M, jnp.eye(K, dtype=dtype))
    return rep._replace(Ut=U.T, M=M, k=jnp.asarray(k, jnp.int32))


def test_matvec_matches_dense():
    rep = _random_rep(jax.random.PRNGKey(0))
    v = jax.random.normal(jax.random.PRNGKey(1), (12,), jnp.float64)
    dense = lowrank.dense(rep)
    np.testing.assert_allclose(lowrank.matvec(rep, v), dense @ v, rtol=1e-10)
    # multi-column
    V = jax.random.normal(jax.random.PRNGKey(2), (12, 3), jnp.float64)
    np.testing.assert_allclose(lowrank.matvec(rep, V), dense @ V, rtol=1e-10)


def test_inverse_matches_dense():
    rep = _random_rep(jax.random.PRNGKey(3))
    dense = lowrank.dense(rep)
    # make sure the matrix is far from singular for a clean test
    rep = rep._replace(diag=rep.diag + 5.0)
    dense = lowrank.dense(rep)
    inv = lowrank.inverse(rep)
    np.testing.assert_allclose(lowrank.dense(inv), np.linalg.inv(dense), rtol=1e-8, atol=1e-10)
    # inverse of inverse round-trips
    np.testing.assert_allclose(lowrank.dense(lowrank.inverse(inv)), dense, rtol=1e-8, atol=1e-10)


def test_inverse_with_empty_lowrank():
    diag = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2, 7))
    rep = lowrank.init(diag, 6)
    inv = lowrank.inverse(rep)
    np.testing.assert_allclose(lowrank.dense(inv), np.diag(1.0 / np.asarray(diag)), rtol=1e-12)


def test_affine_and_shift():
    rep = _random_rep(jax.random.PRNGKey(4))
    dense = lowrank.dense(rep)
    np.testing.assert_allclose(lowrank.dense(lowrank.affine(rep, 2.0, 3.0)),
                               2.0 * dense + 3.0 * np.eye(12), rtol=1e-10)
    np.testing.assert_allclose(lowrank.dense(lowrank.shift_diag(rep, -0.5)),
                               dense - 0.5 * np.eye(12), rtol=1e-10)


def test_append_pair_matches_dense():
    rep = _random_rep(jax.random.PRNGKey(5), k=2)
    dense = lowrank.dense(rep)
    a = jax.random.normal(jax.random.PRNGKey(6), (12,), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(7), (12,), jnp.float64)
    out = lowrank.append_pair(rep, a, 0.7, b, -1.3)
    expect = dense + 0.7 * np.outer(a, a) - 1.3 * np.outer(b, b)
    np.testing.assert_allclose(lowrank.dense(out), expect, rtol=1e-9, atol=1e-10)
    assert int(out.k) == 4


def test_compress_is_optimal_rank_truncation():
    d, K = 10, 6
    diag = jnp.ones((d,), jnp.float64) * 0.7
    rep = lowrank.init(diag, K)
    cols = jax.random.normal(jax.random.PRNGKey(8), (4, d), jnp.float64)
    rep = lowrank.append_pair(rep, cols[0], 1.0, cols[1], -1.0)
    rep = lowrank.append_pair(rep, cols[2], 0.5, cols[3], -0.5)
    lowrank_part = np.asarray(lowrank.dense(rep)) - np.diag(np.asarray(rep.diag))
    out = lowrank.compress(rep, 2)
    assert int(out.k) == 2
    # oracle: eigendecomposition truncation of the low-rank part
    evals, evecs = np.linalg.eigh(lowrank_part)
    top = np.argsort(-np.abs(evals))[:2]
    best = (evecs[:, top] * evals[top]) @ evecs[:, top].T
    np.testing.assert_allclose(np.asarray(lowrank.dense(out)) - np.diag(np.asarray(out.diag)),
                               best, rtol=1e-6, atol=1e-8)


def test_append_pair_compresses_at_capacity():
    d, K = 10, 4
    diag = jnp.ones((d,), jnp.float64)
    rep = lowrank.init(diag, K)
    cols = jax.random.normal(jax.random.PRNGKey(9), (6, d), jnp.float64)
    rep = lowrank.append_pair(rep, cols[0], 1.0, cols[1], -1.0)
    rep = lowrank.append_pair(rep, cols[2], 0.5, cols[3], -0.5)
    dense_before = np.asarray(lowrank.dense(rep))
    rep2 = lowrank.append_pair(rep, cols[4], 2.0, cols[5], -2.0)
    assert int(rep2.k) == 4
    # the result is (best rank-2 approx of the old low-rank part) + new pair
    lr = dense_before - np.eye(d)
    evals, evecs = np.linalg.eigh(lr)
    top = np.argsort(-np.abs(evals))[:2]
    best = (evecs[:, top] * evals[top]) @ evecs[:, top].T
    expect = (np.eye(d) + best + 2.0 * np.outer(cols[4], cols[4])
              - 2.0 * np.outer(cols[5], cols[5]))
    np.testing.assert_allclose(lowrank.dense(rep2), expect, rtol=1e-5, atol=1e-6)


def test_ops_are_jittable_and_vmappable():
    reps = jax.vmap(lambda s: _random_rep(jax.random.PRNGKey(s), dtype=jnp.float32))(
        jnp.arange(3))
    v = jnp.ones((3, 12), jnp.float32)
    out = jax.jit(jax.vmap(lowrank.matvec))(reps, v)
    assert out.shape == (3, 12)
    inv = jax.jit(jax.vmap(lowrank.inverse))(reps)
    assert inv.Ut.shape == (3, 8, 12)
    assert inv.U.shape == (3, 12, 8)  # math-orientation view property


def test_diag_of_matches_dense():
    rep = _random_rep(jax.random.PRNGKey(7))
    np.testing.assert_allclose(lowrank.diag_of(rep),
                               np.diag(np.asarray(lowrank.dense(rep))),
                               rtol=1e-12, atol=1e-12)
