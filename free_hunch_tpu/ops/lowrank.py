"""Fixed-capacity symmetric low-rank-plus-diagonal matrices: ``diag(a) + U M U^T``.

This is the TPU-native replacement for the reference's covariance
representation (``conditioning_utils/online_update_bfgs.py``), which stores
``diag + UU^T - VV^T`` in **complex128 on the CPU** and re-materialises square
roots of indefinite k x k matrices with ``scipy.linalg.sqrtm`` so that the
inner weights can be folded into the columns. We keep the k x k inner matrix
``M`` *explicit* instead, which

* removes complex arithmetic and matrix square roots entirely (a BFGS update
  appends two columns with inner weights of either sign — no sqrt needed),
* keeps every matvec a pair of (d, K) matmuls — MXU-native f32,
* makes the representation a fixed-shape pytree (capacity K, ``k`` active
  columns, inactive columns zero / inactive inner block identity), so it can
  live in a ``lax.scan`` carry.

Equivalences are tested against dense linear algebra in
``tests/test_lowrank.py`` and against the reference update math in
``tests/test_covariance.py``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class LowRank(NamedTuple):
    """Symmetric d x d matrix ``diag(diag) + U @ M @ U.T``.

    diag: (d,), U: (d, K) with columns >= k identically zero,
    M: (K, K) symmetric with the inactive block equal to (+/-) identity,
    k: () int32 — number of active columns.
    """
    diag: jnp.ndarray
    U: jnp.ndarray
    M: jnp.ndarray
    k: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.U.shape[-1]


def init(diag: jnp.ndarray, capacity: int) -> LowRank:
    d = diag.shape[0]
    dtype = diag.dtype
    return LowRank(
        diag=diag,
        U=jnp.zeros((d, capacity), dtype),
        M=jnp.eye(capacity, dtype=dtype),
        k=jnp.asarray(0, jnp.int32),
    )


def matvec(rep: LowRank, v: jnp.ndarray) -> jnp.ndarray:
    """(diag(a) + U M U^T) @ v for v of shape (d,) or (d, m)."""
    core = rep.U @ (rep.M @ (rep.U.T @ v))
    if v.ndim == 1:
        return rep.diag * v + core
    return rep.diag[:, None] * v + core


def _sym(a: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (a + a.T)


def _inv_sym(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (possibly indefinite) symmetric k x k matrix."""
    return _sym(jnp.linalg.inv(a))


def inverse(rep: LowRank) -> LowRank:
    """Woodbury: (D + U M U^T)^-1 = D^-1 + (D^-1 U) Mi (D^-1 U)^T with
    Mi = -(M^-1 + U^T D^-1 U)^-1. Inactive columns stay zero; the inactive
    inner block stays (-)identity, preserving the representation invariant."""
    diag_inv = 1.0 / rep.diag
    Ui = diag_inv[:, None] * rep.U
    inner = _inv_sym(rep.M) + _sym(rep.U.T @ Ui)
    Mi = -_inv_sym(inner)
    return LowRank(diag=diag_inv, U=Ui, M=Mi, k=rep.k)


def shift_diag(rep: LowRank, c) -> LowRank:
    """Representation of (A + c I)."""
    return rep._replace(diag=rep.diag + c)


def scale(rep: LowRank, alpha) -> LowRank:
    """Representation of (alpha * A)."""
    return LowRank(diag=rep.diag * alpha, U=rep.U, M=rep.M * alpha, k=rep.k)


def affine(rep: LowRank, alpha, beta) -> LowRank:
    """Representation of (alpha * A + beta * I)."""
    return LowRank(diag=rep.diag * alpha + beta, U=rep.U, M=rep.M * alpha, k=rep.k)


def dense(rep: LowRank) -> jnp.ndarray:
    """Materialise the full matrix (tests / tiny dims only)."""
    return jnp.diag(rep.diag) + rep.U @ rep.M @ rep.U.T


def _evict_two(rep: LowRank) -> LowRank:
    """Drop the two oldest columns (ring shift) to make room for an append.

    Matches the reference's ``drop_vectors`` keep-the-most-recent semantics
    (``online_update_bfgs.py:233-245``) with static shapes.
    """
    K = rep.capacity
    U = jnp.roll(rep.U, -2, axis=1).at[:, K - 2:].set(0.0)
    M = jnp.roll(rep.M, (-2, -2), axis=(0, 1))
    # Reset the vacated rows/cols to the identity pattern.
    M = M.at[K - 2:, :].set(0.0).at[:, K - 2:].set(0.0)
    M = M.at[K - 2, K - 2].set(1.0).at[K - 1, K - 1].set(1.0)
    return LowRank(diag=rep.diag, U=U, M=M, k=rep.k - 2)


def append_pair(rep: LowRank, col_a: jnp.ndarray, w_a, col_b: jnp.ndarray, w_b) -> LowRank:
    """Representation of (A + w_a a a^T + w_b b b^T).

    Columns are unit-normalised (norms absorbed into the inner weights) for
    conditioning. If capacity would overflow, the two oldest columns are
    evicted first.
    """
    rep = lax.cond(rep.k + 2 > rep.capacity, _evict_two, lambda r: r, rep)
    k = rep.k

    def norm_absorb(col, w):
        n2 = jnp.sum(col * col)
        n = jnp.sqrt(jnp.maximum(n2, jnp.finfo(col.dtype).tiny))
        return col / n, w * n2

    ca, wa = norm_absorb(col_a, w_a)
    cb, wb = norm_absorb(col_b, w_b)

    zero = jnp.zeros((), k.dtype)
    U = lax.dynamic_update_slice(rep.U, ca[:, None], (zero, k))
    U = lax.dynamic_update_slice(U, cb[:, None], (zero, k + 1))
    # The inactive block of M is diagonal, so overwriting the two diagonal
    # entries is a complete update.
    M = rep.M.at[k, k].set(wa).at[k + 1, k + 1].set(wb)
    return LowRank(diag=rep.diag, U=U, M=M, k=k + 2)
