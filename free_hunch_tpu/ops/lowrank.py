"""Fixed-capacity symmetric low-rank-plus-diagonal matrices: ``diag(a) + U M U^T``.

This is the TPU-native replacement for the reference's covariance
representation (``conditioning_utils/online_update_bfgs.py``), which stores
``diag + UU^T - VV^T`` in **complex128 on the CPU** and re-materialises square
roots of indefinite k x k matrices with ``scipy.linalg.sqrtm`` so that the
inner weights can be folded into the columns. We keep the k x k inner matrix
``M`` *explicit* instead, which

* removes complex arithmetic and matrix square roots entirely (a BFGS update
  appends two columns with inner weights of either sign — no sqrt needed),
* keeps every matvec a pair of (K, d) matmuls — MXU/VPU-native f32,
* makes the representation a fixed-shape pytree (capacity K, ``k`` active
  columns, inactive columns zero / inactive inner block identity), so it can
  live in a ``lax.scan`` carry.

Memory layout (TPU-critical): the factor is stored TRANSPOSED, ``Ut`` of
shape (K, d) holding the columns of the mathematical U as rows. TPU tiles
pad the two minor dimensions to (8 sublanes, 128 lanes); a (d, K) array with
K ~ 34 pads the lane dimension 34 -> 128 and every factor read then streams
3.8x the useful bytes (measured: the CG-body factor dots ran at the HBM
roofline *of the padded size*, docs/bench/op_profile_full.json). With (K, d)
the lane dimension is d (a multiple of 128 for image states) and only the
sublane dimension pads (34 -> 40, 18%): the hottest guidance ops get ~3.2x
cheaper and the carried state drops ~3.2x in physical HBM.

Equivalences are tested against dense linear algebra in
``tests/test_lowrank.py`` and against the reference update math in
``tests/test_covariance.py``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _highest_precision(fn):
    """Run the wrapped op's matmuls at full f32 precision. The TPU default
    decomposes f32 matmuls into bf16 passes (~1e-3 relative error); the
    covariance state algebra feeds the BFGS recursion, where that noise
    accumulates across steps (measured: the 80-step linear-Gaussian oracle
    is stable on CPU f32 and diverged on TPU at default precision). These
    are (K, d) / (K, K) ops — full-precision passes are a negligible
    fraction of step time."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


class LowRank(NamedTuple):
    """Symmetric d x d matrix ``diag(diag) + Ut.T @ M @ Ut``.

    diag: (d,), Ut: (K, d) — mathematical U columns stored as rows, rows
    >= k identically zero, M: (K, K) symmetric with the inactive block equal
    to (+/-) identity, k: () int32 — number of active columns.
    """
    diag: jnp.ndarray
    Ut: jnp.ndarray
    M: jnp.ndarray
    k: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.Ut.shape[-2]

    @property
    def U(self) -> jnp.ndarray:
        """Mathematical (d, K) factor (a transposed view; prefer Ut in
        compute paths so XLA keeps the lane-major layout)."""
        return jnp.swapaxes(self.Ut, -1, -2)


def init(diag: jnp.ndarray, capacity: int) -> LowRank:
    d = diag.shape[0]
    dtype = diag.dtype
    return LowRank(
        diag=diag,
        Ut=jnp.zeros((capacity, d), dtype),
        M=jnp.eye(capacity, dtype=dtype),
        k=jnp.asarray(0, jnp.int32),
    )


@_highest_precision
def matvec(rep: LowRank, v: jnp.ndarray) -> jnp.ndarray:
    """(diag(a) + U M U^T) @ v for v of shape (d,) or (d, m)."""
    core = rep.Ut.T @ (rep.M @ (rep.Ut @ v))
    if v.ndim == 1:
        return rep.diag * v + core
    return rep.diag[:, None] * v + core


@_highest_precision
def diag_of(rep: LowRank) -> jnp.ndarray:
    """Exact diagonal of the represented matrix:
    diag(A)_i = a_i + sum_{jk} U_ij M_jk U_ik = a_i + sum_j Ut_ji (M Ut)_ji.
    2·K·d FLOPs — cheap enough to recompute per guidance call."""
    return rep.diag + jnp.einsum("kd,kd->d", rep.Ut, rep.M @ rep.Ut)


def _sym(a: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (a + a.T)


def _inv_sym(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (possibly indefinite) symmetric k x k matrix."""
    return _sym(jnp.linalg.inv(a))


@_highest_precision
def inverse(rep: LowRank) -> LowRank:
    """Woodbury: (D + U M U^T)^-1 = D^-1 + (D^-1 U) Mi (D^-1 U)^T with
    Mi = -(M^-1 + U^T D^-1 U)^-1. Inactive columns stay zero; the inactive
    inner block stays (-)identity, preserving the representation invariant."""
    diag_inv = 1.0 / rep.diag
    Uit = rep.Ut * diag_inv[None, :]  # rows of D^-1 U
    inner = _inv_sym(rep.M) + _sym(rep.Ut @ Uit.T)
    Mi = -_inv_sym(inner)
    return LowRank(diag=diag_inv, Ut=Uit, M=Mi, k=rep.k)


def shift_diag(rep: LowRank, c) -> LowRank:
    """Representation of (A + c I)."""
    return rep._replace(diag=rep.diag + c)


def scale(rep: LowRank, alpha) -> LowRank:
    """Representation of (alpha * A)."""
    return LowRank(diag=rep.diag * alpha, Ut=rep.Ut, M=rep.M * alpha, k=rep.k)


def affine(rep: LowRank, alpha, beta) -> LowRank:
    """Representation of (alpha * A + beta * I)."""
    return LowRank(diag=rep.diag * alpha + beta, Ut=rep.Ut, M=rep.M * alpha,
                   k=rep.k)


@_highest_precision
def dense(rep: LowRank) -> jnp.ndarray:
    """Materialise the full matrix (tests / tiny dims only)."""
    return jnp.diag(rep.diag) + rep.Ut.T @ rep.M @ rep.Ut


@_highest_precision
def compress(rep: LowRank, target_rank: int) -> LowRank:
    """Optimal rank truncation of the low-rank part: keep the ``target_rank``
    eigen-directions of U M U^T with the largest |eigenvalue|.

    Replaces the reference's ``drop_vectors`` keep-the-most-recent heuristic
    (``online_update_bfgs.py:233-245``) with the best rank-r approximation:
    with G = U^T U = L L^T (Cholesky), eigendecomposing H = L^T M L =
    Q Lam Q^T gives U M U^T = W Lam W^T with exactly orthonormal
    W = U L^-T Q, so truncating Lam is optimal in any unitarily-invariant
    norm. All dense work is K x K; the only d-sized op is one (K,K) x (K,d)
    matmul. Inactive (zero) columns sort to |lam| ~ 0 and fall out naturally.
    """
    K = rep.capacity
    dtype = rep.diag.dtype
    G = _sym(rep.Ut @ rep.Ut.T)
    jitter = (jnp.trace(G) / K) * 1e-7 + jnp.asarray(1e-30, dtype)
    L = jnp.linalg.cholesky(G + jitter * jnp.eye(K, dtype=dtype))
    H = _sym(L.T @ rep.M @ L)
    lam, Q = jnp.linalg.eigh(H)
    # W^T = Q^T L^-1 U^T, orthonormal rows (the transposed storage of W)
    Wt = Q.T @ jax.scipy.linalg.solve_triangular(L, rep.Ut, lower=True)
    # order by |eigenvalue| descending; keep at most target_rank, and drop
    # negligible ones outright (their 1/lambda would poison later Woodbury
    # solves)
    order = jnp.argsort(-jnp.abs(lam))
    lam_sorted = lam[order]
    Wt_sorted = Wt[order, :]
    strong = jnp.abs(lam_sorted) > 1e-6 * jnp.abs(lam_sorted[0]) + jnp.finfo(dtype).tiny
    col_mask = jnp.logical_and(jnp.arange(K) < target_rank, strong)
    k_new = jnp.sum(col_mask).astype(jnp.int32)
    Ut_new = jnp.where(col_mask[:, None], Wt_sorted, 0.0)
    M_new = jnp.diag(jnp.where(col_mask, lam_sorted, 1.0))
    return LowRank(diag=rep.diag, Ut=Ut_new.astype(dtype), M=M_new.astype(dtype),
                   k=k_new)


def append_pair(rep: LowRank, col_a: jnp.ndarray, w_a, col_b: jnp.ndarray, w_b) -> LowRank:
    """Representation of (A + w_a a a^T + w_b b b^T).

    Columns are unit-normalised (norms absorbed into the inner weights) for
    conditioning. If capacity would overflow, the low-rank part is first
    compressed to the best (capacity-2)-rank approximation (see ``compress``).
    """
    rep = lax.cond(rep.k + 2 > rep.capacity,
                   lambda r: compress(r, r.capacity - 2), lambda r: r, rep)
    k = rep.k

    def norm_absorb(col, w):
        n2 = jnp.sum(col * col)
        n = jnp.sqrt(jnp.maximum(n2, jnp.finfo(col.dtype).tiny))
        return col / n, w * n2

    ca, wa = norm_absorb(col_a, w_a)
    cb, wb = norm_absorb(col_b, w_b)

    zero = jnp.zeros((), k.dtype)
    Ut = lax.dynamic_update_slice(rep.Ut, ca[None, :], (k, zero))
    Ut = lax.dynamic_update_slice(Ut, cb[None, :], (k + 1, zero))
    # The inactive block of M is diagonal, so overwriting the two diagonal
    # entries is a complete update.
    M = rep.M.at[k, k].set(wa).at[k + 1, k + 1].set(wb)
    return LowRank(diag=rep.diag, Ut=Ut, M=M, k=k + 2)
