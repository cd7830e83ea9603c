"""Orthonormal 2-D DCT-II / DCT-III as dense matmuls.

The reference uses ``torch_dct`` (itself matmul/FFT based) for the DCT-basis
covariance (``conditioning_utils/online_update_bfgs.py:351-374``). On TPU a
dense-matrix DCT is the right call: for 256x256 images the transform is two
256x256x256 matmuls per channel, which map directly onto the MXU and fuse with
the surrounding low-rank covariance matvec under XLA. An FFT-based DCT would
bounce through complex64 on the VPU instead.

Matrices are cached per (size, dtype); transforms operate on the last two axes
of arbitrarily-batched inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dct_matrix_np(n: int) -> np.ndarray:
    # Orthonormal DCT-II matrix: C[k, m] = s_k * cos(pi * (2m + 1) * k / (2n)).
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    mat = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0] *= np.sqrt(0.5)
    return mat.astype(np.float64)


def dct_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """The (n, n) orthonormal DCT-II matrix C, so dct(x) = C @ x."""
    return jnp.asarray(_dct_matrix_np(n), dtype=dtype)


# Basis transforms run at HIGHEST matmul precision: the TPU's default f32
# matmul decomposes into bf16 passes (~1e-3 relative error), and a DCT basis
# change feeds the BFGS secant pairs — at fine step counts the resulting
# noise in no-information pairs random-walks the covariance state (measured:
# the 80-step linear-Gaussian oracle is stable on CPU f32 and diverges on
# TPU at default precision). These are (256, 256) matmuls; full-precision
# passes cost ~3x on a negligible fraction of step time.
_PREC = jax.lax.Precision.HIGHEST


def dct_2d(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Type-II DCT over the last two axes (norm='ortho' only)."""
    assert norm == "ortho"
    h, w = x.shape[-2], x.shape[-1]
    ch = dct_matrix(h, x.dtype)
    cw = dct_matrix(w, x.dtype)
    # C_h @ x @ C_w^T on the trailing axes.
    y = jnp.einsum("km,...mw->...kw", ch, x, precision=_PREC)
    return jnp.einsum("...kw,lw->...kl", y, cw, precision=_PREC)


def idct_2d(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Type-III DCT (inverse of dct_2d) over the last two axes."""
    assert norm == "ortho"
    h, w = x.shape[-2], x.shape[-1]
    ch = dct_matrix(h, x.dtype)
    cw = dct_matrix(w, x.dtype)
    y = jnp.einsum("mk,...mw->...kw", ch, x, precision=_PREC)  # C_h^T @ x
    return jnp.einsum("...kw,wl->...kl", y, cw, precision=_PREC)  # ... @ C_w


def dct_1d(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Orthonormal DCT-II along one axis."""
    x = jnp.moveaxis(x, axis, -1)
    c = dct_matrix(x.shape[-1], x.dtype)
    y = jnp.einsum("...m,km->...k", x, c, precision=_PREC)
    return jnp.moveaxis(y, -1, axis)


def idct_1d(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Orthonormal DCT-III (inverse DCT-II) along one axis."""
    x = jnp.moveaxis(x, axis, -1)
    c = dct_matrix(x.shape[-1], x.dtype)
    y = jnp.einsum("...m,mk->...k", x, c, precision=_PREC)
    return jnp.moveaxis(y, -1, axis)
