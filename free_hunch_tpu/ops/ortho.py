"""Orthogonal-transform registry + lazy diagonal covariances.

Parity: reference ``conditioning_utils/utils.py`` — ``OrthoTransform:50``
(identity-by-default wrapper), the registry with 'dct' (:88) and 'dwt' Haar
wavelets (:106, via pywt upstream), and ``LazyOTCovariance:146``
(W diag(v) W^T).

TPU redesign: DCT is the matmul transform from ``ops.dct``; the Haar DWT is
implemented directly as jittable average/difference butterflies over the last
two axes (pywt is not in the image, and a gather-free formulation fuses under
XLA anyway). Transforms are linear and orthonormal; adjoint == inverse.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from free_hunch_tpu.ops.dct import dct_2d, idct_2d

__OT__ = {}


def register_ot(name: str):
    def wrapper(factory):
        __OT__[name] = factory
        return factory
    return wrapper


class OrthoTransform:
    """Callable transform with ``.inv``; identity when no type is given
    (reference :50-67)."""

    def __init__(self, ortho_tf_type: Optional[str] = None, **kwargs):
        self.ortho_tf_type = ortho_tf_type
        if ortho_tf_type is not None:
            self._fwd, self._inv = __OT__[ortho_tf_type](**kwargs)

    def __call__(self, x):
        if self.ortho_tf_type is None:
            return x
        return self._fwd(x)

    def inv(self, x):
        if self.ortho_tf_type is None:
            return x
        return self._inv(x)


@register_ot("dct")
def _dct_factory():
    return dct_2d, idct_2d


def haar_dwt2(x: jnp.ndarray, level: int = 3) -> jnp.ndarray:
    """Orthonormal 2-D Haar wavelet decomposition over the last two axes,
    stored in the standard nested quadrant layout (LL in the top-left)."""
    h, w = x.shape[-2], x.shape[-1]
    out = x
    size_h, size_w = h, w
    for _ in range(level):
        sub = out[..., :size_h, :size_w]
        a = sub[..., 0::2, :]
        b = sub[..., 1::2, :]
        lo_r = (a + b) / jnp.sqrt(2.0)
        hi_r = (a - b) / jnp.sqrt(2.0)
        rows = jnp.concatenate([lo_r, hi_r], axis=-2)
        a = rows[..., :, 0::2]
        b = rows[..., :, 1::2]
        lo_c = (a + b) / jnp.sqrt(2.0)
        hi_c = (a - b) / jnp.sqrt(2.0)
        sub = jnp.concatenate([lo_c, hi_c], axis=-1)
        out = out.at[..., :size_h, :size_w].set(sub)
        size_h //= 2
        size_w //= 2
    return out


def haar_idwt2(x: jnp.ndarray, level: int = 3) -> jnp.ndarray:
    """Inverse of ``haar_dwt2``."""
    h, w = x.shape[-2], x.shape[-1]
    out = x
    sizes = [(h >> i, w >> i) for i in range(level)][::-1]
    for size_h, size_w in sizes:
        sub = out[..., :size_h, :size_w]
        half_w = size_w // 2
        lo_c = sub[..., :, :half_w]
        hi_c = sub[..., :, half_w:]
        a = (lo_c + hi_c) / jnp.sqrt(2.0)
        b = (lo_c - hi_c) / jnp.sqrt(2.0)
        rows = jnp.stack([a, b], axis=-1).reshape(sub.shape)
        half_h = size_h // 2
        lo_r = rows[..., :half_h, :]
        hi_r = rows[..., half_h:, :]
        a = (lo_r + hi_r) / jnp.sqrt(2.0)
        b = (lo_r - hi_r) / jnp.sqrt(2.0)
        sub = jnp.stack([a, b], axis=-2).reshape(rows.shape)
        out = out.at[..., :size_h, :size_w].set(sub)
    return out


@register_ot("dwt")
def _dwt_factory(level: int = 3, wavelet: str = "haar"):
    assert wavelet == "haar", "only the Haar wavelet is implemented"
    return (lambda x: haar_dwt2(x, level)), (lambda x: haar_idwt2(x, level))


class LazyOTCovariance:
    """C = W^T diag(v) W for an OrthoTransform W; forward == transpose
    (reference LazyOTCovariance:146-163)."""

    def __init__(self, ortho_tf: OrthoTransform, variance: jnp.ndarray):
        self.ortho_tf = ortho_tf
        self.variance = variance

    def __call__(self, x):
        return self.ortho_tf.inv(self.variance * self.ortho_tf(x))

    forward = __call__
    transpose = __call__
