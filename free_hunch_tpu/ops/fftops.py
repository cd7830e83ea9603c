"""FFT-diagonalised convolution helpers for the measurement operators.

Parity: reference ``measurement_utils/utils_sisr.py`` (``p2o:22``,
``pre_calculate:79``, ``upsample:44``, ``downsample:55``, ``splits:9``,
``data_solution:65``). All functions are jittable; FFTs run as XLA complex64
ops on TPU. Arrays are NCHW to match the operator math of the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pin_default_layout(x: jnp.ndarray) -> jnp.ndarray:
    """CPU-backend workaround for an XLA layout-assignment gap under GSPMD.

    With spatial model parallelism active (``UNetConfig.spatial_partition``)
    the partitioner's all-gather over the image-height dimension propagates
    an H-major layout preference into downstream fft *results*, and layout
    assignment then copies the fft operands into that non-monotonic layout —
    which the CPU thunk runtime rejects at execution time (RET_CHECK
    ``xla/backends/cpu/runtime/fft_thunk.cc:167`` IsMonotonicWithDim0Major).
    Pinning both the operand and the result of every 2-D fft to the default
    major-to-minor layout breaks that propagation chain; where the default
    layout was already chosen this is a no-op. Strictly CPU-gated: the TPU
    fft lowering takes a different path (and the axon AOT pipeline rejects
    LayoutConstraint custom-calls on complex operands).
    """
    if jax.default_backend() != "cpu" or x.ndim <= 1:
        return x
    from jax.experimental.layout import Layout, with_layout_constraint
    return with_layout_constraint(
        x, Layout(major_to_minor=tuple(range(x.ndim))))


def fft2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    """``jnp.fft.fft2`` with default-layout pinning (see _pin_default_layout)."""
    return _pin_default_layout(jnp.fft.fft2(_pin_default_layout(x), **kw))


def ifft2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    return _pin_default_layout(jnp.fft.ifft2(_pin_default_layout(x), **kw))


def rfft2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    return _pin_default_layout(jnp.fft.rfft2(_pin_default_layout(x), **kw))


def irfft2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    return _pin_default_layout(jnp.fft.irfft2(_pin_default_layout(x), **kw))


def fftn2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    """``jnp.fft.fftn`` over the last two axes, layout-pinned."""
    return _pin_default_layout(
        jnp.fft.fftn(_pin_default_layout(x), axes=(-2, -1), **kw))


def ifftn2(x: jnp.ndarray, **kw) -> jnp.ndarray:
    return _pin_default_layout(
        jnp.fft.ifftn(_pin_default_layout(x), axes=(-2, -1), **kw))


def p2o_np(psf, shape):
    """Host-numpy twin of ``p2o`` for operator setup: OTF constants are
    computed on the host so jitted samplers embed them without any
    device->host readback (remote TPU backends may not support those)."""
    import numpy as _np
    psf = _np.asarray(psf)
    h, w = psf.shape[-2], psf.shape[-1]
    H, W = shape
    if h > H or w > W:
        ch, cw = min(h, H), min(w, W)
        psf = psf[..., (h - ch) // 2:(h - ch) // 2 + ch,
                  (w - cw) // 2:(w - cw) // 2 + cw]
        h, w = ch, cw
    otf = _np.zeros(psf.shape[:-2] + tuple(shape), _np.complex64)
    otf[..., :h, :w] = psf
    otf = _np.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return _np.fft.fftn(otf, axes=(-2, -1)).astype(_np.complex64)


def p2o(psf: jnp.ndarray, shape) -> jnp.ndarray:
    """Point-spread function -> optical transfer function.

    Zero-pads the (..., h, w) PSF to ``shape``, rolls it so the kernel center
    sits at the origin, and FFTs. Matches ``utils_sisr.p2o``.
    """
    h, w = psf.shape[-2], psf.shape[-1]
    H, W = shape
    if h > H or w > W:
        # center-crop PSFs larger than the target grid (lets the bundled
        # 61x61 kernels drive small test resolutions; full-size images are
        # unaffected)
        ch, cw = min(h, H), min(w, W)
        psf = psf[..., (h - ch) // 2:(h - ch) // 2 + ch,
                  (w - cw) // 2:(w - cw) // 2 + cw]
        h, w = ch, cw
    otf = jnp.zeros(psf.shape[:-2] + tuple(shape), dtype=psf.dtype)
    otf = otf.at[..., :h, :w].set(psf)
    otf = jnp.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return fftn2(otf)


def upsample(x: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """s-fold zero-filling upsampler (adjoint of ``downsample``)."""
    if sf == 1:
        return x
    z = jnp.zeros(x.shape[:-2] + (x.shape[-2] * sf, x.shape[-1] * sf), dtype=x.dtype)
    return z.at[..., ::sf, ::sf].set(x)


def downsample(x: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """s-fold stride sampler keeping the upper-left pixel of each sf x sf patch."""
    if sf == 1:
        return x
    return x[..., ::sf, ::sf]


def splits(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Split (..., W, H) into sf*sf distinct blocks stacked on a new last axis.

    Returns (..., W/sf, H/sf, sf^2), matching ``utils_sisr.splits`` (chunk on
    rows first, then columns).
    """
    *lead, w, h = a.shape
    b = a.reshape(*lead, sf, w // sf, h)
    b = jnp.moveaxis(b, -3, -1)  # (..., W/sf, H, sf)
    b = b.reshape(*lead, w // sf, sf, h // sf, b.shape[-1])
    b = jnp.moveaxis(b, -3, -1)  # (..., W/sf, H/sf, sf, sf)
    return b.reshape(*lead, w // sf, h // sf, sf * sf)


def pre_calculate(x: jnp.ndarray, k: jnp.ndarray, sf: int):
    """Precompute the FFT tuple (FB, FBC, F2B, FBFy) reused across iterations.

    x: (N, C, H, W) low-resolution input, k: (N, C, h, w) kernel.
    Matches ``utils_sisr.pre_calculate``.
    """
    w, h = x.shape[-2], x.shape[-1]
    FB = p2o(k.astype(jnp.complex64), (w * sf, h * sf))
    FBC = jnp.conj(FB)
    F2B = jnp.abs(FB) ** 2
    STy = upsample(x, sf=sf)
    FBFy = FBC * fftn2(STy.astype(jnp.complex64))
    return FB, FBC, F2B, FBFy


def fft_conv(x: jnp.ndarray, FB: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution via the precomputed OTF: real(ifft2(FB * fft2(x)))."""
    return ifft2(FB * fft2(x.astype(jnp.complex64))).real.astype(x.dtype)


def fft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2-D FFT (reference measurement_utils/
    fastmri_utils.py centered helpers; used by phase retrieval)."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = fft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``fft2c``."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = ifft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def data_solution(x: jnp.ndarray, FB, FBC, F2B, FBFy, alpha, sf: int) -> jnp.ndarray:
    """Closed-form data-term proximal solution for SR/deblur half-quadratic
    splitting (reference ``utils_sisr.data_solution:65``; consumed by
    DiffPIR-style solvers)."""
    alpha = jnp.clip(jnp.asarray(alpha, jnp.float32), min=1e-2)
    FR = FBFy + fftn2((alpha * x).astype(jnp.complex64))
    x1 = FB * FR
    FBR = jnp.mean(splits(x1, sf), axis=-1)
    invW = jnp.mean(splits(F2B, sf), axis=-1)
    invWBR = FBR / (invW + alpha)
    FCBinvWBR = FBC * jnp.tile(invWBR, (1, 1, sf, sf))
    FX = (FR - FCBinvWBR) / alpha.astype(jnp.complex64)
    return ifftn2(FX).real.astype(x.dtype)
