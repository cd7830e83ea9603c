"""Image quality metrics: PSNR, SSIM, LPIPS.

Parity: the reference computes skimage PSNR/SSIM on uint8 CHW images and
VGG-LPIPS on [-1,1] tensors per generated image (``generate_conditional.py:
543-547``). skimage/lpips are not in the TPU image, so:

* PSNR and SSIM are implemented here in jax, matching skimage semantics
  (SSIM: 7x7 uniform window, C1=(0.01 L)^2, C2=(0.03 L)^2, channel-averaged
  for multichannel, crop-valid convolution) — verified against skimage's
  documented behaviour in tests,
* LPIPS uses a converted VGG16 backbone when weights are available (see
  ``lpips_fn``); otherwise it degrades to a clearly-flagged proxy so result
  files stay schema-compatible.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(ref: jnp.ndarray, img: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over all axes except a leading batch axis
    (if both inputs are batched CHW, returns (B,))."""
    ref = jnp.asarray(ref, jnp.float32)
    img = jnp.asarray(img, jnp.float32)
    axes = tuple(range(ref.ndim - 3, ref.ndim)) if ref.ndim >= 3 else None
    mse = jnp.mean((ref - img) ** 2, axis=axes)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Valid-mode uniform filter over the last two axes."""
    k = jnp.ones((win, win), x.dtype) / (win * win)
    lead = x.shape[:-2]
    flat = x.reshape((-1, 1) + x.shape[-2:])
    # HIGHEST: the TPU default decomposes f32 convs into bf16 passes (~1e-3
    # relative), which is visible at SSIM's reported precision; this is a
    # metric, not a hot path
    out = jax.lax.conv_general_dilated(flat, k[None, None], (1, 1), "VALID",
                                       precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + out.shape[-2:])


def ssim(ref: jnp.ndarray, img: jnp.ndarray, data_range: float = 255.0,
         win_size: int = 7, channel_axis: Optional[int] = None,
         K1: float = 0.01, K2: float = 0.03) -> jnp.ndarray:
    """Structural similarity, skimage-compatible defaults (uniform window,
    sample covariance normalisation N/(N-1), mean over the valid region).

    ref/img: (..., H, W) or with a channel axis given by ``channel_axis``
    (channels are averaged, as skimage does for multichannel).
    """
    ref = jnp.asarray(ref, jnp.float32)
    img = jnp.asarray(img, jnp.float32)
    if channel_axis is not None:
        ref = jnp.moveaxis(ref, channel_axis, 0)
        img = jnp.moveaxis(img, channel_axis, 0)

    ux = _uniform_filter(ref, win_size)
    uy = _uniform_filter(img, win_size)
    uxx = _uniform_filter(ref * ref, win_size)
    uyy = _uniform_filter(img * img, win_size)
    uxy = _uniform_filter(ref * img, win_size)
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)
         / ((ux**2 + uy**2 + C1) * (vx + vy + C2)))
    # skimage crops (win_size-1)//2 off each side of its FULL-size S map
    # before averaging; the VALID-mode convolution above has already produced
    # exactly that cropped region, so no further crop is applied (a second
    # crop here used to shrink the mean to the (H-4p, W-4p) interior and
    # shift every reported SSIM off skimage's value).
    return jnp.mean(S)


_LPIPS_CACHE = {}


def lpips_fn(net: str = "vgg"):
    """Return lpips(a, b) -> float (batch mean) on [-1,1] NCHW images.

    Resolution order:

    1. the native JAX LPIPS (``metrics/lpips_jax.py``: VGG16 backbone + the
       official linear heads, oracle-tested against a torch implementation)
       when a converted weight file exists — set env ``LPIPS_WEIGHTS`` to the
       npz produced by ``lpips_jax.convert_torch_weights``,
    2. the ``lpips`` pip package, if installed (it is not in the TPU image),
    3. a clearly-flagged perceptual proxy (multi-scale gradient similarity)
       so pipelines keep running — NOT comparable to published LPIPS numbers
       and marked by ``fn.is_proxy`` (and ``lpips_is_proxy`` in results.json).
    """
    if net in _LPIPS_CACHE:
        return _LPIPS_CACHE[net]

    fn = None
    from free_hunch_tpu.metrics import lpips_jax

    native = lpips_jax.make_lpips()
    if native is not None:
        def fn(a, b):
            return float(jnp.mean(native(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32))))

        fn.is_proxy = False
    if fn is None:
        try:
            import lpips as _lpips  # pragma: no cover - not in the TPU image
            import torch

            loss = _lpips.LPIPS(net=net)

            def fn(a, b):
                with torch.no_grad():
                    out = loss(torch.from_numpy(np.asarray(a, np.float32)),
                               torch.from_numpy(np.asarray(b, np.float32)))
                return float(out.mean())

            fn.is_proxy = False
        except Exception:
            def fn(a, b):
                return float(_perceptual_proxy(jnp.asarray(a), jnp.asarray(b)))

            fn.is_proxy = True
    _LPIPS_CACHE[net] = fn
    return fn


def _perceptual_proxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale normalised feature distance as a stand-in perceptual metric
    (gradient magnitudes at 3 dyadic scales). Monotone with distortion but not
    LPIPS-calibrated."""
    def feats(x):
        fs = []
        for _ in range(3):
            gx = x[..., :, 1:] - x[..., :, :-1]
            gy = x[..., 1:, :] - x[..., :-1, :]
            fs.append(jnp.mean(gx**2) + jnp.mean(gy**2))
            x = 0.25 * (x[..., ::2, ::2] + x[..., 1::2, ::2]
                        + x[..., ::2, 1::2] + x[..., 1::2, 1::2])
        return jnp.stack(fs)

    fa, fb = feats(a), feats(b)
    return jnp.mean(jnp.abs(fa - fb) / (fa + fb + 1e-8)) + 0.5 * jnp.mean(
        (a - b) ** 2)
