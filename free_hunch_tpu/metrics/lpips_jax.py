"""LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

Parity: the reference computes VGG-LPIPS per generated image with the
``lpips`` package (``generate_conditional.py:543-547``). Neither ``lpips``
nor ``torchvision`` is in the TPU image, so the metric is implemented here
natively: the torchvision VGG16 feature stack (convs + relu + maxpool up to
relu5_3) with the official LPIPS input scaling layer, unit-normalised
feature differences, and the five 1x1 linear heads — exactly the
architecture of richzhang/PerceptualSimilarity ``lpips.LPIPS(net='vgg')``.

Weights load from a single ``.npz`` produced by :func:`convert_torch_weights`
from the two upstream state dicts (torchvision ``vgg16`` ``features.*`` and
the LPIPS ``lins.*.model.1.weight`` heads). Point ``LPIPS_WEIGHTS`` at the
file (or pass ``weights_path``). The implementation is oracle-tested against
a from-scratch torch LPIPS with shared random weights to <1e-5
(tests/test_lpips.py), so real weight files produce real LPIPS numbers.

TPU notes: convolutions run as XLA HLO (MXU); inputs are NCHW f32 in [-1,1].
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices and their output channels
VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# maxpool positions inside .features that precede a LPIPS tap region
VGG16_POOL_AFTER = {2, 7, 14, 21}   # pool after the relu of these convs
# convs whose relu output is an LPIPS feature tap (relu1_2 ... relu5_3)
VGG16_TAPS = (2, 7, 14, 21, 28)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# official scaling layer constants (PerceptualSimilarity lpips/lpips.py)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def convert_torch_weights(vgg_features_state: Dict[str, "np.ndarray"],
                          lin_heads: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Build the LPIPS_WEIGHTS npz dict from upstream tensors.

    vgg_features_state: ``{'<idx>.weight': OIHW, '<idx>.bias': (O,)}`` for the
    13 conv indices of torchvision ``vgg16().features`` (keys may also carry a
    ``features.`` prefix). lin_heads: ``{'lins.<i>.model.1.weight': (1,C,1,1)}``
    (or ``lin<i>``) for i in 0..4 — the official LPIPS linear heads.
    """
    out = {}
    for idx in VGG16_CONV_IDS:
        for base in (f"{idx}", f"features.{idx}"):
            wk, bk = f"{base}.weight", f"{base}.bias"
            if wk in vgg_features_state:
                out[f"conv{idx}_w"] = np.asarray(vgg_features_state[wk], np.float32)
                out[f"conv{idx}_b"] = np.asarray(vgg_features_state[bk], np.float32)
                break
        else:
            raise KeyError(f"missing vgg16 features conv {idx} weights")
    for i in range(5):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}", f"lins.{i}.weight"):
            if key in lin_heads:
                w = np.asarray(lin_heads[key], np.float32).reshape(-1)
                if w.shape[0] != TAP_CHANNELS[i]:
                    raise ValueError(f"lin head {i}: expected {TAP_CHANNELS[i]} "
                                     f"channels, got {w.shape[0]}")
                out[f"lin{i}"] = w
                break
        else:
            raise KeyError(f"missing LPIPS linear head {i}")
    return out


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + jnp.asarray(b)[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _vgg_taps(params, x):
    """Run the VGG16 feature stack, returning the 5 LPIPS tap activations."""
    taps = []
    for idx in VGG16_CONV_IDS:
        x = jax.nn.relu(_conv(x, params[f"conv{idx}_w"], params[f"conv{idx}_b"]))
        if idx in VGG16_TAPS:
            taps.append(x)
        if idx in VGG16_POOL_AFTER:
            x = _maxpool2(x)
    return taps


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True))
    return f / (norm + eps)


def lpips_forward(params: Dict[str, jnp.ndarray], a: jnp.ndarray,
                  b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per sample. a, b: (B, 3, H, W) in [-1, 1]."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fa = _vgg_taps(params, (a - shift) / scale)
    fb = _vgg_taps(params, (b - shift) / scale)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(x) - _unit_normalize(y)) ** 2
        w = jnp.asarray(params[f"lin{i}"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(-2, -1))
    return total


def load_weights(weights_path: Optional[str] = None) -> Optional[Dict[str, np.ndarray]]:
    """Load the converted npz (env LPIPS_WEIGHTS or explicit path); None if
    absent/unreadable."""
    path = weights_path or os.environ.get("LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    blob = np.load(path)
    needed = ([f"conv{i}_w" for i in VGG16_CONV_IDS]
              + [f"conv{i}_b" for i in VGG16_CONV_IDS]
              + [f"lin{i}" for i in range(5)])
    if not all(k in blob for k in needed):
        return None
    return {k: np.asarray(blob[k], np.float32) for k in needed}


def make_lpips(weights_path: Optional[str] = None):
    """Return a jitted ``lpips(a, b) -> (B,) distances`` or None when no
    weights are available."""
    params = load_weights(weights_path)
    if params is None:
        return None
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    return jax.jit(lambda a, b: lpips_forward(jparams, a, b))
