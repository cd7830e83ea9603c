"""Int8 quantized conv/dense for the ADM UNet torso (TPU v5e int8 MXU path).

The v5e's int8 MXU peak (~394 TOP/s) is 2x its bf16 peak — the remaining
hardware lever toward the 64 samples/min north star after the bf16 kernels
reached their rooflines (BASELINE.md). This module provides drop-in
quantized equivalents of the torso's stride-1 convolutions and attention
dense layers:

* weights: symmetric per-output-channel int8 (scale = absmax/127 over the
  reduction dims), quantized from the f32 checkpoint params inside jit —
  the parameter tree and checkpoint conversion are untouched;
* activations: symmetric per-SAMPLE dynamic int8 (conv is linear per
  sample, so per-sample scales are exact bookkeeping, not approximation);
* accumulation: exact int32 on the MXU (`preferred_element_type`), dequant
  epilogue in f32;
* pullback: the guidance gradient (one UNet vjp per sampler stage —
  reference ``conditioning_utils/conditioning_mechanisms.py:280``) is ALSO
  int8 via ``jax.custom_vjp``: dx of a stride-1 conv is the conv with the
  spatially-flipped, I/O-transposed kernel, and folding the per-channel
  weight scale into the cotangent BEFORE quantizing it makes the int8
  backward an exact factorization (dx = sum_o (g_o * s_o) * wq[..., o] —
  per-channel scales cannot be factored out of the transposed reduction
  otherwise).

What stays high-precision (quantization must preserve the denoiser contract
``D(x, sigma) -> (x0_mean, x0_var)``, reference
``training/openai_preconditioning.py:167-197``): the first in_conv, the
final out_conv (zero-init, produces the learned-sigma channels that become
x0_var), all GroupNorms and softmaxes (f32 already), and the time-embedding
MLPs (vector-sized).

INFERENCE-ONLY CONTRACT: the quantized layers' backwards return ZERO for the
weight cotangent — guidance differentiates w.r.t. x only, and that is the
only differentiation the sampler performs. Training/fine-tuning through a
``quant='int8*'`` model would silently receive zero weight gradients; use the
bf16 torso (``quant=None``) for any parameter-gradient use case (also stated
at ``UNetConfig.quant``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_weight(w: jnp.ndarray, reduce_axes: Tuple[int, ...]):
    """Symmetric per-output-channel int8: returns (wq, scale).

    ``reduce_axes`` are the reduction dims (everything but the output
    channel); scale has the weight's rank with size-1 reduction dims.
    """
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def _quantize_act(x: jnp.ndarray):
    """Symmetric per-sample dynamic int8 over all non-batch dims.

    The elementwise math stays in the input dtype (bf16 torso): upcasting
    the whole activation to f32 would double the HBM bytes of the two
    quantization passes, which the op profile showed dominating the int8
    saving. bf16 holds integers up to 256 exactly, so round-to-|x|<=127 is
    exact; the scale itself is f32. (A strided-subsample abs-max was tried
    and REGRESSED — 126 → 142 ms/fwd: the TPU pays more for the strided
    slice than for the dense reduce. Exact amax it is.)
    """
    axes = tuple(range(1, x.ndim))
    amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * jnp.float32(1.0 / 127.0)
    inv = (jnp.float32(1.0) / scale).astype(x.dtype)
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return xq, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_conv(x, w, pad):
    """Stride-1 2-D conv (NHWC x HWIO), int8 MXU forward + int8 pullback.

    x: (N, H, W, I), any float dtype; w: (kh, kw, I, O) float32 master
    weights. pad: static symmetric spatial padding (k // 2).
    Returns x.dtype (N, H, W, O) — keeping the dequant epilogue and the
    cotangent stream in the torso dtype (bf16) halves the HBM bytes of
    every quantization pass relative to an f32 interface.
    """
    return _int8_conv_fwd(x, w, pad)[0]


def _int8_conv_fwd(x, w, pad):
    wq, wscale = _quantize_weight(w, reduce_axes=(0, 1, 2))  # (1,1,1,O)
    xq, ascale = _quantize_act(x)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * (ascale * wscale)).astype(x.dtype)
    # residuals: only the quantized kernel + its scale (dx needs no x)
    # dtype carried as a zero-size array (dtype objects are not JAX types)
    return out, (wq, wscale, w.shape, jnp.zeros((0,), x.dtype))


def _int8_conv_bwd(pad, res, g):
    wq, wscale, w_shape, x_dtype_probe = res
    x_dtype = x_dtype_probe.dtype
    # fold the per-output-channel scale into the cotangent, then quantize:
    # dx[nhwi] = sum_o g[o] * (wq[o] * s_o) = conv(g * s_o, wq^T) exactly.
    g_scaled = g * wscale.reshape(1, 1, 1, -1).astype(g.dtype)
    gq, gscale = _quantize_act(g_scaled)
    wqT = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))  # flip + I<->O swap
    kh = w_shape[0]
    padT = kh - 1 - pad  # adjoint padding; == pad for odd k with pad=k//2
    acc = jax.lax.conv_general_dilated(
        gq, wqT, (1, 1), [(padT, padT), (padT, padT)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    dx = (acc.astype(jnp.float32) * gscale).astype(x_dtype)
    # weight cotangent unused by guidance (vjp w.r.t. x only)
    dw = jnp.zeros(w_shape, jnp.float32)
    return dx, dw


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


@jax.custom_vjp
def int8_dense(x, w):
    """Dense (..., I) @ (I, O), int8 MXU forward + int8 pullback.
    Returns x.dtype (see int8_conv on the bf16 interface)."""
    return _int8_dense_fwd(x, w)[0]


def _int8_dense_fwd(x, w):
    wq, wscale = _quantize_weight(w, reduce_axes=(0,))  # (1, O)
    xq, ascale = _quantize_act(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * (ascale * wscale.reshape(
        (1,) * (x.ndim - 1) + (-1,)))).astype(x.dtype)
    # dtype carried as a zero-size array (dtype objects are not JAX types)
    return out, (wq, wscale, w.shape, jnp.zeros((0,), x.dtype))


def _int8_dense_bwd(res, g):
    wq, wscale, w_shape, x_dtype_probe = res
    x_dtype = x_dtype_probe.dtype
    g_scaled = g * wscale.reshape((1,) * (g.ndim - 1) + (-1,)).astype(g.dtype)
    gq, gscale = _quantize_act(g_scaled)
    acc = jax.lax.dot_general(
        gq, jnp.transpose(wq), (((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    dx = (acc.astype(jnp.float32) * gscale).astype(x_dtype)
    dw = jnp.zeros(w_shape, jnp.float32)
    return dx, dw


int8_dense.defvjp(_int8_dense_fwd, _int8_dense_bwd)


# ---------------------------------------------------------------------------
# Static activation scales (quant="int8_static").
#
# The dynamic per-sample scale needs a full-tensor abs-max REDUCE before the
# round/clip/s8 convert — a barrier that forces XLA to materialise the f32
# GroupNorm/SiLU producer chain and re-read the whole activation (the
# "abs_reduce + clamp_convert" fusion pairs in op_profile_fwd_int8.json,
# ~entirety of the int8 path's elementwise overhead; BASELINE.md names this
# as the remaining headroom). With a PRE-CALIBRATED scalar scale the convert
# fuses directly into the producer: zero extra activation passes.
#
# Scales are calibrated per (conv site, sigma stage): the FiLM time
# conditioning makes activation magnitudes sigma-dependent, but the sampler's
# sigma grid is STATIC host data, so one calibration run (models/calibrate.py)
# records the per-site abs-max at every stage and the preconditioner selects
# the stage's scale set by nearest-sigma lookup. Outlier activations beyond
# the calibrated range clip at +-127 * scale (standard static-quantization
# behaviour; error budget re-measured in docs/bench/int8_quality_ab.json).
#
# The backward cotangent stays DYNAMICALLY scaled — gradient magnitudes vary
# over orders of magnitude across stages and are not calibratable.
# ---------------------------------------------------------------------------

def _quantize_act_static(x, ascale):
    """Quantize with a precomputed scalar scale: one fused elementwise pass,
    no reduce. ascale: () f32."""
    inv = (jnp.float32(1.0) / ascale).astype(x.dtype)
    return jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_conv_static(x, w, ascale, pad):
    """``int8_conv`` with a calibrated scalar activation scale (see above).
    ascale: () f32 traced scalar (selected per sigma stage by the caller)."""
    return _int8_conv_static_fwd(x, w, ascale, pad)[0]


def _int8_conv_static_fwd(x, w, ascale, pad):
    wq, wscale = _quantize_weight(w, reduce_axes=(0, 1, 2))
    xq = _quantize_act_static(x, ascale)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * (ascale * wscale)).astype(x.dtype)
    return out, (wq, wscale, w.shape, jnp.zeros((0,), x.dtype))


def _int8_conv_static_bwd(pad, res, g):
    dx, dw = _int8_conv_bwd(pad, res, g)
    return dx, dw, jnp.zeros((), jnp.float32)


int8_conv_static.defvjp(_int8_conv_static_fwd, _int8_conv_static_bwd)


@jax.custom_vjp
def int8_dense_static(x, w, ascale):
    """``int8_dense`` with a calibrated scalar activation scale."""
    return _int8_dense_static_fwd(x, w, ascale)[0]


def _int8_dense_static_fwd(x, w, ascale):
    wq, wscale = _quantize_weight(w, reduce_axes=(0,))
    xq = _quantize_act_static(x, ascale)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * (ascale * wscale.reshape(
        (1,) * (x.ndim - 1) + (-1,)))).astype(x.dtype)
    return out, (wq, wscale, w.shape, jnp.zeros((0,), x.dtype))


def _int8_dense_static_bwd(res, g):
    dx, dw = _int8_dense_bwd(res, g)
    return dx, dw, jnp.zeros((), jnp.float32)


int8_dense_static.defvjp(_int8_dense_static_fwd, _int8_dense_static_bwd)


def _act_scale_var(module: nn.Module):
    """The per-site static activation scale, read from the 'qscales'
    collection (populated per sigma stage by the preconditioner from the
    calibration table — models/calibrate.py)."""
    return module.variable("qscales", "act_scale",
                           lambda: jnp.ones((), jnp.float32)).value


def _sow_act_amax(module: nn.Module, x):
    """Calibration mode: record this site's batch abs-max into the mutable
    'qstats' collection (reduced with max across sows)."""
    amax = jnp.max(jnp.abs(x).astype(jnp.float32))
    module.sow("qstats", "amax", amax,
               init_fn=lambda: jnp.zeros((), jnp.float32),
               reduce_fn=jnp.maximum)


class QuantConv(nn.Module):
    """Drop-in replacement for the torso ``nn.Conv``: same param names
    ('kernel' HWIO, 'bias') and f32 master weights, int8 compute path.

    Stride-1 only — the flagship topology (``resblock_updown=True``)
    downsamples via avg-pool + stride-1 convs, so every torso conv
    qualifies. QuantConv itself has no stride parameter; stride!=1 call
    sites fall back to the bf16 ``nn.Conv`` inside ``models/unet._conv``
    (only reachable with ``resblock_updown=False`` topologies).

    mode: 'dynamic' — per-sample activation scales computed in-graph;
          'static'  — calibrated per-(site, sigma-stage) scalar scales read
                      from the 'qscales' collection (see module docstring);
          'calib'   — dynamic compute + sow per-site abs-max into 'qstats'.
    """
    features: int
    kernel_size: int = 3
    zero_init: bool = False
    dtype: jnp.dtype = jnp.bfloat16  # output cast (torso compute dtype)
    mode: str = "dynamic"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        init = (nn.initializers.zeros_init() if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, (k, k, x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        xc = x.astype(self.dtype)
        if self.mode == "static":
            out = int8_conv_static(xc, kernel, _act_scale_var(self), k // 2)
        else:
            if self.mode == "calib":
                _sow_act_amax(self, xc)
            # NOTE two hardware-A/B'd non-wins, so the next reader doesn't
            # re-try them: a strided-subsample abs-max (126 -> 142 ms/fwd)
            # and an optimization_barrier forcing one bf16 materialisation
            # of the GroupNorm producer (126 -> 151 ms/fwd) — XLA's own
            # fusion split beats both; erasing the quantization overhead
            # entirely is what mode='static' is for.
            out = int8_conv(xc, kernel, k // 2)
        # bias in the compute dtype, like flax nn.Conv(dtype=bf16) does —
        # an f32 bias would promote the whole activation back to f32
        return out + bias.astype(self.dtype).reshape(1, 1, 1, -1)


class QuantDense(nn.Module):
    """Drop-in replacement for attention qkv/proj ``nn.Dense``
    (mode semantics as in QuantConv)."""
    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.bfloat16  # output cast (torso compute dtype)
    mode: str = "dynamic"

    @nn.compact
    def __call__(self, x):
        init = (nn.initializers.zeros_init() if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, (x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        xc = x.astype(self.dtype)
        if self.mode == "static":
            out = int8_dense_static(xc, kernel, _act_scale_var(self))
        else:
            if self.mode == "calib":
                _sow_act_amax(self, xc)
            out = int8_dense(xc, kernel)
        return out + bias.astype(self.dtype).reshape(
            (1,) * (out.ndim - 1) + (-1,))


# ---------------------------------------------------------------------------
# Fused GroupNorm(+FiLM affine)+SiLU+quantize -> int8 conv composite.
# The biggest int8 overhead was XLA materialising the f32 GroupNorm chain
# around the quantization (see the non-wins note above); the Pallas kernel
# (ops/pallas_gn_quant.py) streams stats/amax/quantize in three passes and
# hands the conv a ready s8 operand. The backward treats quantization as
# straight-through and pulls the int8 transposed-conv cotangent through the
# exact GN+affine+SiLU formulation via jax.vjp (recompute-from-x: less
# residual memory than storing the normalised activation).
# ---------------------------------------------------------------------------

def _gn_silu_ref_f32(x, gamma_nc, beta_nc, groups, eps):
    """Unquantized GN+per-sample-affine+SiLU in f32 (the differentiation
    formulation of pallas_gn_quant.gn_silu_quant)."""
    n, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)
    mean_c = jnp.mean(xf, axis=(1, 2))
    gmean = jnp.mean(mean_c.reshape(n, groups, cg), axis=-1)
    gmean_c = jnp.repeat(gmean, cg, axis=-1)
    centered = xf - gmean_c[:, None, None, :]
    var_c = jnp.mean(jnp.square(centered), axis=(1, 2))
    gvar = jnp.mean(var_c.reshape(n, groups, cg), axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(gvar + eps), cg, axis=-1)
    y = centered * inv_c[:, None, None, :]
    y = y * gamma_nc[:, None, None, :] + beta_nc[:, None, None, :]
    return y * jax.nn.sigmoid(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gn_quant_conv(x, gamma_nc, beta_nc, w, pad, groups, eps):
    """silu(groupnorm(x)*gamma_nc+beta_nc) -> int8 quantize -> int8 conv.

    x: (n, h, w, cin) torso dtype; gamma_nc/beta_nc: (n, cin) f32 effective
    affine (FiLM folded by the caller); w: (k, k, cin, cout) f32 master
    weights. Returns x.dtype (n, h, w, cout), bias NOT included.
    """
    return _gn_quant_conv_fwd(x, gamma_nc, beta_nc, w, pad, groups, eps)[0]


def _gn_quant_conv_fwd(x, gamma_nc, beta_nc, w, pad, groups, eps):
    from free_hunch_tpu.ops.pallas_gn_quant import gn_silu_quant
    wq, wscale = _quantize_weight(w, reduce_axes=(0, 1, 2))
    xq, ascale = gn_silu_quant(x, gamma_nc, beta_nc, groups, eps)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * (ascale * wscale)).astype(x.dtype)
    return out, (x, gamma_nc, beta_nc, wq, wscale, w.shape)


def _gn_quant_conv_bwd(pad, groups, eps, res, g):
    x, gamma_nc, beta_nc, wq, wscale, w_shape = res
    # int8 transposed conv -> cotangent w.r.t. the normalised activation y
    g_scaled = g * wscale.reshape(1, 1, 1, -1).astype(g.dtype)
    gq, gscale = _quantize_act(g_scaled)
    wqT = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))
    kh = w_shape[0]
    padT = kh - 1 - pad
    acc = jax.lax.conv_general_dilated(
        gq, wqT, (1, 1), [(padT, padT), (padT, padT)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    dy = acc.astype(jnp.float32) * gscale
    # straight-through the quantization, exact through GN+affine+SiLU
    _, gn_vjp = jax.vjp(
        lambda xx, gg, bb: _gn_silu_ref_f32(xx, gg, bb, groups, eps),
        x, gamma_nc, beta_nc)
    dx, dgamma, dbeta = gn_vjp(dy)
    dw = jnp.zeros(w_shape, jnp.float32)
    return dx.astype(x.dtype), dgamma, dbeta, dw


gn_quant_conv.defvjp(_gn_quant_conv_fwd, _gn_quant_conv_bwd)
