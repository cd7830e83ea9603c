"""Fused GroupNorm(+affine)+SiLU+int8-quantize Pallas TPU kernel.

Why this exists: the int8 torso (ops/quant.py) showed the quantized convs
at 80% of the v5e int8 peak while ~62 ms/iter went to quantization
elementwise — XLA materialises the f32 GroupNorm chain, reads it again for
the per-sample abs-max, and again for the round/clip/s8 convert (both
jnp-level fusion hints REGRESSED; see quant.py). This kernel produces the
conv-ready s8 operand in exactly THREE streaming passes over the bf16
activation (statistics, abs-max of the normalised output, quantise+write),
never materialising a full-size intermediate:

    y  = silu((x - mean_g) * rsqrt(var_g + eps) * gamma[n, c] + beta[n, c])
    xq = round(y / s_n).clip(-127, 127).astype(int8),   s_n = amax_n(y)/127

The affine is PER-SAMPLE (n, c): a plain GroupNorm32 passes its (c,)
params broadcast, and the ADM ResBlock's FiLM epilogue
``(norm * g + b) * (1 + scale_nc) + shift_nc`` folds into
``gamma_eff = g * (1 + scale)``, ``beta_eff = b * (1 + scale) + shift`` —
so the same kernel serves both the in_norm and the scale-shift out_norm
paths (reference ``openai_unet.py`` ResBlock:143).

A pure-jnp twin (`gn_silu_quant_reference`) is the CPU/odd-shape fallback
and the differentiation formulation; the guidance pullback treats the
quantisation as straight-through (identity), which is the same convention
as ops/quant.py's int8 backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_VMEM_BUDGET = 1024 * 1024


def _group_onehot(c: int, groups: int, dtype=jnp.float32):
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(dtype)


def gn_silu_quant_reference(x, gamma_nc, beta_nc, groups, eps):
    """jnp twin: returns (xq int8, scale (n,1,1,1) f32). gamma/beta: (n, c)."""
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
    y = y * jax.nn.sigmoid(y)
    amax = jnp.max(jnp.abs(y), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _stats_kernel(x_ref, out_ref, *, groups):
    # CAVEAT (known, accepted): the fused pass computes group variance as
    # E[x^2] - E[x]^2 in f32, which loses precision by cancellation when
    # |mean| >> std (near-degenerate groups) — the jnp reference twin
    # (_gn_silu_ref_f32 in ops/quant.py) and the straight-through backward
    # use the two-pass centered variance and can disagree there. A centered
    # second pass would fix it at the cost of one more full read of x; this
    # kernel is OPT-IN and already measured slower than XLA's fusion on v5e
    # (module docstring), so the extra pass is not worth carrying. If the
    # kernel is ever promoted to a default on other hardware, switch this to
    # the centered formulation first.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    c = x_ref.shape[-1]
    xf = x_ref[0].astype(jnp.float32)
    colsum = jnp.sum(xf, axis=0)
    sqsum = jnp.sum(xf * xf, axis=0)
    both = jnp.concatenate([jnp.sum(colsum, axis=0, keepdims=True),
                            jnp.sum(sqsum, axis=0, keepdims=True)], axis=0)
    onehot = _group_onehot(c, groups)
    out_ref[0] += jnp.dot(both, onehot, preferred_element_type=jnp.float32)


def _normalized_tile(x_ref, stats_ref, gamma_ref, beta_ref, *, groups, eps,
                     count):
    """The shared normalise+affine+SiLU chain, f32 in VMEM."""
    c = x_ref.shape[-1]
    stats = stats_ref[0]                          # (2, groups)
    mean = stats[0:1] / count
    var = stats[1:2] / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    onehot = _group_onehot(c, groups)
    mi = jnp.concatenate([mean, inv], axis=0)
    mi_c = jnp.dot(mi, onehot.T, preferred_element_type=jnp.float32)  # (2, c)
    xf = x_ref[0].astype(jnp.float32)
    y = (xf - mi_c[0][None, None, :]) * mi_c[1][None, None, :]
    y = y * gamma_ref[0, 0][None, None, :].astype(jnp.float32) \
        + beta_ref[0, 0][None, None, :].astype(jnp.float32)
    return y * jax.nn.sigmoid(y)


def _amax_kernel(x_ref, stats_ref, gamma_ref, beta_ref, out_ref, *, groups,
                 eps, count):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    y = _normalized_tile(x_ref, stats_ref, gamma_ref, beta_ref,
                         groups=groups, eps=eps, count=count)
    # scalar stores to VMEM are unsupported; accumulate as a (1, 1) block
    tile_max = jnp.max(jnp.abs(y))[None, None]
    out_ref[0] = jnp.maximum(out_ref[0], tile_max)


def _quant_kernel(x_ref, stats_ref, gamma_ref, beta_ref, amax_ref, out_ref,
                  *, groups, eps, count):
    y = _normalized_tile(x_ref, stats_ref, gamma_ref, beta_ref,
                         groups=groups, eps=eps, count=count)
    scale = jnp.maximum(amax_ref[0, 0, 0], 1e-12) * (1.0 / 127.0)
    out_ref[0] = jnp.clip(jnp.round(y * (1.0 / scale)),
                          -127, 127).astype(jnp.int8)


def _pallas_gn_silu_quant(x, gamma_nc, beta_nc, groups, eps):
    n, h, w, c = x.shape
    bytes_per_row = w * c * x.dtype.itemsize
    th = max(1, min(h, _VMEM_BUDGET // max(bytes_per_row, 1)))
    while h % th:
        th -= 1
    n_h = h // th

    x_spec = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    # per-sample vectors ride with a singleton axis so the last-two block
    # dims equal the array dims (Mosaic tiling constraint)
    gamma_nc = gamma_nc.reshape(n, 1, c)
    beta_nc = beta_nc.reshape(n, 1, c)
    g_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, groups=groups),
        grid=(n, n_h),
        in_specs=[x_spec],
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, groups), jnp.float32),
    )(x)

    count = float(h * w * (c // groups))
    stats_spec = pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    amax = pl.pallas_call(
        functools.partial(_amax_kernel, groups=groups, eps=eps, count=count),
        grid=(n, n_h),
        in_specs=[x_spec, stats_spec, g_spec, g_spec],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
    )(x, stats, gamma_nc, beta_nc)

    xq = pl.pallas_call(
        functools.partial(_quant_kernel, groups=groups, eps=eps, count=count),
        grid=(n, n_h),
        in_specs=[x_spec, stats_spec, g_spec, g_spec,
                  pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
    )(x, stats, gamma_nc, beta_nc, amax)

    scale = (jnp.maximum(amax, 1e-12) / 127.0).reshape(n, 1, 1, 1)
    return xq, scale


def gn_silu_quant(x, gamma_nc, beta_nc, groups: int = 32, eps: float = 1e-5):
    """GroupNorm + per-sample affine + SiLU + per-sample int8 quantize.

    x: (n, h, w, c) bf16/f32; gamma_nc, beta_nc: (n, c) f32 effective
    affine (FiLM folded by the caller). Returns (xq int8, scale (n,1,1,1)
    f32) such that xq * scale ~= silu(norm(x) * gamma + beta).

    TPU path: the three-pass Pallas kernel above. Elsewhere (and for odd
    shapes): the jnp reference twin.
    """
    use_pallas = (_HAS_PLTPU and jax.default_backend() == "tpu"
                  and x.shape[-1] % 128 == 0 and x.shape[-1] % groups == 0)
    if use_pallas:
        return _pallas_gn_silu_quant(x, gamma_nc, beta_nc, groups, eps)
    return gn_silu_quant_reference(x, gamma_nc, beta_nc, groups, eps)
