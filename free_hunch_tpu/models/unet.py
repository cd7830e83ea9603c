"""ADM (guided-diffusion) UNet denoiser in Flax, TPU-first.

Topology parity: reference ``training/openai_unet.py`` (UNetModel:395,
ResBlock:143, AttentionBlock:259, QKVAttention(Legacy):328/361, Upsample:81,
Downsample:113) so that the public 256x256 checkpoints convert 1:1
(see ``free_hunch_tpu/models/convert.py`` and tests/test_unet_parity.py).

TPU redesign relative to the torch module:

* NHWC activations internally (XLA TPU's native conv layout); the public API
  stays NCHW to match the rest of the framework.
* bfloat16 torso with float32 GroupNorm and float32 softmax (the reference
  uses an fp16 torso with fp32 master params — bf16 needs no loss scaling).
* attention is a single fused dot-product per block; heads are a reshape.
* gradient rematerialisation via ``flax.linen.remat`` on ResBlocks replaces
  the reference's ``CheckpointFunction`` (``openai_nn.py:124-170``); on TPU
  this is what keeps the guidance VJP (one backward through the UNet per
  sampler stage) inside HBM.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (32, 16, 8)  # downsample rates (ds)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.bfloat16  # torso compute dtype
    remat: bool = True               # rematerialise ResBlocks under grad
    # (data_axis, model_axis) mesh-axis names, or None: when set, NHWC torso
    # activations are pinned to PartitionSpec(data, model, None, None) — batch
    # over the data axis, image HEIGHT over the model axis (XLA GSPMD spatial
    # partitioning: 3x3 convs get automatic halo exchanges over ICI, GroupNorm
    # statistics and attention insert the matching collectives). This is the
    # TPU-native scaling path for activation/vjp HBM past one chip — the
    # reference has no model parallelism at all (SURVEY.md §2.2; its only
    # axis is DP evaluation). Requires an ambient `with mesh:` whose axis
    # names match. Heights that the model-axis size does not divide at some
    # level are legal — GSPMD pads the ragged shard — but waste HBM and MXU
    # on the padding; size the axis to divide H at every level for the even
    # split (tests/test_sharded_unet.py pins parity for both cases).
    spatial_partition: Optional[Tuple[Optional[str], Optional[str]]] = None
    # quant="int8": torso stride-1 convs + attention qkv/proj run on the v5e
    # int8 MXU (2x the bf16 peak) with per-channel int8 weights, dynamic
    # per-sample activation scales, int32 accumulation, and an int8 pullback
    # (ops/quant.py). The first in_conv, final out_conv (learned-sigma /
    # x0_var channels), GroupNorms, softmax, and time embedding stay
    # high-precision. None = bf16 torso (default).
    # quant="int8_static": int8 with CALIBRATED per-(site, sigma-stage)
    # activation scales instead of in-graph abs-max reduces — zero
    # quantization passes in the forward (ops/quant.py, models/calibrate.py);
    # apply() must receive a 'qscales' collection (the preconditioner selects
    # it per stage from the calibration table). "int8_calib" is the
    # calibration-capture mode (dynamic compute + per-site abs-max sown into
    # a mutable 'qstats' collection).
    # INFERENCE-ONLY: every int8 mode returns zero weight cotangents (the
    # guidance vjp differentiates w.r.t. x only) — training/fine-tuning needs
    # the bf16 torso (quant=None).
    quant: Optional[str] = None

    @property
    def label_dim(self) -> int:
        return 0 if self.num_classes is None else self.num_classes


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, cos-first ordering (reference openai_nn.py:103)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """32-group GroupNorm with float32 statistics regardless of activation
    dtype (reference GroupNorm32, openai_nn.py:17), optionally fused with the
    SiLU that follows it throughout the ADM UNet. On TPU this lowers to the
    two-pass Pallas kernel (ops.pallas_groupnorm); elsewhere to the identical
    jnp formulation."""
    channels: int
    apply_silu: bool = False

    @nn.compact
    def __call__(self, x):
        from free_hunch_tpu.ops.pallas_groupnorm import groupnorm_silu
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.channels,), jnp.float32)
        return groupnorm_silu(x, scale, bias, 32, 1e-5, self.apply_silu)


_QUANT_MODES = {"int8": "dynamic", "int8_static": "static",
                "int8_calib": "calib"}


def _conv(features, kernel=3, stride=1, dtype=jnp.bfloat16, name=None,
          zero_init=False, quant=None):
    import os as _os
    quant_1x1 = _os.environ.get("FREE_HUNCH_QUANT_1X1", "1") == "1"
    if quant in _QUANT_MODES and stride == 1 and (kernel > 1 or quant_1x1):
        # int8 MXU path; same param names/shapes (kernel HWIO, bias) so
        # checkpoint conversion is untouched. Stride-2 convs (only present
        # when resblock_updown=False) fall through to the bf16 conv.
        # Hardware-A/B'd NON-WIN, so the next reader doesn't re-try it:
        # running the HBM-bound 1x1 skip projections in bf16
        # (FREE_HUNCH_QUANT_1X1=0) to skip their quantize/dequant passes
        # LOSES — fwd+vjp 241.9 -> 244.6 ms/call on v5e (skip convs 9.7 ->
        # 13.8 ms: halving the operand bytes to s8 beats saving the passes).
        from free_hunch_tpu.ops.quant import QuantConv
        return QuantConv(features, kernel, zero_init=zero_init, dtype=dtype,
                         mode=_QUANT_MODES[quant], name=name)
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    # explicit symmetric torch-style padding (k//2 per side): XLA "SAME"
    # resolves to ASYMMETRIC (0, 1) padding for stride-2 kernel-3 convs,
    # which silently diverges from the reference conv_nd(padding=1) on the
    # conv_resample downsample path (they coincide at stride 1)
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   dtype=dtype, param_dtype=jnp.float32, kernel_init=init, name=name)


class Upsample(nn.Module):
    """Nearest x2 upsample + optional 3x3 conv (reference Upsample:81)."""
    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if self.use_conv:
            x = _conv(self.channels, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv or 2x2 average pool (reference Downsample:113)."""
    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _conv(self.channels, stride=2, dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _GNParams(nn.Module):
    """Parameter holder matching GroupNorm32's tree ('scale', 'bias') for
    the fused GN+quantize+conv path — keeps checkpoints layout-identical."""
    channels: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.channels,), jnp.float32),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.channels,), jnp.float32))


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree ('kernel' HWIO, 'bias')."""
    kernel_size: int
    cin: int
    cout: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        init = (nn.initializers.zeros_init() if self.zero_init
                else nn.initializers.lecun_normal())
        return (self.param("kernel", init, (k, k, self.cin, self.cout),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.cout,), jnp.float32))


class ResBlock(nn.Module):
    """Residual block with FiLM (scale-shift) time conditioning and optional
    built-in up/down sampling (reference ResBlock:143)."""
    out_channels: int
    use_scale_shift_norm: bool
    up: bool = False
    down: bool = False
    conv_shortcut: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb):
        c_in = x.shape[-1]
        n = x.shape[0]
        # OPT-IN (FREE_HUNCH_FUSED_GN_QUANT=1): fuse the GN(+FiLM)+SiLU+
        # quantize chain into the Pallas three-pass kernel feeding the int8
        # conv directly (ops/quant.py gn_quant_conv); param trees stay
        # identical via the holder modules. Off by default: measured on v5e
        # the fused path LOSES end-to-end (fwd device time 126 -> 165
        # ms/iter — the three pallas_calls cost more than the XLA
        # elementwise they replace AND the kernel's s8 output layout slows
        # the consuming convs 56 -> 70 ms), the same pattern as the
        # standalone Pallas GroupNorm (pallas_groupnorm.py docstring).
        # Kept as the validated fused implementation for hardware where the
        # tradeoff flips. Resampling blocks always use the unfused path
        # (the resize sits between norm and conv).
        import os as _os
        fuse = (self.quant == "int8" and not (self.up or self.down)
                and c_in % 32 == 0 and self.out_channels % 32 == 0
                and _os.environ.get("FREE_HUNCH_FUSED_GN_QUANT") == "1")
        if fuse:
            from free_hunch_tpu.ops.quant import gn_quant_conv
            g_in, b_in = _GNParams(c_in, name="in_norm")()
            k_in, kb_in = _ConvParams(3, c_in, self.out_channels,
                                      name="in_conv")()
            h = gn_quant_conv(x.astype(self.dtype),
                              jnp.broadcast_to(g_in[None], (n, c_in)),
                              jnp.broadcast_to(b_in[None], (n, c_in)),
                              k_in, 1, 32, 1e-5)
            h = h + kb_in.astype(self.dtype).reshape(1, 1, 1, -1)
        else:
            h = GroupNorm32(c_in, apply_silu=True, name="in_norm")(x)
            if self.up:
                h = Upsample(c_in, use_conv=False, dtype=self.dtype)(h)
                x = Upsample(c_in, use_conv=False, dtype=self.dtype)(x)
            elif self.down:
                h = Downsample(c_in, use_conv=False, dtype=self.dtype)(h)
                x = Downsample(c_in, use_conv=False, dtype=self.dtype)(x)
            h = _conv(self.out_channels, dtype=self.dtype, name="in_conv",
                      quant=self.quant)(h)

        emb_out = nn.Dense(2 * self.out_channels if self.use_scale_shift_norm
                           else self.out_channels,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)
        if fuse:
            from free_hunch_tpu.ops.quant import gn_quant_conv
            g_out, b_out = _GNParams(self.out_channels, name="out_norm")()
            k_out, kb_out = _ConvParams(3, self.out_channels,
                                        self.out_channels, zero_init=True,
                                        name="out_conv")()
            if self.use_scale_shift_norm:
                # FiLM folds into the per-sample affine:
                # (norm*g + b)*(1+s) + sh = norm*(g*(1+s)) + (b*(1+s) + sh)
                scale, shift = jnp.split(
                    emb_out.reshape(n, -1).astype(jnp.float32), 2, axis=-1)
                gamma_eff = g_out[None] * (1.0 + scale)
                beta_eff = b_out[None] * (1.0 + scale) + shift
                h_in = h
            else:
                gamma_eff = jnp.broadcast_to(g_out[None],
                                             (n, self.out_channels))
                beta_eff = jnp.broadcast_to(b_out[None],
                                            (n, self.out_channels))
                h_in = h + emb_out
            h = gn_quant_conv(h_in.astype(self.dtype), gamma_eff, beta_eff,
                              k_out, 1, 32, 1e-5)
            h = h + kb_out.astype(self.dtype).reshape(1, 1, 1, -1)
        else:
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = GroupNorm32(self.out_channels, name="out_norm")(h) \
                    * (1 + scale) + shift
                h = nn.silu(h)
            else:
                h = h + emb_out
                h = GroupNorm32(self.out_channels, apply_silu=True,
                                name="out_norm")(h)
            h = _conv(self.out_channels, dtype=self.dtype, name="out_conv",
                      zero_init=True, quant=self.quant)(h)

        if self.out_channels == c_in:
            skip = x
        elif self.conv_shortcut:
            skip = _conv(self.out_channels, dtype=self.dtype, name="skip",
                         quant=self.quant)(x)
        else:
            skip = _conv(self.out_channels, kernel=1, dtype=self.dtype,
                         name="skip", quant=self.quant)(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Full self-attention over spatial positions (reference AttentionBlock:259).

    The qkv projection keeps the torch checkpoint's channel layout:
    legacy order = per-head [q|k|v] blocks, new order = [all-q|all-k|all-v].
    Softmax runs in float32.
    """
    channels: int
    num_heads: int
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        t = h * w
        y = GroupNorm32(c, name="norm")(x).reshape(n, t, c)
        if self.quant in _QUANT_MODES:
            from free_hunch_tpu.ops.quant import QuantDense
            qkv = QuantDense(3 * c, dtype=self.dtype,
                             mode=_QUANT_MODES[self.quant], name="qkv")(y)
        else:
            qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(y)  # (n, t, 3c)
        if self.use_new_attention_order:
            # [all-q | all-k | all-v], heads inside each block.
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t, heads, ch)
            k = k.reshape(n, t, heads, ch)
            v = v.reshape(n, t, heads, ch)
        else:
            # per-head contiguous [q(ch) | k(ch) | v(ch)] blocks.
            qkv = qkv.reshape(n, t, heads, 3 * ch)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum("nthc,nshc->nhts", (q * scale).astype(jnp.float32),
                            (k * scale).astype(jnp.float32))
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        a = jnp.einsum("nhts,nshc->nthc", weights, v).reshape(n, t, c)
        if self.quant in _QUANT_MODES:
            from free_hunch_tpu.ops.quant import QuantDense
            a = QuantDense(c, zero_init=True, dtype=self.dtype,
                           mode=_QUANT_MODES[self.quant], name="proj_out")(a)
        else:
            a = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros_init(),
                         name="proj_out")(a)
        return x + a.reshape(n, h, w, c)


class UNetModel(nn.Module):
    """ADM UNet. Public API: NCHW float32 in, NCHW float32 out, matching the
    denoiser contract used by the preconditioner (reference UNetModel:648)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, y=None):
        cfg = self.cfg
        heads_up = cfg.num_heads_upsample if cfg.num_heads_upsample != -1 else cfg.num_heads

        def n_heads(ch, heads):
            if cfg.num_head_channels == -1:
                return heads
            return ch // cfg.num_head_channels

        # time / class embedding (f32 path)
        ted = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(ted, param_dtype=jnp.float32, name="time_embed_0")(emb)
        emb = nn.Dense(ted, param_dtype=jnp.float32, name="time_embed_2")(nn.silu(emb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(cfg.num_classes, ted, param_dtype=jnp.float32,
                                 name="label_emb")(y)

        _rb = ResBlock
        if cfg.remat:
            _rb = nn.remat(ResBlock, static_argnums=())

        def res_block(**kw):
            return _rb(quant=cfg.quant, **kw)

        def attn_block(*a, **kw):
            return AttentionBlock(*a, quant=cfg.quant, **kw)

        if cfg.spatial_partition is not None:
            from jax.sharding import PartitionSpec as _P
            _da, _ma = cfg.spatial_partition
            _spec = _P(_da, _ma, None, None)  # NHWC: batch x height sharded

            def pin(t):
                return jax.lax.with_sharding_constraint(t, _spec)
        else:
            def pin(t):
                return t

        h = jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype)  # NCHW -> NHWC torso
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        h = pin(_conv(ch, dtype=cfg.dtype, name="in_conv")(pin(h)))
        hs = [h]
        ds = 1
        block_id = 0
        # --- encoder ---
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = int(mult * cfg.model_channels)
                h = pin(res_block(out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                              dtype=cfg.dtype, name=f"down_{block_id}_res")(h, emb))
                if ds in cfg.attention_resolutions:
                    h = pin(attn_block(ch, n_heads(ch, cfg.num_heads),
                                       cfg.use_new_attention_order, dtype=cfg.dtype,
                                       name=f"down_{block_id}_attn")(h))
                hs.append(h)
                block_id += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = pin(res_block(out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                                  down=True, dtype=cfg.dtype,
                                  name=f"down_{block_id}_res")(h, emb))
                else:
                    h = pin(Downsample(ch, cfg.conv_resample, dtype=cfg.dtype,
                                   name=f"down_{block_id}_ds")(h))
                hs.append(h)
                ds *= 2
                block_id += 1

        # --- middle ---
        h = pin(res_block(out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                      dtype=cfg.dtype, name="mid_res0")(h, emb))
        h = pin(attn_block(ch, n_heads(ch, cfg.num_heads), cfg.use_new_attention_order,
                           dtype=cfg.dtype, name="mid_attn")(h))
        h = pin(res_block(out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                      dtype=cfg.dtype, name="mid_res1")(h, emb))

        # --- decoder ---
        block_id = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = int(mult * cfg.model_channels)
                h = pin(res_block(out_channels=ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                              dtype=cfg.dtype, name=f"up_{block_id}_res")(h, emb))
                if ds in cfg.attention_resolutions:
                    h = pin(attn_block(ch, n_heads(ch, heads_up),
                                       cfg.use_new_attention_order, dtype=cfg.dtype,
                                       name=f"up_{block_id}_attn")(h))
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = pin(res_block(out_channels=ch,
                                      use_scale_shift_norm=cfg.use_scale_shift_norm,
                                      up=True, dtype=cfg.dtype,
                                      name=f"up_{block_id}_us")(h, emb))
                    else:
                        h = pin(Upsample(ch, cfg.conv_resample, dtype=cfg.dtype,
                                     name=f"up_{block_id}_us")(h))
                    ds //= 2
                block_id += 1

        h = h.astype(jnp.float32)
        h = GroupNorm32(ch, apply_silu=True, name="out_norm")(h)
        h = _conv(cfg.out_channels, dtype=jnp.float32, name="out_conv", zero_init=True)(h)
        h = jnp.transpose(h, (0, 3, 1, 2))  # NHWC -> NCHW
        if cfg.spatial_partition is not None:
            # spatial partitioning is a TORSO-internal strategy (activation /
            # vjp HBM); hand the output back batch-sharded so the guidance
            # algebra (FFT solvers in particular — XLA CPU's fft thunk
            # rejects the halo-partitioned layouts) sees replicated H/W.
            from jax.sharding import PartitionSpec as _P
            h = jax.lax.with_sharding_constraint(
                h, _P(cfg.spatial_partition[0], None, None, None))
        return h


def create_model(image_size=256, num_channels=256, num_res_blocks=2, channel_mult="",
                 learn_sigma=True, class_cond=False, attention_resolutions="32,16,8",
                 num_heads=4, num_head_channels=64, num_heads_upsample=-1,
                 use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
                 use_fp16=False, use_new_attention_order=False, use_checkpoint=False,
                 dtype=jnp.bfloat16, remat=True, spatial_partition=None,
                 quant=None, **_unused) -> UNetModel:
    """Build a UNet from the OpenAI setup-file argument surface
    (reference ``training/openai_util.py:130-186``)."""
    if channel_mult == "" or channel_mult is None:
        channel_mult = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                        128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}[image_size]
    elif isinstance(channel_mult, str):
        channel_mult = tuple(int(m) for m in channel_mult.split(","))
    attention_ds = tuple(image_size // int(r) for r in str(attention_resolutions).split(","))
    cfg = UNetConfig(
        image_size=image_size, in_channels=3, model_channels=num_channels,
        out_channels=6 if learn_sigma else 3, num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds, dropout=dropout,
        channel_mult=tuple(channel_mult), num_classes=1000 if class_cond else None,
        num_heads=num_heads, num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm, resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order, dtype=dtype, remat=remat,
        spatial_partition=(tuple(spatial_partition)
                           if spatial_partition is not None else None),
        quant=quant,
    )
    return UNetModel(cfg)
