"""Stable-Diffusion AutoencoderKL (sd-vae-ft-mse) in Flax, TPU-first.

Parity target: the diffusers ``AutoencoderKL`` that the reference's
``StabilityVAEEncoder`` loads (reference ``training/encoders.py:79-151``,
``dataset_tool.py:384-462``). The reference depends on ``pip install
diffusers`` at runtime; this is a self-contained native implementation so the
latent-encoding path runs on TPU without torch/diffusers in the loop.

Architecture (sd-vae-ft-mse config): encoder = conv_in + 4 DownEncoderBlocks
(block_out_channels 128/256/512/512, 2 resnets each, stride-2 downsample with
asymmetric (0,1) padding between them) + mid block (resnet, single-head
attention, resnet) + GroupNorm/SiLU/conv_out to 2*latent_channels, then a 1x1
``quant_conv``; decoder mirrors it with 3 resnets per up block and
nearest-2x upsampling. GroupNorm eps is 1e-6 throughout (diffusers default
for the VAE), SiLU activations, f32 compute.

TPU redesign notes: NHWC activations internally (XLA's native conv layout)
with an NCHW public API matching the rest of the framework; the attention is
one fused dot product (single head at 512 channels); everything jits into a
single XLA program per direction.

Weights: convert a diffusers/CompVis state dict with
``params_from_torch_state_dict`` (accepts both the modern ``to_q``/``to_out``
and the legacy ``query``/``proj_attn`` attention naming). Weights are not
bundled (zero egress); the architecture is oracle-tested against a
from-scratch torch replica with shared random weights in
``tests/test_vae.py``, the same pattern as LPIPS (tests/test_lpips.py).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    norm_eps: float = 1e-6


def _gn(x, scale, bias, groups, eps):
    """GroupNorm over NHWC activations with f32 statistics."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(b, h, w, c) * scale + bias).astype(x.dtype)


class VAEGroupNorm(nn.Module):
    channels: int
    groups: int
    eps: float
    apply_silu: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.channels,), jnp.float32)
        out = _gn(x, scale, bias, self.groups, self.eps)
        return nn.silu(out) if self.apply_silu else out


def _conv(features, kernel=3, stride=1, name=None, padding=None):
    if padding is None:
        padding = [(kernel // 2, kernel // 2)] * 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, dtype=jnp.float32,
                   param_dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D: GN-SiLU-conv ×2 + (1x1) shortcut."""
    cfg: VAEConfig
    out_ch: int

    @nn.compact
    def __call__(self, x):
        g, e = self.cfg.norm_num_groups, self.cfg.norm_eps
        in_ch = x.shape[-1]
        h = VAEGroupNorm(in_ch, g, e, apply_silu=True, name="norm1")(x)
        h = _conv(self.out_ch, name="conv1")(h)
        h = VAEGroupNorm(self.out_ch, g, e, apply_silu=True, name="norm2")(h)
        h = _conv(self.out_ch, name="conv2")(h)
        if in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the HW grid (diffusers ``Attention``
    with heads=1, head_dim=C as in the VAE mid block)."""
    cfg: VAEConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = VAEGroupNorm(c, self.cfg.norm_num_groups, self.cfg.norm_eps,
                         name="group_norm")(x)
        h2 = h.reshape(b, hh * ww, c)
        dense = lambda nm: nn.Dense(c, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name=nm)
        q, k, v = dense("to_q")(h2), dense("to_k")(h2), dense("to_v")(h2)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.float32(c)),
            axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = dense("to_out")(out)
        return x + out.reshape(b, hh, ww, c)


class MidBlock(nn.Module):
    cfg: VAEConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.cfg, self.channels, name="resnets_0")(x)
        x = AttnBlock(self.cfg, self.channels, name="attentions_0")(x)
        return ResnetBlock(self.cfg, self.channels, name="resnets_1")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chans = cfg.block_out_channels
        h = _conv(chans[0], name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(cfg, ch, name=f"down_{i}_resnet_{j}")(h)
            if i != len(chans) - 1:
                # diffusers Downsample2D: stride-2 conv with asymmetric
                # (0, 1) spatial padding
                h = _conv(ch, stride=2, padding=[(0, 1), (0, 1)],
                          name=f"down_{i}_downsample")(h)
        h = MidBlock(cfg, chans[-1], name="mid")(h)
        h = VAEGroupNorm(chans[-1], cfg.norm_num_groups, cfg.norm_eps,
                         apply_silu=True, name="conv_norm_out")(h)
        return _conv(2 * cfg.latent_channels, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chans = tuple(reversed(cfg.block_out_channels))
        h = _conv(chans[0], name="conv_in")(z)
        h = MidBlock(cfg, chans[0], name="mid")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(cfg, ch, name=f"up_{i}_resnet_{j}")(h)
            if i != len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), "nearest")
                h = _conv(ch, name=f"up_{i}_upsample")(h)
        h = VAEGroupNorm(chans[-1], cfg.norm_num_groups, cfg.norm_eps,
                         apply_silu=True, name="conv_norm_out")(h)
        return _conv(cfg.out_channels, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode: pixels (NCHW, scaled to [0,1] — the reference feeds x/255,
    ``training/encoders.py:103``, and ``StabilityVAEEncoder.encode_pixels``
    does the same) -> (mean, std) of the diagonal-Gaussian latent posterior;
    decode: latents (NCHW) -> pixels in [0,1]. Matches diffusers'
    ``AutoencoderKL.encode().latent_dist`` / ``.decode().sample``."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = _conv(2 * self.cfg.latent_channels, kernel=1)
        self.post_quant_conv = _conv(self.cfg.latent_channels, kernel=1)

    def encode(self, x):
        h = self.encoder(jnp.moveaxis(x, 1, -1))
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(jnp.moveaxis(moments, -1, 1), 2, axis=1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean, std

    def decode(self, z):
        h = self.post_quant_conv(jnp.moveaxis(z, 1, -1))
        return jnp.moveaxis(self.decoder(h), -1, 1)

    def __call__(self, x, key):
        mean, std = self.encode(x)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return self.decode(z), mean, std


# ---------------------------------------------------------------------------
# diffusers state-dict conversion

def _np(t):
    try:  # torch tensor
        return t.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


def _conv_kernel(t):
    return np.transpose(_np(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _set(params, path, value):
    node = params
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def _convert_resnet(params, prefix, sd, src):
    for ours, theirs in [("norm1", "norm1"), ("norm2", "norm2")]:
        _set(params, prefix + [ours, "scale"], _np(sd[f"{src}.{theirs}.weight"]))
        _set(params, prefix + [ours, "bias"], _np(sd[f"{src}.{theirs}.bias"]))
    for ours, theirs in [("conv1", "conv1"), ("conv2", "conv2")]:
        _set(params, prefix + [ours, "kernel"],
             _conv_kernel(sd[f"{src}.{theirs}.weight"]))
        _set(params, prefix + [ours, "bias"], _np(sd[f"{src}.{theirs}.bias"]))
    for theirs in ("conv_shortcut", "nin_shortcut"):
        if f"{src}.{theirs}.weight" in sd:
            _set(params, prefix + ["conv_shortcut", "kernel"],
                 _conv_kernel(sd[f"{src}.{theirs}.weight"]))
            _set(params, prefix + ["conv_shortcut", "bias"],
                 _np(sd[f"{src}.{theirs}.bias"]))


def _convert_attn(params, prefix, sd, src):
    """Modern (to_q/to_k/to_v/to_out.0 Linear) or legacy (query/key/value/
    proj_attn 1x1-conv or Linear) diffusers attention naming."""
    names = (["to_q", "to_k", "to_v", "to_out.0"]
             if f"{src}.to_q.weight" in sd
             else ["query", "key", "value", "proj_attn"])
    gn = "group_norm" if f"{src}.group_norm.weight" in sd else "norm"
    _set(params, prefix + ["group_norm", "scale"], _np(sd[f"{src}.{gn}.weight"]))
    _set(params, prefix + ["group_norm", "bias"], _np(sd[f"{src}.{gn}.bias"]))
    for ours, theirs in zip(["to_q", "to_k", "to_v", "to_out"], names):
        w = _np(sd[f"{src}.{theirs}.weight"])
        if w.ndim == 4:  # legacy 1x1 conv
            w = w[:, :, 0, 0]
        _set(params, prefix + [ours, "kernel"], w.T)  # torch Linear is (out,in)
        _set(params, prefix + [ours, "bias"], _np(sd[f"{src}.{theirs}.bias"]))


def _convert_mid(params, prefix, sd, src):
    _convert_resnet(params, prefix + ["resnets_0"], sd, f"{src}.resnets.0")
    _convert_attn(params, prefix + ["attentions_0"], sd, f"{src}.attentions.0")
    _convert_resnet(params, prefix + ["resnets_1"], sd, f"{src}.resnets.1")


def params_from_torch_state_dict(sd, cfg: VAEConfig = VAEConfig()):
    """Convert a diffusers ``AutoencoderKL.state_dict()`` to our params."""
    sd = {k: v for k, v in sd.items()}
    p = {}
    for tower in ("encoder", "decoder"):
        _set(p, [tower, "conv_in", "kernel"],
             _conv_kernel(sd[f"{tower}.conv_in.weight"]))
        _set(p, [tower, "conv_in", "bias"], _np(sd[f"{tower}.conv_in.bias"]))
        _set(p, [tower, "conv_out", "kernel"],
             _conv_kernel(sd[f"{tower}.conv_out.weight"]))
        _set(p, [tower, "conv_out", "bias"], _np(sd[f"{tower}.conv_out.bias"]))
        _set(p, [tower, "conv_norm_out", "scale"],
             _np(sd[f"{tower}.conv_norm_out.weight"]))
        _set(p, [tower, "conv_norm_out", "bias"],
             _np(sd[f"{tower}.conv_norm_out.bias"]))
        _convert_mid(p, [tower, "mid"], sd, f"{tower}.mid_block")
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            _convert_resnet(p, ["encoder", f"down_{i}_resnet_{j}"], sd,
                            f"encoder.down_blocks.{i}.resnets.{j}")
        if i != n_blocks - 1:
            _set(p, ["encoder", f"down_{i}_downsample", "kernel"],
                 _conv_kernel(
                     sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"]))
            _set(p, ["encoder", f"down_{i}_downsample", "bias"],
                 _np(sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]))
        for j in range(cfg.layers_per_block + 1):
            _convert_resnet(p, ["decoder", f"up_{i}_resnet_{j}"], sd,
                            f"decoder.up_blocks.{i}.resnets.{j}")
        if i != n_blocks - 1:
            _set(p, ["decoder", f"up_{i}_upsample", "kernel"],
                 _conv_kernel(
                     sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"]))
            _set(p, ["decoder", f"up_{i}_upsample", "bias"],
                 _np(sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]))
    for name in ("quant_conv", "post_quant_conv"):
        _set(p, [name, "kernel"], _conv_kernel(sd[f"{name}.weight"]))
        _set(p, [name, "bias"], _np(sd[f"{name}.bias"]))
    return {"params": p}
