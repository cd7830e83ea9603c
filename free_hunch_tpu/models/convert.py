"""Convert OpenAI guided-diffusion PyTorch checkpoints to flax param pytrees.

Parity: the reference loads ``models/256x256_diffusion_uncond.pt`` /
``ffhq_10m.pt`` with ``torch.load`` (``training/openai_loading_utils.py:12-42``).
Here the torch state dict is mapped name-by-name onto the
``free_hunch_tpu.models.unet.UNetModel`` layout (conv OIHW -> HWIO, linear
transpose, 1x1-conv qkv -> Dense). Conversion fidelity is verified against the
reference torch module on random weights in ``tests/test_unet_parity.py``.

torch is only needed at conversion time (CPU); converted checkpoints are
stored as orbax/npz pytrees for TPU runs.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from free_hunch_tpu.models.unet import UNetConfig


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w: np.ndarray) -> np.ndarray:
    """torch linear weight (O, I) -> flax kernel (I, O)."""
    return np.transpose(w, (1, 0))


def _conv1d_to_dense(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv1d weight (O, I, 1) -> flax Dense kernel (I, O)."""
    return np.transpose(w[..., 0], (1, 0))


def _resblock_entries(torch_prefix: str, flax_prefix: Tuple[str, ...],
                      has_skip: bool) -> List[Tuple[str, Tuple[str, ...], str]]:
    """(torch_name, flax_path, kind) triples for one ResBlock."""
    e = [
        (f"{torch_prefix}.in_layers.0.weight", flax_prefix + ("in_norm", "scale"), "raw"),
        (f"{torch_prefix}.in_layers.0.bias", flax_prefix + ("in_norm", "bias"), "raw"),
        (f"{torch_prefix}.in_layers.2.weight", flax_prefix + ("in_conv", "kernel"), "conv"),
        (f"{torch_prefix}.in_layers.2.bias", flax_prefix + ("in_conv", "bias"), "raw"),
        (f"{torch_prefix}.emb_layers.1.weight", flax_prefix + ("emb_proj", "kernel"), "lin"),
        (f"{torch_prefix}.emb_layers.1.bias", flax_prefix + ("emb_proj", "bias"), "raw"),
        (f"{torch_prefix}.out_layers.0.weight", flax_prefix + ("out_norm", "scale"), "raw"),
        (f"{torch_prefix}.out_layers.0.bias", flax_prefix + ("out_norm", "bias"), "raw"),
        (f"{torch_prefix}.out_layers.3.weight", flax_prefix + ("out_conv", "kernel"), "conv"),
        (f"{torch_prefix}.out_layers.3.bias", flax_prefix + ("out_conv", "bias"), "raw"),
    ]
    if has_skip:
        e += [
            (f"{torch_prefix}.skip_connection.weight", flax_prefix + ("skip", "kernel"), "conv"),
            (f"{torch_prefix}.skip_connection.bias", flax_prefix + ("skip", "bias"), "raw"),
        ]
    return e


def _attn_entries(torch_prefix: str, flax_prefix: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.norm.weight", flax_prefix + ("norm", "scale"), "raw"),
        (f"{torch_prefix}.norm.bias", flax_prefix + ("norm", "bias"), "raw"),
        (f"{torch_prefix}.qkv.weight", flax_prefix + ("qkv", "kernel"), "conv1d"),
        (f"{torch_prefix}.qkv.bias", flax_prefix + ("qkv", "bias"), "raw"),
        (f"{torch_prefix}.proj_out.weight", flax_prefix + ("proj_out", "kernel"), "conv1d"),
        (f"{torch_prefix}.proj_out.bias", flax_prefix + ("proj_out", "bias"), "raw"),
    ]


def name_map(cfg: UNetConfig) -> List[Tuple[str, Tuple[str, ...], str]]:
    """Enumerate the full torch-name -> flax-path mapping for a config by
    replaying the constructor structure of the reference UNet
    (``openai_unet.py:486-622``)."""
    entries: List[Tuple[str, Tuple[str, ...], str]] = [
        ("time_embed.0.weight", ("time_embed_0", "kernel"), "lin"),
        ("time_embed.0.bias", ("time_embed_0", "bias"), "raw"),
        ("time_embed.2.weight", ("time_embed_2", "kernel"), "lin"),
        ("time_embed.2.bias", ("time_embed_2", "bias"), "raw"),
        ("input_blocks.0.0.weight", ("in_conv", "kernel"), "conv"),
        ("input_blocks.0.0.bias", ("in_conv", "bias"), "raw"),
        ("out.0.weight", ("out_norm", "scale"), "raw"),
        ("out.0.bias", ("out_norm", "bias"), "raw"),
        ("out.2.weight", ("out_conv", "kernel"), "conv"),
        ("out.2.bias", ("out_conv", "bias"), "raw"),
    ]
    if cfg.num_classes is not None:
        entries.append(("label_emb.weight", ("label_emb", "embedding"), "raw"))

    # encoder
    tid = 1  # torch input_blocks index
    ds = 1
    ch = int(cfg.channel_mult[0] * cfg.model_channels)
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out_ch = int(mult * cfg.model_channels)
            entries += _resblock_entries(f"input_blocks.{tid}.0",
                                         (f"down_{tid-1}_res",), has_skip=(out_ch != ch))
            ch = out_ch
            if ds in cfg.attention_resolutions:
                entries += _attn_entries(f"input_blocks.{tid}.1", (f"down_{tid-1}_attn",))
            tid += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                entries += _resblock_entries(f"input_blocks.{tid}.0",
                                             (f"down_{tid-1}_res",), has_skip=False)
            else:
                entries += [
                    (f"input_blocks.{tid}.0.op.weight", (f"down_{tid-1}_ds", "op", "kernel"), "conv"),
                    (f"input_blocks.{tid}.0.op.bias", (f"down_{tid-1}_ds", "op", "bias"), "raw"),
                ]
            ds *= 2
            tid += 1

    # middle
    entries += _resblock_entries("middle_block.0", ("mid_res0",), has_skip=False)
    entries += _attn_entries("middle_block.1", ("mid_attn",))
    entries += _resblock_entries("middle_block.2", ("mid_res1",), has_skip=False)

    # decoder: reconstruct the skip-channel stack to know when skips change width
    input_block_chans = [int(cfg.channel_mult[0] * cfg.model_channels)]
    c = input_block_chans[0]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            c = int(mult * cfg.model_channels)
            input_block_chans.append(c)
        if level != len(cfg.channel_mult) - 1:
            input_block_chans.append(c)

    oid = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            out_ch = int(mult * cfg.model_channels)
            entries += _resblock_entries(f"output_blocks.{oid}.0", (f"up_{oid}_res",),
                                         has_skip=(out_ch != ch + ich))
            ch = out_ch
            sub = 1
            if ds in cfg.attention_resolutions:
                entries += _attn_entries(f"output_blocks.{oid}.{sub}", (f"up_{oid}_attn",))
                sub += 1
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    entries += _resblock_entries(f"output_blocks.{oid}.{sub}",
                                                 (f"up_{oid}_us",), has_skip=False)
                else:
                    entries += [
                        (f"output_blocks.{oid}.{sub}.conv.weight",
                         (f"up_{oid}_us", "conv", "kernel"), "conv"),
                        (f"output_blocks.{oid}.{sub}.conv.bias",
                         (f"up_{oid}_us", "conv", "bias"), "raw"),
                    ]
                ds //= 2
            oid += 1
    return entries


_CONVERTERS = {"raw": lambda w: w, "conv": _conv_w, "lin": _lin_w, "conv1d": _conv1d_to_dense}


def convert_state_dict(state_dict: Dict[str, "object"], cfg: UNetConfig) -> dict:
    """Torch state dict (tensors or numpy arrays) -> flax params dict."""
    import flax.traverse_util as tu

    def to_np(t):
        if hasattr(t, "detach"):
            return t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    flat = {}
    used = set()
    for torch_name, flax_path, kind in name_map(cfg):
        if torch_name not in state_dict:
            raise KeyError(f"missing checkpoint tensor: {torch_name}")
        flat[flax_path] = _CONVERTERS[kind](to_np(state_dict[torch_name]))
        used.add(torch_name)
    extra = [k for k in state_dict if k not in used
             and not re.search(r"(num_batches_tracked|running_)", k)]
    if extra:
        raise ValueError(f"unconsumed checkpoint tensors: {extra[:10]}")
    return {"params": tu.unflatten_dict(flat)}


def load_torch_checkpoint(path: str, cfg: UNetConfig) -> dict:
    """Load a .pt checkpoint (CPU torch) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, cfg)


def randomize_zero_tensors(state_dict, scale: float = 0.1, seed: int = 0):
    """Return a torch state dict copy with every all-zero tensor replaced by
    fan-in-scaled random noise (std = scale / sqrt(fan_in)).

    The ADM UNet zero-initialises every residual-branch output conv, every
    attention proj_out, and the final out conv (``zero_module``, reference
    openai_nn.py:68) — a freshly constructed net therefore computes
    F(x) == 0 identically, which silently turns any random-init parity or
    end-to-end test into a vacuous 0 == 0 comparison. Re-randomising the
    zero tensors makes the full network contribute to the output.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in state_dict.items():
        if torch.is_tensor(v) and v.numel() > 0 and v.dtype.is_floating_point \
                and float(v.abs().max()) == 0.0:
            fan_in = int(np.prod(v.shape[1:])) if v.ndim > 1 else v.shape[0]
            out[k] = torch.randn(v.shape, generator=g,
                                 dtype=v.dtype) * (scale / np.sqrt(max(fan_in, 1)))
        else:
            out[k] = v
    return out
