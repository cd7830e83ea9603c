#!/usr/bin/env python
"""Convert the diffusers SD-VAE checkpoint (stabilityai/sd-vae-ft-mse) to the
npz consumed by free_hunch_tpu.models.vae / StabilityVAEEncoder.

Input is the plain torch state dict inside the diffusers model directory
(``diffusion_pytorch_model.bin``; for ``.safetensors`` pass a file produced by
``safetensors.torch.load_file`` re-saved with torch.save) — diffusers itself
is NOT needed. Accepts both the modern ``to_q``/``to_out.0`` and the legacy
``query``/``proj_attn`` attention naming.

Usage:
  python scripts/convert_vae_weights.py --ckpt diffusion_pytorch_model.bin \
      --out models/sd_vae_ft_mse.npz

Reference: ``training/encoders.py:137-151`` downloads this checkpoint via
diffusers at runtime.
"""
import argparse
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flax.traverse_util import flatten_dict

from free_hunch_tpu.models.vae import VAEConfig, params_from_torch_state_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:  # CompVis-style wrapper
        sd = {k.removeprefix("first_stage_model."): v
              for k, v in sd["state_dict"].items()}
    variables = params_from_torch_state_dict(sd, VAEConfig())
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables["params"]).items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
