#!/usr/bin/env python
"""Convert upstream LPIPS weights to the npz consumed by
free_hunch_tpu.metrics.lpips_jax (env LPIPS_WEIGHTS).

Inputs (both are plain torch state dicts; torchvision itself is NOT needed):
  --vgg   torchvision vgg16 checkpoint (e.g. vgg16-397923af.pth) — only the
          ``features.*`` conv weights are read
  --lins  the official LPIPS linear heads (PerceptualSimilarity
          lpips/weights/v0.1/vgg.pth) — keys ``lin<i>.model.1.weight``

Usage:
  python scripts/convert_lpips_weights.py --vgg vgg16.pth --lins vgg.pth \
      --out models/lpips_vgg.npz
  LPIPS_WEIGHTS=models/lpips_vgg.npz python generate_conditional.py ...
"""
import argparse
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_hunch_tpu.metrics.lpips_jax import convert_torch_weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True)
    ap.add_argument("--lins", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    vgg_sd = torch.load(args.vgg, map_location="cpu", weights_only=True)
    lins_sd = torch.load(args.lins, map_location="cpu", weights_only=True)
    vgg_np = {k: v.numpy() for k, v in vgg_sd.items()
              if k.startswith("features.")}
    # official head files use 'lin0.model.1.weight'; normalise to 'lins.<i>.'
    lins_np = {}
    for k, v in lins_sd.items():
        key = k.replace("lin0", "lins.0").replace("lin1", "lins.1") \
               .replace("lin2", "lins.2").replace("lin3", "lins.3") \
               .replace("lin4", "lins.4") if k.startswith("lin") else k
        lins_np[key] = v.numpy()
    params = convert_torch_weights(vgg_np, lins_np)
    np.savez(args.out, **params)
    print(f"wrote {args.out}: {len(params)} arrays, "
          f"{sum(a.nbytes for a in params.values()) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
