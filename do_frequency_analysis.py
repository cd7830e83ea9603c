#!/usr/bin/env python
"""Extract the per-DCT-coefficient variance prior of a dataset.

Parity: reference ``do_frequency_analysis.py:1-72`` — stream N images,
accumulate running mean/variance of their orthonormal 2-D DCT coefficients,
save ``dct_variance`` next to the dataset (the Free Hunch DCT-basis prior,
``online_update_bfgs.py:343``).

TPU redesign: the DCT is the matmul transform from ops.dct, batched and
jitted; the streaming moments use Welford-style batch accumulation. Output is
both ``dct_variance.npz`` (torch-free) and, when torch is importable,
``dct_variance.pt`` for drop-in compatibility with the reference layout.

Usage: python do_frequency_analysis.py --dataset_path data/imagenet/ --num_images 500
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def compute_dct_variance(dataset_path: str, num_images: int = 500,
                         resolution: int = 256, batch_size: int = 16):
    import jax.numpy as jnp

    from free_hunch_tpu.data.dataset import ImageFolderDataset
    from free_hunch_tpu.data.encoders import StandardRGBEncoder
    from free_hunch_tpu.ops.dct import dct_2d

    ds = ImageFolderDataset(dataset_path, resolution=resolution)
    enc = StandardRGBEncoder()
    n_total = min(num_images, len(ds))

    count = 0
    mean = np.zeros((3, resolution, resolution), np.float64)
    m2 = np.zeros((3, resolution, resolution), np.float64)
    for start in range(0, n_total, batch_size):
        idx = range(start, min(start + batch_size, n_total))
        batch = np.stack([ds[i][0] for i in idx])
        coeffs = np.asarray(dct_2d(enc.encode(jnp.asarray(batch))), np.float64)
        for c in coeffs:  # Welford update per sample
            count += 1
            delta = c - mean
            mean += delta / count
            m2 += delta * (c - mean)
    var = m2 / max(count - 1, 1)
    return mean.astype(np.float32), var.astype(np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_path", default="data/imagenet/")
    p.add_argument("--num_images", type=int, default=500)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    mean, var = compute_dct_variance(args.dataset_path, args.num_images,
                                     args.resolution)
    out_dir = args.out or args.dataset_path
    if os.path.isfile(out_dir):
        # zip datasets: write the variance files next to the archive (the
        # dataset path itself is a file, makedirs would raise and lose the
        # whole accumulation)
        out_dir = os.path.join(os.path.dirname(os.path.abspath(out_dir)),
                               os.path.splitext(os.path.basename(out_dir))[0])
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "dct_variance.npz"),
                        dct_variance=var, dct_mean=mean)
    try:
        import torch
        torch.save(torch.from_numpy(var), os.path.join(out_dir, "dct_variance.pt"))
    except ImportError:
        pass
    print(f"saved DCT variance ({var.shape}) to {out_dir}")


if __name__ == "__main__":
    main()
