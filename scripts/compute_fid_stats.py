#!/usr/bin/env python
"""Precompute FID reference feature statistics (mu, sigma) for a dataset.

Usage:
    python scripts/compute_fid_stats.py --dataset_path=data/imagenet/ \
        --out=data/imagenet_fid_stats.npz [--total_images=N] [--batch=16]

Feed the npz to the driver via ``--fid_ref_stats=...`` to get FID in
results.json. With ``FID_WEIGHTS`` set (converted pytorch-fid InceptionV3
weights, ``metrics/fid.py::convert_torch_weights``) the numbers are
comparable to published FID; without it a deterministic random-feature
extractor is used and the stats carry ``is_proxy=True`` (the driver warns on
extractor mismatch).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--total_images", type=int, default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from free_hunch_tpu.data.dataset import ImageFolderDataset
    from free_hunch_tpu.metrics import fid

    ds = ImageFolderDataset(args.dataset_path, resolution=args.resolution,
                            return_idx=True)
    n = min(args.total_images or len(ds), len(ds))
    extract, is_proxy = fid.make_extractor()
    stats = fid.FeatureStats()
    for start in range(0, n, args.batch):
        idx = range(start, min(start + args.batch, n))
        imgs = np.stack([ds[int(i)][1] for i in idx])  # (b, C, H, W) uint8
        feats = extract(jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0)
        stats.add(np.asarray(feats))
        print(f"\r{stats.n}/{n}", end="", file=sys.stderr, flush=True)
    print(file=sys.stderr)
    stats.save(args.out, is_proxy=is_proxy)
    print(f"wrote {args.out}: n={stats.n}, dim={stats.dim}, "
          f"is_proxy={is_proxy}")


if __name__ == "__main__":
    main()
