#!/usr/bin/env python
"""Multi-seed distributional A/B (VERDICT r3 weak #4): the free-running
reference-vs-ours comparison repeated over seeds, so the per-seed PSNR/SSIM
DISTRIBUTIONS can be compared rather than a single draw.

Both sides share each seed's converted random weights, initial noise and
measurement; the per-seed paired deltas and the cross-seed spreads are
reported. The claim gated here: our per-seed deviation from the reference is
small COMPARED TO the reference's own seed-to-seed spread (i.e. the
implementations are exchangeable draws of the same pipeline, not two nearby
but distinct pipelines).

Usage: python scripts/ab_seed_spread.py [--seeds 0,1,2,3,4] [--operator ...]
Output: docs/ab_seed_spread_<res>.json
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--operator", default="gaussian_blur")
    ap.add_argument("--guidance_gradient", default="vjp",
                    choices=["vjp", "covariance"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    from scripts.ab_reference_pipeline import run_ab

    rows = []
    for seed in seeds:
        r = run_ab(res=args.res, channels=args.channels, steps=args.steps,
                   seed=seed, operator=args.operator,
                   guidance_gradient=args.guidance_gradient, verbose=False)
        row = dict(seed=seed,
                   psnr_ref=r["psnr_vs_cond"]["reference"],
                   psnr_ours=r["psnr_vs_cond"]["ours"],
                   ssim_ref=r["ssim_vs_cond"]["reference"],
                   ssim_ours=r["ssim_vs_cond"]["ours"])
        rows.append(row)
        print(f"seed {seed}: psnr ref {row['psnr_ref']:.4f} "
              f"ours {row['psnr_ours']:.4f}", file=sys.stderr, flush=True)

    pr = np.array([r["psnr_ref"] for r in rows])
    po = np.array([r["psnr_ours"] for r in rows])
    sr = np.array([r["ssim_ref"] for r in rows])
    so = np.array([r["ssim_ours"] for r in rows])
    summary = dict(
        n_seeds=len(seeds),
        psnr=dict(ref_mean=float(pr.mean()), ours_mean=float(po.mean()),
                  ref_std=float(pr.std(ddof=1)), ours_std=float(po.std(ddof=1)),
                  paired_delta_max=float(np.abs(pr - po).max()),
                  paired_delta_over_ref_spread=float(
                      np.abs(pr - po).max() / max(pr.std(ddof=1), 1e-9))),
        ssim=dict(ref_mean=float(sr.mean()), ours_mean=float(so.mean()),
                  ref_std=float(sr.std(ddof=1)), ours_std=float(so.std(ddof=1)),
                  paired_delta_max=float(np.abs(sr - so).max())),
    )
    out = dict(protocol=dict(res=args.res, channels=args.channels,
                             steps=args.steps, operator=args.operator,
                             guidance_gradient=args.guidance_gradient,
                             note="paired per-seed free-running A/B; gate = "
                                  "paired deviation small vs the reference's "
                                  "own cross-seed spread"),
               per_seed=rows, summary=summary)
    path = args.out or os.path.join(
        REPO, "docs", f"ab_seed_spread_{args.res}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
