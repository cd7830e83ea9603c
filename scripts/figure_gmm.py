#!/usr/bin/env python
"""Reproduce the paper's Gaussian-mixture illustration (Figure 2 style).

Parity: reference ``notebooks/figure_2.ipynb`` + ``figure_example.ipynb`` —
the analytic 2-D GMM experiment comparing (a) unconditional samples, (b) the
exact conditional posterior, and (c) Free Hunch guided samples using the
online covariance with second-order (BFGS) updates. Saved as a PNG grid since
the TPU image has no notebook runtime; all quantities are exact
(free_hunch_tpu.analysis.gmm) so no checkpoints are needed.

Usage: python scripts/figure_gmm.py --out figure_gmm.png
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="figure_gmm.png")
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--steps", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from free_hunch_tpu.analysis import gmm as G
    from free_hunch_tpu.analysis.gmm_guided import sample_gmm_posterior

    rng = np.random.default_rng(0)
    means = jnp.asarray([[2.0, 1.0], [-2.0, -1.0], [0.5, -2.0]], jnp.float32)
    covs = []
    for _ in range(3):
        a = rng.normal(size=(2, 2)) * 0.5
        covs.append(a @ a.T + 0.35 * np.eye(2))
    gmm = G.GaussianMixture(jnp.asarray([0.45, 0.35, 0.2], jnp.float32), means,
                            jnp.asarray(np.stack(covs), jnp.float32))

    prior = np.asarray(gmm.sample(jax.random.PRNGKey(1), (args.n,)))
    mask = np.array([1.0, 0.0], np.float32)
    y = np.array([1.5, 0.0], np.float32)
    guided, posterior = sample_gmm_posterior(gmm, mask, y, sigma_y=0.3,
                                             n=args.n, num_steps=args.steps)
    exact = np.asarray(posterior.sample(jax.random.PRNGKey(2), (args.n,)))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 4), sharex=True, sharey=True)
        for ax, pts, title in zip(
                axes, [prior, exact, guided],
                ["prior p(x0)", "exact posterior p(x0|y)",
                 "Free Hunch guided samples"]):
            ax.scatter(pts[:, 0], pts[:, 1], s=3, alpha=0.3)
            ax.axvline(y[0], color="crimson", lw=1, ls="--")
            ax.set_title(title)
            ax.set_xlim(-5, 5)
            ax.set_ylim(-5, 5)
        fig.tight_layout()
        fig.savefig(args.out, dpi=130)
        print(f"wrote {args.out}")
    except ImportError:
        # headless fallback: a density histogram rendered as PNG via PIL
        import PIL.Image

        def hist_img(pts):
            h, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=96,
                                     range=[[-5, 5], [-5, 5]])
            h = (h / max(h.max(), 1) * 255).astype(np.uint8)
            return np.rot90(h)

        panels = [hist_img(p) for p in (prior, exact, guided)]
        canvas = np.concatenate(panels, axis=1)
        PIL.Image.fromarray(canvas, "L").save(args.out)
        print(f"matplotlib unavailable; wrote histogram grid {args.out}")

    # quantitative summary (what the notebook eyeballs)
    for name, pts in [("exact", exact), ("guided", guided)]:
        print(f"{name}: mean={pts.mean(axis=0).round(3)}, "
              f"cov_diag={np.diag(np.cov(pts.T)).round(3)}")


if __name__ == "__main__":
    main()
