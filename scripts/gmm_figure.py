#!/usr/bin/env python
"""Gaussian-mixture analytic figures (reference ``notebooks/figure_2.ipynb`` /
``figure_example.ipynb`` / ``diffusion_gaussian_mixture_utils.py:926``).

Two outputs from one script:

* default (Figure-2 artifact): guided posterior sampling on the analytic 2-D
  GMM, guided samples overlaid on the exact conditional posterior density, one
  panel per guidance gradient mode ->
  docs/figures/gmm_figure2.png + docs/figures/gmm_figure2.json (the
  quantitative W2/mode-weight table backing the picture).
* ``--demo [--out PNG]`` (figure_example-style): a 3-panel
  prior / exact-posterior / guided-samples scatter grid, with a headless PIL
  histogram fallback when matplotlib is unavailable.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def run_demo(args):
    """3-panel prior/exact/guided grid (reference figure_example.ipynb)."""
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


def run_figure2():
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from free_hunch_tpu.analysis import gmm as G
    from free_hunch_tpu.analysis.gmm_guided import sample_gmm_posterior

    rng = np.random.default_rng(3)
    means = jnp.asarray([[2.0, 1.5], [-2.0, -1.0]], jnp.float32)
    covs = []
    for _ in range(2):
        a = rng.normal(size=(2, 2)) * 0.4
        covs.append(a @ a.T + 0.3 * np.eye(2))
    gmm = G.GaussianMixture(jnp.asarray([0.5, 0.5], jnp.float32), means,
                            jnp.asarray(np.stack(covs), jnp.float32))
    mask = np.array([0.0, 1.0], np.float32)
    y = np.array([0.0, 0.4], np.float32)
    sigma_y = 0.8

    def w2_1d(a, b):
        n = min(len(a), len(b))
        qa = np.sort(a)[np.linspace(0, len(a) - 1, n).astype(int)]
        qb = np.sort(b)[np.linspace(0, len(b) - 1, n).astype(int)]
        return float(np.sqrt(np.mean((qa - qb) ** 2)))

    modes = [("vjp", {}),
             ("hybrid (vjp below σ=5)", dict(guidance_gradient="hybrid",
                                             guidance_vjp_below=5.0)),
             ("covariance", dict(guidance_gradient="covariance"))]
    results, sample_sets = {}, {}
    posterior = None
    for name, kw in modes:
        s, posterior = sample_gmm_posterior(gmm, mask, y, sigma_y, n=4096,
                                            num_steps=50, mechanism_kwargs=kw)
        sample_sets[name] = s
        exact = np.asarray(posterior.sample(jax.random.PRNGKey(7), (4096,)))
        pm = np.asarray(posterior.means)
        d0 = np.linalg.norm(s - pm[0], axis=1)
        d1 = np.linalg.norm(s - pm[1], axis=1)
        results[name] = dict(
            w2_over_spread=[round(w2_1d(s[:, d], exact[:, d])
                                  / float(exact[:, d].std()), 3)
                            for d in range(2)],
            mode0_weight=round(float((d0 < d1).mean()), 3))
        print(name, results[name], file=sys.stderr, flush=True)
    d0e = np.linalg.norm(
        np.asarray(posterior.sample(jax.random.PRNGKey(7), (4096,)))
        - np.asarray(posterior.means)[0], axis=1)
    d1e = np.linalg.norm(
        np.asarray(posterior.sample(jax.random.PRNGKey(7), (4096,)))
        - np.asarray(posterior.means)[1], axis=1)
    results["exact"] = dict(mode0_weight=round(float((d0e < d1e).mean()), 3))

    # density grid of the exact posterior
    xs = np.linspace(-4.5, 4.5, 220)
    ys = np.linspace(-3.5, 4.0, 220)
    XX, YY = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], axis=-1), jnp.float32)
    dens = np.asarray(jnp.exp(posterior.log_prob(pts))).reshape(XX.shape)

    fig, axes = plt.subplots(1, len(modes), figsize=(4.2 * len(modes), 4.2),
                             sharex=True, sharey=True)
    for ax, (name, _) in zip(axes, modes):
        ax.contourf(XX, YY, dens, levels=12, cmap="Greys")
        s = sample_sets[name]
        ax.scatter(s[:800, 0], s[:800, 1], s=4, alpha=0.45, color="#cc5500",
                   linewidths=0)
        r = results[name]
        ax.set_title(f"{name}\nW2/spread {r['w2_over_spread']}, "
                     f"w0 {r['mode0_weight']} (exact "
                     f"{results['exact']['mode0_weight']})", fontsize=9)
        ax.set_xlim(xs[0], xs[-1]); ax.set_ylim(ys[0], ys[-1])
    fig.suptitle("Free Hunch guided sampling vs exact GMM posterior "
                 "(y = x₁ + ε, σ_y=0.8) — reference figure_2.ipynb protocol",
                 fontsize=10)
    fig.tight_layout()
    os.makedirs("docs/figures", exist_ok=True)
    fig.savefig("docs/figures/gmm_figure2.png", dpi=130)
    with open("docs/figures/gmm_figure2.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--demo", action="store_true",
                   help="3-panel prior/exact/guided demo instead of Figure 2")
    p.add_argument("--out", default="figure_gmm.png",
                   help="demo-mode output path")
    p.add_argument("--n", type=int, default=2000, help="demo-mode sample count")
    p.add_argument("--steps", type=int, default=40, help="demo-mode ODE steps")
    args = p.parse_args()
    if args.demo:
        run_demo(args)
    else:
        run_figure2()


if __name__ == "__main__":
    main()
