"""Golden end-to-end test: Free Hunch guided sampling on the analytic GMM
reproduces the exact conditional posterior (the paper's Figure-2 experiment,
reference figure_2.ipynb / diffusion_gaussian_mixture_utils.py:926)."""
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.analysis import gmm as G
from free_hunch_tpu.analysis.gmm_guided import sample_gmm_posterior


def test_freehunch_guided_gmm_posterior_moments():
    rng = np.random.default_rng(0)
    means = jnp.asarray([[2.0, 1.0], [-2.0, -1.0]], jnp.float32)
    covs = []
    for _ in range(2):
        a = rng.normal(size=(2, 2)) * 0.5
        covs.append(a @ a.T + 0.4 * np.eye(2))
    gmm = G.GaussianMixture(jnp.asarray([0.6, 0.4], jnp.float32), means,
                            jnp.asarray(np.stack(covs), jnp.float32))

    # observe the first coordinate: y = x[0] + noise. y=1.8 strongly selects
    # the first mode, making the posterior nearly unimodal and the moment
    # comparison sharp.
    mask = np.array([1.0, 0.0], np.float32)
    y = np.array([1.8, 0.0], np.float32)
    sigma_y = 0.3

    samples, posterior = sample_gmm_posterior(gmm, mask, y, sigma_y, n=1024,
                                              num_steps=40)
    assert np.isfinite(samples).all()

    w = np.asarray(posterior.weights)
    pm = np.asarray(posterior.means)
    post_mean = (w[:, None] * pm).sum(axis=0)
    post_cov = np.zeros((2, 2))
    for k in range(len(w)):
        d = pm[k] - post_mean
        post_cov += w[k] * (np.asarray(posterior.covs[k]) + np.outer(d, d))

    got_mean = samples.mean(axis=0)
    got_cov = np.cov(samples.T)

    err_mean = np.abs(got_mean - post_mean)
    assert err_mean.max() < 0.25, (got_mean, post_mean)
    # covariance within a factor-ish (sampler discretisation + guidance bias)
    assert np.all(np.diag(got_cov) < 4 * np.diag(post_cov) + 0.05)
    assert np.all(np.diag(got_cov) > 0.2 * np.diag(post_cov) - 0.05)
    # the observed coordinate is pinned near the measurement
    assert abs(got_mean[0] - 1.8) < 0.3
