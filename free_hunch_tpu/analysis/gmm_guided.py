"""Guided posterior sampling on the analytic GMM testbed.

Parity: reference ``notebooks/diffusion_gaussian_mixture_utils.py``'s guided
samplers (``sample_ode_with_second_order_bfgs_updates:926`` and the
prior-sample ODE :568) and ``figure_2.ipynb`` — the experiment that validates
the Free Hunch estimator against exact conditional posteriors with no trained
network.

Here the full production stack runs on the toy problem: the analytic GMM
denoiser is wrapped in the framework's (mean, var) contract, images are
(B, d, 1, 1), the measurement is a coordinate mask (inpainting), and the
FreeHunch mechanism + EDM Heun scan sample the posterior.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.analysis import gmm as G
from free_hunch_tpu.guidance.mechanisms import FreeHunch
from free_hunch_tpu.operators import get_operator
from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan


def gmm_image_denoiser(gmm: G.GaussianMixture):
    """Wrap the exact GMM denoiser in the (B, d, 1, 1) image contract."""
    d = gmm.dim

    def denoise(x, sigma):
        flat = x.reshape(x.shape[0], d)
        mean = G.denoiser_mean(gmm, flat, sigma)
        var = jnp.broadcast_to(sigma**2 / (1 + sigma**2), flat.shape)
        return mean.reshape(x.shape), var.reshape(x.shape)

    return denoise


def sample_gmm_posterior(gmm: G.GaussianMixture, observed_mask: np.ndarray,
                         y_value: np.ndarray, sigma_y: float, *, n: int = 512,
                         num_steps: int = 30, key=None,
                         mechanism_kwargs: Optional[dict] = None
                         ) -> Tuple[np.ndarray, G.GaussianMixture]:
    """Sample p(x0 | y = mask*x0 + noise) with the Free Hunch pipeline.

    Returns (samples (n, d), exact posterior mixture for comparison).
    """
    d = gmm.dim
    key = key if key is not None else jax.random.PRNGKey(0)
    mask = np.asarray(observed_mask, np.float32)

    op = get_operator(name="inpainting", sigma_s=sigma_y,
                      mask=mask.reshape(1, d, 1, 1), in_shape=(1, d, 1, 1))
    mkw = dict(cond_scaling=1.0, clip_x0_mean=False,
               init_denoiser_variance=1.0, data_dim=d, cov_capacity=16,
               image_base_covariance="identity",
               # space updates only in the mid-sigma window, as the paper
               # configures (BFGS pairs at tiny sigma are noise-dominated)
               space_step_update_lower_threshold=1.0,
               space_step_update_threshold=10.0,
               denoiser_mean_error_threshold=1e9, max_rtol=1e-4,
               transport_mean_bound=10.0, guidance_update_bound=20.0,
               cg_maxiter=50)
    mkw.update(mechanism_kwargs or {})
    sigma_max = 20.0
    mech = FreeHunch(forward_operator=op, init_noise_variance=sigma_max**2,
                     **mkw)

    denoise = gmm_image_denoiser(gmm)
    # a light-weight round_sigma: no grid snapping on the toy problem
    xs, sigma0_scaled = prepare_schedule(
        round_sigma=lambda s, return_index=False: s,
        net_sigma_min=1e-3, net_sigma_max=sigma_max, num_steps=num_steps,
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        sigma_min=2e-3, sigma_max=sigma_max)

    y_img = jnp.asarray((mask * np.asarray(y_value)).reshape(1, d, 1, 1)
                        * np.ones((n, 1, 1, 1), np.float32))
    noise = jax.random.normal(jax.random.fold_in(key, 0), (n, d, 1, 1))

    run = jax.jit(lambda nz, yv, k: sample_scan(
        denoise, mech, nz, yv, xs, k, sigma0_scaled=sigma0_scaled))
    x, _ = run(noise, y_img, jax.random.fold_in(key, 1))

    A = np.zeros((int(mask.sum()), d))
    rows = np.where(mask > 0)[0]
    for i, r in enumerate(rows):
        A[i, r] = 1.0
    posterior = G.posterior_given_y(gmm, jnp.asarray(A),
                                    jnp.asarray(np.asarray(y_value)[rows]),
                                    sigma_y)
    return np.asarray(x).reshape(n, d), posterior
