"""Image-scale linear-Gaussian oracle testbed.

A Gaussian prior that is diagonal in the DCT basis — exactly the production
``image_base_covariance='dct_diagonal'`` configuration — has a CLOSED-FORM
denoiser, denoiser covariance, and measurement posterior. That lets the full
guided pipeline (EDM Heun scan + FreeHunch covariance state + tailored CG +
any guidance_gradient mode) be validated end-to-end against exact posterior
moments at image scale, with the real FFT measurement operators.

This is the imaging analogue of the GMM testbed (reference
``notebooks/diffusion_gaussian_mixture_utils.py``): the GMM validates the
covariance *recursion* against a nonlinear denoiser in 2-D, but cannot
exercise the DCT basis, the d~10^3..10^5 dimensionality, or the FFT
operators. Here the prior is Gaussian, so the Free Hunch estimate should be
(near-)exact and the guided samples should reproduce the exact Gaussian
posterior N(mu_post, Sigma_post) up to ODE discretisation — for every
guidance gradient mode (Tweedie: sigma^2 J = Sigma_0 holds exactly).

Math (x in R^d, prior x ~ N(0, B diag(v) B^T) with B the orthonormal
inverse-DCT map):
  denoiser      x0(x_t, s) = B diag(v/(v+s^2)) B^T x_t
  denoiser cov  Sigma_0(s) = B diag(s^2 v/(v+s^2)) B^T
  posterior     Sigma_post = (A^T A/s_y^2 + B diag(1/v) B^T)^-1,
                mu_post    = Sigma_post A^T y / s_y^2
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.guidance.mechanisms import FreeHunch
from free_hunch_tpu.operators import get_operator
from free_hunch_tpu.ops.dct import dct_2d, idct_2d
from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan


def dct_gaussian_denoiser(v: jnp.ndarray):
    """Exact denoiser for the prior N(0, IDCT diag(v) DCT).

    ``v``: (C, H, W) per-DCT-coefficient prior variances. Returns a function
    matching the framework's ``denoise(x, sigma) -> (mean, var)`` contract.
    """
    def denoise(x, sigma):
        s2 = jnp.asarray(sigma, x.dtype) ** 2
        gain = v / (v + s2)
        mean = idct_2d(gain * dct_2d(x))
        # per-pixel posterior variance: mean of the DCT-diagonal spectrum
        # (mechanisms that consume x0_var only use its scale)
        var = jnp.broadcast_to(jnp.mean(s2 * gain), x.shape)
        return mean, var

    return denoise


def make_smooth_spectrum(img_shape: Tuple[int, int, int], *, decades: float = 4.0,
                         v_max: float = 30.0) -> np.ndarray:
    """A radially-decaying DCT variance spectrum spanning ``decades`` orders
    of magnitude — shaped like the shipped ImageNet dct_variance prior."""
    c, h, w = img_shape
    ky = np.arange(h)[:, None] / h
    kx = np.arange(w)[None, :] / w
    r = np.sqrt(ky**2 + kx**2) / np.sqrt(2.0)
    v = v_max * 10.0 ** (-decades * r)
    return np.broadcast_to(v, (c, h, w)).copy()


def dense_operator_matrix(op, img_shape: Tuple[int, int, int]) -> np.ndarray:
    """Materialise A (d, d) by pushing the identity basis through
    ``op.forward`` (noiseless). f64 on host for the oracle algebra."""
    d = int(np.prod(img_shape))
    eye = jnp.eye(d, dtype=jnp.float32).reshape((d,) + tuple(img_shape))
    cols = jax.jit(lambda e: op.forward(e, noiseless=True))(eye)
    return np.asarray(cols, np.float64).reshape(d, -1).T


def idct_basis_matrix(img_shape: Tuple[int, int, int]) -> np.ndarray:
    """B (d, d): pixel = B @ dct_coeffs, per channel block."""
    d = int(np.prod(img_shape))
    eye = jnp.eye(d, dtype=jnp.float32).reshape((d,) + tuple(img_shape))
    cols = np.asarray(idct_2d(eye), np.float64).reshape(d, -1).T
    return cols


def exact_posterior(A: np.ndarray, B: np.ndarray, v: np.ndarray,
                    y_flat: np.ndarray, sigma_y: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussian posterior (mu, Sigma) for y = A x + sigma_y n, x ~ N(0, B v B^T)."""
    prior_inv = (B / v.reshape(1, -1)) @ B.T
    H = A.T @ A / sigma_y**2 + prior_inv
    Sigma = np.linalg.inv(H)
    mu = Sigma @ (A.T @ y_flat) / sigma_y**2
    return mu, Sigma


def sample_linear_gaussian_posterior(
        v: np.ndarray, *, img_shape: Tuple[int, int, int],
        operator_kwargs: dict, sigma_y: float, data_dir: str,
        n: int = 128, num_steps: int = 40, sigma_max: float = 80.0,
        key=None, mechanism_kwargs: Optional[dict] = None):
    """Run the PRODUCTION pipeline (FreeHunch dct_diagonal + EDM Heun scan)
    on the linear-Gaussian problem. Returns
    ``(samples (n, d), y (m,), op, x_true (d,))``.

    ``data_dir`` receives a ``dct_variance.npz`` so the mechanism loads the
    prior exactly the way the CLI path does. The measurement y is broadcast
    over the sample batch in ITS OWN shape, so operators whose measurement
    grid differs from the image grid (super_resolution) work too.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    np.savez(os.path.join(data_dir, "dct_variance.npz"),
             dct_variance=v.astype(np.float32))
    d = int(np.prod(img_shape))
    vj = jnp.asarray(v, jnp.float32)

    op = get_operator(in_shape=(1,) + tuple(img_shape), sigma_s=sigma_y,
                      **operator_kwargs)
    denoise = dct_gaussian_denoiser(vj)

    # draw the ground-truth image from the prior, then the measurement
    eps = jax.random.normal(jax.random.fold_in(key, 0), (1,) + tuple(img_shape))
    x_true = idct_2d(jnp.sqrt(vj) * eps)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        x_true, jax.random.fold_in(key, 1))

    mkw = dict(cond_scaling=1.0, clip_x0_mean=False,
               image_base_covariance="dct_diagonal", data_dir=data_dir,
               init_denoiser_variance=1.0, init_noise_variance=sigma_max**2,
               data_dim=d, cov_capacity=16, max_rtol=1e-5,
               cg_maxiter=200, solver_type="customcuda")
    mkw.update(mechanism_kwargs or {})
    mech = FreeHunch(forward_operator=op, **mkw)

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=lambda s, return_index=False: s,
        net_sigma_min=2e-3, net_sigma_max=sigma_max, num_steps=num_steps,
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        sigma_min=2e-3, sigma_max=sigma_max)

    noise = jax.random.normal(jax.random.fold_in(key, 2), (n,) + tuple(img_shape))
    y_b = jnp.broadcast_to(y, (n,) + tuple(y.shape[1:]))

    run = jax.jit(lambda nz, yv, k: sample_scan(
        denoise, mech, nz, yv, xs, k, sigma0_scaled=sigma0_scaled))
    x, _ = run(noise, y_b, jax.random.fold_in(key, 3))
    return (np.asarray(x).reshape(n, d), np.asarray(y).reshape(-1),
            op, np.asarray(x_true).reshape(-1))
