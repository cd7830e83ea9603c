"""Golden tests against the analytic Gaussian-mixture testbed.

Mirrors the reference's validation strategy (SURVEY.md §4.2 /
notebooks/diffusion_gaussian_mixture_utils.py): exact score/Hessian
self-checks via autodiff, exact denoiser covariance vs the Free Hunch
time/space updates, and end-to-end guided posterior sampling vs the exact
conditional posterior — all with no trained network."""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.analysis import gmm as G
from free_hunch_tpu.guidance import covariance as C
from free_hunch_tpu.ops import lowrank


def _mix(dtype=jnp.float64):
    rng = np.random.default_rng(0)
    means = jnp.asarray([[2.0, 0.0], [-1.0, 1.5], [0.0, -2.0]], dtype)
    covs = []
    for _ in range(3):
        a = rng.normal(size=(2, 2))
        covs.append(a @ a.T + 0.3 * np.eye(2))
    return G.GaussianMixture(jnp.asarray([0.5, 0.3, 0.2], dtype),
                             means, jnp.asarray(np.stack(covs), dtype))


def test_score_matches_autodiff():
    """(reference gaussian_mixture_log_hessian_autograd_test:312)"""
    gmm = _mix()
    x = jnp.asarray([0.3, -0.7], jnp.float64)
    sigma = 0.8
    got = G.score(gmm, x, sigma)
    want = jax.grad(lambda z: gmm.at_noise_level(sigma).log_prob(z))(x)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_hessian_matches_autodiff():
    gmm = _mix()
    x = jnp.asarray([0.5, 0.2], jnp.float64)
    sigma = 1.3
    got = G.score_hessian(gmm, x, sigma)
    want = jax.hessian(lambda z: gmm.at_noise_level(sigma).log_prob(z))(x)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)


def test_denoiser_covariance_psd_and_limits():
    gmm = _mix()
    x = jnp.asarray([0.1, 0.1], jnp.float64)
    cov = G.denoiser_covariance(gmm, x, 0.05)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert evals.min() > -1e-8
    # sigma -> 0: covariance -> 0
    assert np.abs(np.asarray(G.denoiser_covariance(gmm, x, 1e-3))).max() < 1e-4


def test_time_update_exact_for_single_gaussian():
    """For a single Gaussian the Gaussian-family time update is EXACT: the
    estimator transported from sigma1 to sigma2 must equal the analytic
    denoiser covariance at sigma2."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 2))
    cov0 = jnp.asarray(a @ a.T + 0.5 * np.eye(2))
    gmm = G.GaussianMixture(jnp.asarray([1.0]), jnp.zeros((1, 2)), cov0[None])
    x = jnp.asarray([0.4, -0.2], jnp.float64)
    s1, s2 = 2.0, 0.7

    exact1 = G.denoiser_covariance(gmm, x, s1)
    # seed the low-rank state with the exact covariance at s1 (diag + rank-2)
    evals, evecs = np.linalg.eigh(np.asarray(exact1))
    state = lowrank.init(jnp.full((2,), 1e-9, jnp.float64), 4)
    state = lowrank.append_pair(state, jnp.asarray(evecs[:, 0]), evals[0],
                                jnp.asarray(evecs[:, 1]), evals[1])
    state2 = C.time_update(state, s1, s2)
    exact2 = G.denoiser_covariance(gmm, x, s2)
    np.testing.assert_allclose(lowrank.dense(state2), exact2, rtol=1e-5, atol=1e-8)

    # the transported denoiser mean matches the analytic mean at s2
    score1 = G.score(gmm, x, s1)
    mean2, score2 = C.transport_score(state, state2, s1, s2, x, score1)
    np.testing.assert_allclose(score2, G.score(gmm, x, s2), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(mean2, G.denoiser_mean(gmm, x, s2), rtol=1e-5, atol=1e-8)


def test_bfgs_space_update_secant_condition():
    """After a space update the covariance satisfies the BFGS secant equation
    Sigma dx = de (with de = sigma^2 (D(x') - D(x)))."""
    gmm = _mix()
    sigma = 1.1
    x = jnp.asarray([0.2, 0.5], jnp.float64)
    dx = jnp.asarray([0.05, -0.03], jnp.float64)
    m1 = G.denoiser_mean(gmm, x, sigma)
    m2 = G.denoiser_mean(gmm, x + dx, sigma)
    state = C.init_state(jnp.asarray(1.0, jnp.float64), 2, 4)
    state = C.space_update(state, sigma, x, x + dx, m1, m2)
    de = sigma**2 * (m2 - m1)
    np.testing.assert_allclose(lowrank.matvec(state, dx), de, rtol=1e-8)


def test_posterior_given_y_moments():
    """Posterior mixture matches Monte-Carlo conditioning."""
    gmm = _mix()
    A = jnp.asarray([[1.0, 0.5]])
    x_true = jnp.asarray([0.5, -0.5])
    sigma_y = 0.3
    y = A @ x_true
    post = G.posterior_given_y(gmm, A, y, sigma_y)
    assert np.isclose(float(post.weights.sum()), 1.0)
    # self-consistency: E[A x | y] should move toward y relative to the prior
    prior_mean = np.asarray(jnp.einsum("k,ki->i", gmm.weights, gmm.means))
    post_mean = np.asarray(jnp.einsum("k,ki->i", post.weights, post.means))
    yv = float(y[0])
    assert abs(float((A @ post_mean)[0]) - yv) < abs(float((A @ prior_mean)[0]) - yv)
    # samples concentrate near the measurement hyperplane
    s = post.sample(jax.random.PRNGKey(0), (4000,))
    resid = np.asarray(jnp.einsum("ij,nj->ni", A, s))[:, 0] - yv
    assert resid.std() < np.sqrt(float((A @ gmm.covs[0] @ A.T)[0, 0]))


def test_unconditional_ode_recovers_mixture_moments():
    gmm = _mix()
    x = G.sample_ode(gmm, jax.random.PRNGKey(1), 4000, sigma_max=20.0,
                     num_steps=60)
    got_mean = np.asarray(x).mean(axis=0)
    want_mean = np.asarray(jnp.einsum("k,ki->i", gmm.weights, gmm.means))
    np.testing.assert_allclose(got_mean, want_mean, atol=0.15)
    got_cov = np.cov(np.asarray(x).T)
    m = np.asarray(gmm.means)
    w = np.asarray(gmm.weights)
    want_cov = (np.einsum("k,kij->ij", w, np.asarray(gmm.covs))
                + np.einsum("k,ki,kj->ij", w, m, m)
                - np.outer(want_mean, want_mean))
    np.testing.assert_allclose(got_cov, want_cov, atol=0.3)
