"""guidance_gradient='covariance': Sigma_0 mat / sigma^2 replaces the vjp
pullback through the denoiser (the reference's commented-out primary
alternative at conditioning_mechanisms.py:283 and its large-update fallback
:285-288). Three guarantees:

1. wiring — covariance mode is EXACTLY the vjp mode with the fallback forced
   on every call (same compiled algebra, no pullback traced);
2. exactness — for Gaussian data the online covariance is exact under time
   updates, so by Tweedie (Sigma_0 = sigma^2 J) both modes must produce the
   same guided samples;
3. quality — on the bimodal analytic GMM (nonlinear denoiser, estimate only
   approximate) the covariance-gradient samples must still reproduce the
   exact conditional posterior at the same thresholds as the vjp path
   (reference figure_2.ipynb protocol).
"""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.analysis import gmm as G
from free_hunch_tpu.analysis.gmm_guided import sample_gmm_posterior
import pytest

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _bimodal_gmm(seed=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray([[2.0, 1.5], [-2.0, -1.0]], jnp.float32)
    covs = []
    for _ in range(2):
        a = rng.normal(size=(2, 2)) * 0.4
        covs.append(a @ a.T + 0.3 * np.eye(2))
    return G.GaussianMixture(jnp.asarray([0.5, 0.5], jnp.float32), means,
                             jnp.asarray(np.stack(covs), jnp.float32))


def test_covariance_mode_equals_forced_fallback():
    """vjp mode with denoiser_mean_error_threshold=-1 takes the
    Sigma_0 mat / sigma^2 fallback on every call — its samples must match
    covariance mode exactly (same algebra, pullback merely untraced)."""
    gmm = _bimodal_gmm()
    mask = np.array([0.0, 1.0], np.float32)
    y = np.array([0.0, 0.4], np.float32)
    common = dict(n=64, num_steps=8, key=jax.random.PRNGKey(11))

    forced, _ = sample_gmm_posterior(
        gmm, mask, y, 0.8, mechanism_kwargs=dict(
            guidance_gradient="vjp", denoiser_mean_error_threshold=-1.0),
        **common)
    covg, _ = sample_gmm_posterior(
        gmm, mask, y, 0.8, mechanism_kwargs=dict(
            guidance_gradient="covariance"), **common)
    np.testing.assert_allclose(covg, forced, rtol=0, atol=1e-5)


def test_gaussian_data_covariance_equals_vjp():
    """Isotropic-Gaussian prior N(mu, c*I): the diag covariance state can
    represent the exact Sigma_0(sigma) = (1/c + 1/sigma^2)^-1 I, the time
    update transports it exactly, so Sigma_0 mat / sigma^2 == sigma^2 J^T mat
    (Tweedie) and the two modes must sample near-identical trajectories."""
    c = 0.7
    sigma_max = 20.0
    gmm = G.GaussianMixture(jnp.asarray([1.0], jnp.float32),
                            jnp.asarray([[0.8, -0.4]], jnp.float32),
                            jnp.asarray([np.eye(2) * c], jnp.float32))
    mask = np.array([1.0, 0.0], np.float32)
    y = np.array([1.2, 0.0], np.float32)
    # exact denoiser variance at the schedule start
    init_var = 1.0 / (1.0 / c + 1.0 / sigma_max**2)
    common = dict(n=256, num_steps=20, key=jax.random.PRNGKey(2))

    s_vjp, posterior = sample_gmm_posterior(
        gmm, mask, y, 0.3, mechanism_kwargs=dict(
            guidance_gradient="vjp", init_denoiser_variance=init_var),
        **common)
    s_cov, _ = sample_gmm_posterior(
        gmm, mask, y, 0.3, mechanism_kwargs=dict(
            guidance_gradient="covariance", init_denoiser_variance=init_var),
        **common)

    # per-sample trajectory agreement (linear dynamics, exact estimate)
    scale = np.abs(s_vjp).max()
    assert np.abs(s_cov - s_vjp).max() < 0.01 * scale + 0.01, (
        np.abs(s_cov - s_vjp).max(), scale)

    # and both match the exact Gaussian posterior moments
    post_mean = np.asarray(posterior.means)[0]
    post_cov = np.asarray(posterior.covs)[0]
    for s in (s_vjp, s_cov):
        assert np.abs(s.mean(axis=0) - post_mean).max() < 0.15
        assert np.abs(np.cov(s.T) - post_cov).max() < 0.3 * np.abs(post_cov).max() + 0.05


def test_hybrid_gradient_bimodal_recovers_vjp_quality():
    """hybrid with the vjp active through the mode-interaction regime
    (sigma < 5 covers the ~4.5 mode separation here) must pass the SAME
    thresholds as the vjp golden test — the threshold sweep measured
    w2/spread: cov [0.27, 1.11], hyb2 [0.12, 0.38], hyb5 [0.08, 0.12]
    vs vjp [0.07, 0.12] (design.md §8)."""
    gmm = _bimodal_gmm()
    mask = np.array([0.0, 1.0], np.float32)
    y = np.array([0.0, 0.4], np.float32)

    samples, posterior = sample_gmm_posterior(
        gmm, mask, y, 0.8, n=4096, num_steps=50,
        mechanism_kwargs=dict(guidance_gradient="hybrid",
                              guidance_vjp_below=5.0))
    exact = np.asarray(posterior.sample(jax.random.PRNGKey(7), (4096,)))
    for d in range(2):
        w2 = _w2_1d(samples[:, d], exact[:, d])
        spread = exact[:, d].std()
        assert w2 < 0.25 * spread + 0.1, (d, w2, spread)


def _w2_1d(a: np.ndarray, b: np.ndarray) -> float:
    n = min(len(a), len(b))
    qa = np.sort(a)[np.linspace(0, len(a) - 1, n).astype(int)]
    qb = np.sort(b)[np.linspace(0, len(b) - 1, n).astype(int)]
    return float(np.sqrt(np.mean((qa - qb) ** 2)))


def test_covariance_gradient_bimodal_posterior_quality():
    """Bimodal GMM, nonlinear denoiser: the covariance estimate is only
    approximate, so this measures the actual quality cost of dropping the
    vjp — the STRESS case for the mode (a 2-D posterior whose local Jacobian
    varies sharply between modes; 256px image denoisers are far smoother).

    Measured levels (n=4096, 50 steps, f64 test config): the vjp golden test
    passes W2 < 0.25*spread; covariance mode recovers the mode WEIGHTS at the
    same accuracy but distorts the within-mode shape to W2 ~ 0.6*spread.
    This test guards that measured level (regression bound, not parity):
    docs/design.md 'Guidance gradient' documents the tradeoff."""
    gmm = _bimodal_gmm()
    mask = np.array([0.0, 1.0], np.float32)
    y = np.array([0.0, 0.4], np.float32)
    sigma_y = 0.8

    samples, posterior = sample_gmm_posterior(
        gmm, mask, y, sigma_y, n=4096, num_steps=50,
        mechanism_kwargs=dict(guidance_gradient="covariance"))
    exact = np.asarray(posterior.sample(jax.random.PRNGKey(7), (4096,)))

    w = np.asarray(posterior.weights)
    assert w.min() > 0.15, f"posterior degenerated to unimodal: {w}"
    assert np.isfinite(samples).all()

    # within-mode shape: measurably worse than vjp (0.25*spread) — guard the
    # measured ~0.6*spread level with margin
    for d in range(2):
        w2 = _w2_1d(samples[:, d], exact[:, d])
        spread = exact[:, d].std()
        assert w2 < 0.9 * spread + 0.1, (d, w2, spread)

    # mode-weight recovery holds at the vjp path's own threshold
    pm = np.asarray(posterior.means)
    d0 = np.linalg.norm(samples - pm[0], axis=1)
    d1 = np.linalg.norm(samples - pm[1], axis=1)
    got_w0 = float((d0 < d1).mean())
    d0e = np.linalg.norm(exact - pm[0], axis=1)
    d1e = np.linalg.norm(exact - pm[1], axis=1)
    exact_w0 = float((d0e < d1e).mean())
    assert abs(got_w0 - exact_w0) < 0.12, (got_w0, exact_w0)


def test_hybrid_guard_forces_fallback_below_threshold():
    """The hybrid branch must apply the SAME large-update fallback as the vjp
    branch (reference conditioning_mechanisms.py:285-288): with the vjp active
    everywhere (guidance_vjp_below=inf) and the fallback forced on every call
    (threshold=-1), hybrid samples must equal covariance-mode samples exactly
    — a blown-up pullback below the sigma threshold would otherwise bypass
    the guard that the pure-vjp path has."""
    gmm = _bimodal_gmm()
    mask = np.array([0.0, 1.0], np.float32)
    y = np.array([0.0, 0.4], np.float32)
    common = dict(n=64, num_steps=8, key=jax.random.PRNGKey(11))

    hyb, _ = sample_gmm_posterior(
        gmm, mask, y, 0.8, mechanism_kwargs=dict(
            guidance_gradient="hybrid", guidance_vjp_below=1e9,
            denoiser_mean_error_threshold=-1.0), **common)
    covg, _ = sample_gmm_posterior(
        gmm, mask, y, 0.8, mechanism_kwargs=dict(
            guidance_gradient="covariance"), **common)
    np.testing.assert_allclose(hyb, covg, rtol=0, atol=1e-5)


def test_algebra_dtype_f64_requires_x64():
    """algebra_dtype='float64' without jax_enable_x64 silently computes in f32
    (astype(float64) is a no-op) — the mechanism must refuse instead of
    letting a precision-control A/B measure f32 while claiming f64."""
    import pytest

    from free_hunch_tpu.guidance.mechanisms import FreeHunch
    from free_hunch_tpu.operators import get_operator

    res = 8
    op = get_operator(name="inpainting", sigma_s=0.05,
                      mask=np.ones((1, 3, res, res), np.float32),
                      in_shape=(1, 3, res, res))
    mech = FreeHunch(forward_operator=op, cond_scaling=1.0,
                     clip_x0_mean=False, image_base_covariance="identity",
                     init_denoiser_variance=1.0, init_noise_variance=4.0,
                     data_dim=3 * res * res, cov_capacity=4,
                     solver_type="customcuda", max_rtol=1.0,
                     algebra_dtype="float64")
    assert jax.config.jax_enable_x64  # conftest default
    assert mech._adt == jnp.float64   # fine with x64 on
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="jax_enable_x64"):
            mech._adt
    finally:
        jax.config.update("jax_enable_x64", True)
