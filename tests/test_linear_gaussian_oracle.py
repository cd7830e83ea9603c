"""Image-scale exact-posterior oracle: the full production pipeline
(FreeHunch dct_diagonal covariance + tailored CG + EDM Heun scan + FFT blur
operator) must reproduce the CLOSED-FORM Gaussian posterior of a linear
inverse problem with a DCT-diagonal Gaussian prior — in both guidance
gradient modes (Tweedie: sigma^2 J = Sigma_0 exactly, so the covariance
product and the vjp coincide for Gaussian data).

This is the imaging analogue of the GMM golden test: it exercises the DCT
basis, d=3072 dimensionality, and the real measurement operators, none of
which the 2-D GMM can reach. Measured levels (n=256, 40 Heun steps, after
the design.md §9 precision fix): mean |z| max ~0.25 (the n=256 sample-mean
noise floor), posterior-variance trace ratio 1.014 — and it converges to 1
with step count (1.067 / 1.014 / 1.002 at 20/40/80), i.e. genuine
discretisation bias. The oracle caught the §9 TPU instability: the first
measurement read 1.17 at 40 steps, which was matmul-precision noise.
"""
import os
import tempfile

import numpy as np
import pytest

from free_hunch_tpu.analysis.linear_gaussian import (
    dense_operator_matrix, exact_posterior, idct_basis_matrix,
    make_smooth_spectrum, sample_linear_gaussian_posterior)

SHAPE = (3, 32, 32)
OPERATOR = dict(name="gaussian_blur", kernel_size=9, intensity=1.5)
SIGMA_Y = 0.1


def _run(mode, **extra_mech):
    v = make_smooth_spectrum(SHAPE, decades=4.0, v_max=30.0)
    with tempfile.TemporaryDirectory() as td:
        samples, y, op, _ = sample_linear_gaussian_posterior(
            v, img_shape=SHAPE, operator_kwargs=OPERATOR, sigma_y=SIGMA_Y,
            data_dir=td, n=256, num_steps=40,
            mechanism_kwargs=dict(guidance_gradient=mode, **extra_mech))
    A = dense_operator_matrix(op, SHAPE)
    B = idct_basis_matrix(SHAPE)
    mu, Sig = exact_posterior(A, B, v, y, SIGMA_Y)

    m = samples.mean(0)
    post_std = np.sqrt(np.diag(Sig))
    z = (m - mu) / np.maximum(post_std, 1e-8)
    centered = (B.T @ (samples - m).T).T
    var_got = centered.var(0)
    var_exact = np.diag(B.T @ Sig @ B)
    ratio = var_got / np.maximum(var_exact, 1e-12)
    return dict(
        z_max=float(np.abs(z).max()),
        z_median=float(np.median(np.abs(z))),
        mean_rel_l2=float(np.linalg.norm(m - mu) / np.linalg.norm(mu)),
        var_ratio_median=float(np.median(ratio)),
        trace_ratio=float(var_got.sum() / var_exact.sum()))


@pytest.fixture(scope="module")
def stats():
    return {mode: _run(mode) for mode in ("vjp", "covariance")}


@pytest.mark.parametrize("mode", ["vjp", "covariance"])
def test_posterior_moments_match_exact(stats, mode):
    s = stats[mode]
    # mean: per-coordinate z-scores at the n=256 sample-noise floor
    assert s["z_max"] < 0.5, s
    assert s["z_median"] < 0.12, s
    assert s["mean_rel_l2"] < 0.15, s
    # covariance: per-DCT-coordinate variances within the measured
    # discretisation-bias band (trace ratio 1.014 at 40 steps post-§9-fix)
    assert 0.85 < s["var_ratio_median"] < 1.25, s
    assert 0.85 < s["trace_ratio"] < 1.2, s


def test_covariance_mode_matches_vjp_mode(stats):
    """The Tweedie equivalence at image scale: both modes land on the same
    posterior statistics (the shared trace inflation is pipeline bias)."""
    a, b = stats["vjp"], stats["covariance"]
    assert abs(a["trace_ratio"] - b["trace_ratio"]) < 0.15, (a, b)
    assert abs(a["mean_rel_l2"] - b["mean_rel_l2"]) < 0.05, (a, b)


def test_cg_warm_start_prev_posterior_quality(stats):
    """Probative quality gate for the cg_warm_start='prev' production
    default (cross-stage CG solution recycling): against the CLOSED-FORM
    posterior, recycling must land on the same posterior statistics as the
    reference 'b' start — a real quality measure, unlike the random-init
    256px throughput A/B (docs/bench/cg_warm_start_ab.json) whose PSNR is
    noise-level by construction."""
    s = _run("vjp", cg_warm_start="prev")
    # absolute: the same oracle thresholds every mode must meet
    assert s["z_max"] < 0.5, s
    assert s["z_median"] < 0.12, s
    assert s["mean_rel_l2"] < 0.15, s
    assert 0.85 < s["var_ratio_median"] < 1.25, s
    assert 0.85 < s["trace_ratio"] < 1.2, s
    # relative: statistically indistinguishable from the 'b' start
    b = stats["vjp"]
    assert abs(s["trace_ratio"] - b["trace_ratio"]) < 0.15, (s, b)
    assert abs(s["mean_rel_l2"] - b["mean_rel_l2"]) < 0.05, (s, b)


def test_fine_schedule_stability():
    """Regression guard for the round-3 fine-schedule divergence (design.md
    §9): at 80+ Heun steps most in-window BFGS pairs carry no information
    (the time-updated state already satisfies the secant), and appending
    them under reduced-precision matmuls random-walked the state to
    max|x| ~ 4e5 on TPU. Fixed by full-precision state algebra
    (ops/dct.py, ops/lowrank.py) + the secant-novelty guard
    (bfgs_secant_novelty_min). This run must stay at sane magnitudes."""
    v = make_smooth_spectrum(SHAPE, decades=4.0, v_max=30.0)
    with tempfile.TemporaryDirectory() as td:
        samples, _, _, _ = sample_linear_gaussian_posterior(
            v, img_shape=SHAPE, operator_kwargs=OPERATOR, sigma_y=SIGMA_Y,
            data_dir=td, n=32, num_steps=80,
            mechanism_kwargs=dict(guidance_gradient="vjp", cov_capacity=16))
    assert np.isfinite(samples).all()
    assert np.abs(samples).max() < 20.0, np.abs(samples).max()
    assert 0.5 < samples.std() < 3.0, samples.std()
