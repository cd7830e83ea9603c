"""End-to-end guided sampling on a tiny random UNet: every mechanism runs
inside one jitted lax.scan, produces finite in-range images, and the
Free Hunch covariance state accumulates BFGS columns."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from free_hunch_tpu.guidance import choose_conditioning_mechanism
from free_hunch_tpu.models.precond import IDDPMLinearPrecond
from free_hunch_tpu.models.unet import UNetConfig, UNetModel
from free_hunch_tpu.operators import get_operator
from free_hunch_tpu.samplers import conditional_sampler

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

RES = 32
BATCH = 2


@functools.lru_cache(maxsize=1)
def _net():
    cfg = UNetConfig(image_size=RES, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                     channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                     dtype=jnp.float32, remat=False)
    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES)),
                        jnp.zeros((1,)))
    # randomise the zero_module layers so the UNet actually contributes
    # (a fresh init computes F(x) == 0 -> denoiser degenerates to clip(x))
    from free_hunch_tpu.models.loading import randomize_zero_leaves
    params = randomize_zero_leaves(params)
    pre = IDDPMLinearPrecond(model, img_resolution=RES, img_channels=3)
    denoise = lambda x, s: pre.apply(params, x, s)
    return pre, denoise


def _operator(name):
    if name == "inpainting":
        return get_operator(name="inpainting", sigma_s=0.05,
                            mask_opt={"mask_type": "random", "image_size": RES,
                                      "mask_prob_range": (0.2, 0.4)},
                            mask_key=jax.random.PRNGKey(7),
                            in_shape=(1, 3, RES, RES))
    if name == "gaussian_blur":
        k = np.exp(-0.5 * (np.mgrid[-3:4, -3:4][0] ** 2
                           + np.mgrid[-3:4, -3:4][1] ** 2) / 1.5**2)
        return get_operator(name="gaussian_blur", in_shape=(1, 3, RES, RES),
                            sigma_s=0.05, kernel=k / k.sum())
    if name == "super_resolution":
        return get_operator(name="super_resolution", in_shape=(1, 3, RES, RES),
                            scale_factor=2, sigma_s=0.05)
    raise ValueError(name)


def _run(mechanism_name, operator_name, num_steps=4, solver="heun", **kw):
    pre, denoise = _net()
    op = _operator(operator_name)
    mech_cls = choose_conditioning_mechanism(mechanism_name)
    kwargs = dict(cond_scaling=1.0, forward_operator=op, clip_x0_mean=True,
                  cg_maxiter=50)
    if mechanism_name == "online_covariance":
        kwargs.update(init_denoiser_variance=1.0, init_noise_variance=1.0,
                      data_dim=3 * RES * RES, cov_capacity=32,
                      space_step_update_lower_threshold=0.01,
                      space_step_update_threshold=50.0)
    if mechanism_name == "diffpir":
        kwargs.update(diffpir_lambda=10.0)
    kwargs.update(kw)
    mech = mech_cls(**kwargs)

    cond = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (BATCH, 3, RES, RES)),
                       jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 3, RES, RES))
    x, x_all, y = conditional_sampler(
        denoise, noise, cond, op, mech, rng_key=jax.random.PRNGKey(3),
        round_sigma=pre.round_sigma, net_sigma_min=pre.sigma_min,
        net_sigma_max=pre.sigma_max, num_steps=num_steps, solver=solver,
        discretization="edm", schedule="linear", scaling="none")
    assert x.shape == (BATCH, 3, RES, RES)
    assert np.isfinite(np.asarray(x)).all()
    return np.asarray(x)


@pytest.mark.parametrize("mech", ["dps", "pigdm", "pigdm_videodiff_schedule",
                                  "diffpir", "peng_convert", "peng_analytic",
                                  "tmpd"])
def test_mechanisms_run_e2e_inpainting(mech):
    x = _run(mech, "inpainting")
    assert np.abs(x).max() < 50  # sane dynamic range after 4 steps


def test_dps_gaussian_blur_and_sr():
    _run("dps", "gaussian_blur")
    _run("dps", "super_resolution")


def test_free_hunch_e2e_identity_basis():
    x = _run("online_covariance", "inpainting", num_steps=4)
    assert np.abs(x).max() < 50


def test_free_hunch_e2e_dct_basis_blur():
    x = _run("online_covariance", "gaussian_blur", num_steps=3,
             image_base_covariance="dct_diagonal_noinfo")
    assert np.isfinite(x).all()


def test_free_hunch_e2e_dct_basis_super_resolution():
    """FreeHunch + SR exercises the spectral CG preconditioner's polyphase
    low-frequency slice (solvers.sr_mat_cg cov_fourier_spec path)."""
    x = _run("online_covariance", "super_resolution", num_steps=3,
             image_base_covariance="dct_diagonal_noinfo")
    assert np.isfinite(x).all()


def test_free_hunch_state_accumulates_columns():
    pre, denoise = _net()
    op = _operator("inpainting")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        init_denoiser_variance=1.0, init_noise_variance=4.0,
        data_dim=3 * RES * RES, cov_capacity=32, cg_maxiter=25,
        space_step_update_lower_threshold=0.0,
        space_step_update_threshold=1e9)
    state = mech.init_state(BATCH, (3, RES, RES))
    rng = np.random.default_rng(5)
    y = op.forward(jnp.asarray(rng.uniform(-1, 1, (BATCH, 3, RES, RES)), jnp.float32),
                   noiseless=True)
    x = jnp.asarray(rng.normal(size=(BATCH, 3, RES, RES)) * 2.0, jnp.float32)

    # call 1 @ sigma=2: no history -> no updates
    x0a, state = mech(denoise, x, y, 2.0, state)
    assert int(state.cov.k[0]) == 0 and int(state.step) == 1
    # call 2 @ sigma=2, new x: same sigma -> space update appends 2 columns
    x0b, state = mech(denoise, x + 0.1 * jnp.asarray(rng.normal(size=x.shape),
                                                     jnp.float32), y, 2.0, state)
    assert int(state.cov.k[0]) == 2
    # call 3 @ sigma=1.2, new x: time update + space update
    x0c, state = mech(denoise, x0b + 0.05, y, 1.2, state)
    assert int(state.cov.k[0]) == 4
    assert float(state.prev_sigma) == pytest.approx(1.2)
    for v in (x0a, x0b, x0c):
        assert np.isfinite(np.asarray(v)).all()


def test_euler_solver_single_call_per_step():
    x = _run("dps", "inpainting", solver="euler")
    assert np.isfinite(x).all()


def test_sample_scan_collects_cg_diagnostics():
    """collect_diagnostics returns per-step per-stage CG iteration counts
    (VERDICT r1 #4: the reference discards its torch-CG info dict)."""
    from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan

    pre, denoise = _net()
    op = _operator("gaussian_blur")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=True,
        init_denoiser_variance=1.0, init_noise_variance=1.0,
        data_dim=3 * RES * RES, cov_capacity=16, cg_maxiter=40,
        space_step_update_lower_threshold=0.01,
        space_step_update_threshold=50.0)
    num_steps = 3
    xs, s0 = prepare_schedule(round_sigma=pre.round_sigma,
                              net_sigma_min=pre.sigma_min,
                              net_sigma_max=pre.sigma_max, num_steps=num_steps,
                              solver="heun", discretization="edm",
                              schedule="linear", scaling="none")
    noise = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 3, RES, RES))
    cond = jnp.asarray(np.random.default_rng(6).uniform(-1, 1, (BATCH, 3, RES, RES)),
                       jnp.float32)
    y = op.forward(cond, noiseless=True)
    x, _, diag = jax.jit(
        lambda n, y_, k: sample_scan(denoise, mech, n, y_, xs, k,
                                     sigma0_scaled=s0, collect_diagnostics=True)
    )(noise, y, jax.random.PRNGKey(5))
    niter = np.asarray(diag["cg_niter"])
    res = np.asarray(diag["cg_resnorm"])
    assert niter.shape == (num_steps, 2) and res.shape == (num_steps, 2)
    # stage counts are recorded; the very first solve may take 0 iterations
    # (at sigma_max the rtol schedule is 1.0, so x=0 already satisfies it —
    # same as the reference), later solves must iterate
    assert (niter[:, 0] >= 0).all() and niter[1:, 0].max() > 0
    assert niter[-1, 0] > 0 and niter[-1, 1] == -1  # final Euler step: one stage
    assert np.isfinite(np.asarray(x)).all()

    # Euler-only run: second column is all -1
    xs_e, s0_e = prepare_schedule(round_sigma=pre.round_sigma,
                                  net_sigma_min=pre.sigma_min,
                                  net_sigma_max=pre.sigma_max, num_steps=2,
                                  solver="euler", discretization="edm",
                                  schedule="linear", scaling="none")
    _, _, diag_e = jax.jit(
        lambda n, y_, k: sample_scan(denoise, mech, n, y_, xs_e, k,
                                     sigma0_scaled=s0_e, collect_diagnostics=True)
    )(noise, y, jax.random.PRNGKey(6))
    assert (np.asarray(diag_e["cg_niter"])[:, 1] == -1).all()


def test_cg_warm_start_prev_matches_b_at_tight_rtol():
    """cg_warm_start='prev' recycles the previous stage's CG solution as the
    next solve's start. With the rtol schedule capped tight, every solve
    converges, solutions are unique, and the two modes must produce the same
    trajectory (the recycled start only changes the path, not the solution)."""
    common = dict(num_steps=3, image_base_covariance="dct_diagonal_noinfo",
                  max_rtol=1e-6, cg_maxiter=500)
    xb = _run("online_covariance", "gaussian_blur", **common)
    xp = _run("online_covariance", "gaussian_blur", cg_warm_start="prev",
              **common)
    scale = np.abs(xb).max()
    assert np.abs(xp - xb).max() < 1e-3 * scale


def test_free_hunch_analytic_var_at_end():
    """use_analytic_var_at_end=True (reference :273-278): below
    mle_sigma_thres the guidance system is solved against the recon-MSE
    analytic variance instead of the online covariance — a lax.cond branch
    that was previously untested. The EDM schedule's final steps sit well
    below the default 0.2 threshold, so the branch is exercised; the run
    must stay finite in both CG warm-start modes, and at tight rtol the two
    modes must agree (unique solutions in BOTH cond branches)."""
    common = dict(num_steps=3, image_base_covariance="dct_diagonal_noinfo",
                  use_analytic_var_at_end=True, max_rtol=1e-6, cg_maxiter=500)
    xb = _run("online_covariance", "gaussian_blur", **common)
    assert np.abs(xb).max() < 50
    xp = _run("online_covariance", "gaussian_blur", cg_warm_start="prev",
              **common)
    scale = np.abs(xb).max()
    assert np.abs(xp - xb).max() < 1e-3 * scale
    # the covariance fast mode's analytic-regime gradient (var*mat/sigma^2)
    # rides the same cond — run it once for coverage
    xc = _run("online_covariance", "gaussian_blur",
              guidance_gradient="covariance", **common)
    assert np.isfinite(xc).all()


def test_cg_warm_start_validates():
    op = _operator("inpainting")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        init_denoiser_variance=1.0, init_noise_variance=4.0,
        data_dim=3 * RES * RES, cov_capacity=8, cg_warm_start="banana")
    state = mech.init_state(1, (3, RES, RES))
    _, denoise = _net()
    x = jnp.zeros((1, 3, RES, RES))
    with pytest.raises(ValueError, match="cg_warm_start"):
        mech(denoise, x, op.forward(x, noiseless=True), 2.0, state)


def test_prev_u_nan_does_not_poison_the_chain():
    """A non-finite recycled CG solution must not poison every later solve:
    the mechanism zeroes non-finite entries before storing prev_u, so the
    next stage falls back to a cold start instead of starting at NaN."""
    op = _operator("gaussian_blur")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        init_denoiser_variance=1.0, init_noise_variance=4.0,
        data_dim=3 * RES * RES, cov_capacity=8, cg_warm_start="prev",
        cg_maxiter=20)
    state = mech.init_state(BATCH, (3, RES, RES))
    state = state._replace(prev_u=jnp.full_like(state.prev_u, jnp.nan),
                           step=jnp.asarray(1, jnp.int32))  # marks u "valid"
    _, denoise = _net()
    x = jnp.zeros((BATCH, 3, RES, RES))
    y = op.forward(x, noiseless=True)
    x0_new, new_state = mech(denoise, x, y, 2.0, state)
    assert np.isfinite(np.asarray(new_state.prev_u)).all()
    assert np.isfinite(np.asarray(x0_new)).all()
    # and the recovered carry produces a normal solve on the following call
    x0_2, s2 = mech(denoise, x, y, 1.5, new_state)
    assert np.isfinite(np.asarray(x0_2)).all()
    assert np.isfinite(np.asarray(s2.prev_u)).all()


def test_hybrid_never_vjp_equals_covariance_mode_with_analytic_var():
    """guidance_gradient='hybrid' with guidance_vjp_below=0 never takes the
    pullback branch, so it must match 'covariance' mode exactly — INCLUDING
    in the low-sigma analytic regime, where the matching product is
    var*mat/sigma^2 (the hybrid fallback used to apply Sigma_0*mat/sigma^2
    to a mat solved against var*I there)."""
    common = dict(num_steps=3, image_base_covariance="dct_diagonal_noinfo",
                  use_analytic_var_at_end=True, cg_maxiter=50)
    xc = _run("online_covariance", "gaussian_blur",
              guidance_gradient="covariance", **common)
    xh = _run("online_covariance", "gaussian_blur",
              guidance_gradient="hybrid", guidance_vjp_below=0.0, **common)
    np.testing.assert_allclose(xh, xc, atol=1e-5)
