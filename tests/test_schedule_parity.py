"""EDM sampler-loop parity against the reference implementation.

Drives the REFERENCE ``conditional_sampler`` (torch, imported from
/root/reference as an oracle with stubs for its missing deps) and our
``conditional_sampler`` with an identical analytic denoiser, the same
gaussian-blur measurement (sigma_s=0 => deterministic), and the same initial
noise, then compares final samples across every time-step discretization
(vp / ve / iddpm / edm / ddpm_linear), the vp noise/scaling schedules, the
Euler solver, alpha != 1, and the S_churn path (S_noise=0 keeps the churn
sigma-inflation deterministic).

This pins the host-side schedule math (``get_sigma_steps``,
generate_conditional.py:172-201) AND the loop structure — including the
reference's quirk that the first-stage derivative omits the s(t) scaling
terms while the Heun corrector includes them (:141 vs :166).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_oracle import install_reference_stubs

install_reference_stubs()

import jax.numpy as jnp  # noqa: E402
import jax.random  # noqa: E402

RES = 64
KERNEL = "/root/reference/measurement_utils/kernels/gaussian_ks61_std3.0.npy"

# every mechanism kwarg the reference sampler's **other_args surface requires
REF_OTHER = dict(
    conditioning_mechanism="dps", cond_scaling=0.3, clip_x0_mean=False,
    pigdm_posthoc_scaling=False, max_vector_count=100000, dataset_path=None,
    image_base_covariance="identity", pca_component_count=0,
    denoiser_mean_error_threshold=0.0, use_analytical_score_time_update=False,
    project_to_diagonal=False, space_step_update_threshold=10.0,
    space_step_update_lower_threshold=1.0, max_rtol=1.0, do_space_updates=True,
    use_analytic_var_at_end=False, solver_type="customcuda",
    use_rtol_func=False, diffpir_lambda=10.0)


class _FakeTorchNet(torch.nn.Module):
    """Analytic linear-Gaussian denoiser D(x, s) = x / (1 + s^2) with the
    preconditioner contract (2-tuple return, sigma_min/max, round_sigma)."""
    sigma_min, sigma_max = 0.002, 80.0

    def forward(self, x, sigma, labels=None):
        var = sigma**2 / (1 + sigma**2)
        return x / (1 + sigma**2), torch.ones_like(x) * var

    def round_sigma(self, s):
        return s


def _jax_denoise(x, sigma):
    var = sigma**2 / (1 + sigma**2)
    return x / (1 + sigma**2), jnp.ones_like(x) * var


@pytest.fixture(scope="module")
def ref_sampler():
    cwd = os.getcwd()
    os.chdir("/root/reference")  # relative kernel asset paths
    try:
        import conditioning_utils.online_update_bfgs as oub
        if not hasattr(oub, "CovarianceHessianBFGSDCTPCA"):
            oub.CovarianceHessianBFGSDCTPCA = oub.CovarianceHessianBFGSDCT
        # our repo-root generate_conditional.py shadows the reference's on
        # sys.path — load the reference module by explicit file path
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_generate_conditional",
            "/root/reference/generate_conditional.py")
        ref_gc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_gc)
        yield ref_gc
    finally:
        os.chdir(cwd)


CASES = [
    # (discretization, schedule, scaling, solver, alpha, S_churn)
    ("edm", "linear", "none", "heun", 1.0, 0.0),
    ("edm", "linear", "none", "euler", 1.0, 0.0),
    ("edm", "linear", "none", "heun", 0.5, 0.0),
    ("edm", "linear", "none", "heun", 1.0, 10.0),  # churn (S_noise=0)
    ("vp", "vp", "vp", "heun", 1.0, 0.0),
    ("ve", "ve", "none", "heun", 1.0, 0.0),
    ("iddpm", "linear", "none", "heun", 1.0, 0.0),
    ("ddpm_linear", "linear", "none", "heun", 1.0, 0.0),
]


@pytest.mark.parametrize("disc,sched,scal,solver,alpha,churn", CASES)
def test_sampler_loop_parity(ref_sampler, disc, sched, scal, solver, alpha, churn):
    from free_hunch_tpu.guidance import choose_conditioning_mechanism
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers import conditional_sampler

    rng = np.random.default_rng(0)
    noise = rng.standard_normal((1, 3, RES, RES)).astype(np.float32)
    cond = rng.uniform(-1, 1, (1, 3, RES, RES)).astype(np.float32)
    steps = 4
    # the reference's default sigma_min/max dicts lack a 'ddpm_linear' key
    # (generate_conditional.py:68-74) — that discretization only runs with
    # explicit bounds, so pass them to both implementations
    sig_kw = (dict(sigma_min=0.002, sigma_max=81.0)
              if disc == "ddpm_linear" else {})

    # --- reference (torch, float64 loop) ---------------------------------
    op_kw = dict(name="gaussian_blur", in_shape=(1, 3, RES, RES),
                 kernel_size=61, intensity=3.0, sigma_s=0.0, device="cpu")
    x_ref, _, y_ref = ref_sampler.conditional_sampler(
        _FakeTorchNet(), torch.from_numpy(noise), torch.from_numpy(cond),
        op_kw, {}, num_steps=steps, solver=solver, discretization=disc,
        schedule=sched, scaling=scal, alpha=alpha,
        S_churn=churn, S_noise=0.0, **sig_kw, **REF_OTHER)
    x_ref = x_ref.detach().numpy()

    # --- ours (jax, f32) ---------------------------------------------------
    kernel = np.load(KERNEL)
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, RES, RES),
                      sigma_s=0.0, kernel=kernel)
    mech = choose_conditioning_mechanism("dps")(
        cond_scaling=0.3, forward_operator=op, clip_x0_mean=False)
    x, _, y = conditional_sampler(
        _jax_denoise, jnp.asarray(noise), jnp.asarray(cond), op, mech,
        rng_key=jax.random.PRNGKey(0), round_sigma=lambda s: s,
        net_sigma_min=0.002, net_sigma_max=80.0, num_steps=steps,
        solver=solver, discretization=disc, schedule=sched, scaling=scal,
        alpha=alpha, S_churn=churn, S_noise=0.0, **sig_kw)
    x = np.asarray(x)

    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=2e-4, atol=2e-4)
    scale = max(np.abs(x_ref).max(), 1.0)
    np.testing.assert_allclose(x / scale, x_ref / scale, rtol=0, atol=5e-3)


def test_ddnm_sampler_loop_parity(ref_sampler):
    """DDNM+ loop parity (reference custom_ddnm_sampling.py:10-136) with
    eta=0 and sigma_y=0: every random branch coefficient vanishes (d1_t=0 and
    the singular-threshold branches are gated on sigma_y != 0,
    svd_operators.py:1161+), the remaining Lambda_noise term uses the
    *predicted* epsilon, and the measurement is noiseless — so both loops are
    fully deterministic and must agree: schedule jumps, compute_alpha's
    zero-prepended beta grid, Eq. 12/17/51, and the SVD operator factors.

    Uses super_resolution: the reference's DDNM Deblurring mis-pairs its
    Kronecker U/V columns (its A deviates ~0.19 from the true separable
    convolution even unthresholded — the tiled-vs-interleaved layout defect,
    SURVEY.md §7.4), which our exact implementation does not replicate, so
    gaussian_blur cannot match bit-for-bit by construction."""
    res, steps = 32, 5

    class _EpsNet(torch.nn.Module):
        betas = torch.linspace(1e-4, 0.02, 1000, dtype=torch.float32)

        def model(self, x, t, classes=None):
            return torch.tanh(x) * (0.1 + 1e-4 * t.view(-1, 1, 1, 1))

    def eps_jax(x, t):
        return jnp.tanh(x) * (0.1 + 1e-4 * t.reshape(-1, 1, 1, 1))

    rng = np.random.default_rng(3)
    noise = rng.standard_normal((1, 3, res, res)).astype(np.float32)
    cond = rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32)
    op_kw = dict(name="super_resolution", scale_factor=4)
    nz_kw = dict(sigma=0.0)

    cwd = os.getcwd()
    os.chdir("/root/reference")  # relative kernel asset path at call time
    try:
        x_ref, _, y_ref = ref_sampler.ddnm_conditional_sampler(
            _EpsNet(), torch.from_numpy(noise), torch.from_numpy(cond),
            op_kw, nz_kw, num_steps=steps, eta=0.0,
            use_ddnm_kernel_params=False)
    finally:
        os.chdir(cwd)
    x_ref = x_ref.detach().numpy()

    from free_hunch_tpu.samplers.ddnm import ddnm_conditional_sampler
    x, _, y = ddnm_conditional_sampler(
        eps_jax, jnp.asarray(noise), jnp.asarray(cond), op_kw, nz_kw,
        num_steps=steps, eta=0.0, rng_key=jax.random.PRNGKey(0))
    x = np.asarray(x)

    np.testing.assert_allclose(np.asarray(y).reshape(y_ref.shape),
                               y_ref.numpy(), rtol=1e-4, atol=1e-4)
    scale = max(np.abs(x_ref).max(), 1.0)
    np.testing.assert_allclose(x / scale, x_ref / scale, rtol=0, atol=5e-3)


DDNM_STOCHASTIC_CASES = [
    # (eta, sigma_y, travel_length, travel_repeat)
    (0.85, 0.0, 1, 1),    # eta>0: the Lambda/Lambda_noise eta split engages
    (0.85, 0.1, 1, 1),    # sigma_y>0: both singular-threshold branches engage
    (1.0, 0.05, 2, 2),    # RePaint time travel: re-noising branch runs
    (0.2, 0.2, 3, 2),     # all three stochastic knobs together
]


@pytest.mark.parametrize("eta,sigma_y,travel_length,travel_repeat",
                         DDNM_STOCHASTIC_CASES)
def test_ddnm_stochastic_path_parity(ref_sampler, eta, sigma_y,
                                     travel_length, travel_repeat):
    """DDNM+ parity on the STOCHASTIC paths (VERDICT r1 missing #4) against
    the reference ``ddnm_plus_diffusion`` (svd_ddnm.py:80-146 — the only
    upstream entry that honours travel_length/travel_repeat; the
    custom_ddnm_sampling wrapper hard-codes travel=1 at :85-87).

    Shared randomness: the reference draws ``torch.randn_like`` exactly once
    per schedule step (Eq. 51 noise in the forward branch, re-noising in the
    travel branch); we patch it to pop a precomputed queue and inject the
    same sequence into ``ddnm_sample(noise_seq=...)``. The measurement noise
    eps_y is shared likewise, so Lambda's eta split, Lambda_noise's
    sigma_t/a*sigma_y threshold branches (svd_operators.py:84-123), and the
    RePaint re-noising must agree step-for-step."""
    import types as _types

    from free_hunch_tpu.operators import svd as svd_ops
    from free_hunch_tpu.samplers.ddnm import (ddnm_sample, ddnm_schedule,
                                              get_schedule_jump)

    res, steps, M = 32, 6, 1000
    rng = np.random.default_rng(11)
    noise0 = rng.standard_normal((1, 3, res, res)).astype(np.float32)
    cond = rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32)
    eps_y = rng.standard_normal((1, 3 * (res // 4) ** 2)).astype(np.float32)

    times = get_schedule_jump(steps, travel_length, travel_repeat)
    n_scan = len(times) - 1
    noise_seq = rng.standard_normal((n_scan, 1, 3, res, res)).astype(np.float32)

    class _EpsNet(torch.nn.Module):
        def forward(self, x, t):
            return torch.tanh(x) * (0.1 + 1e-4 * t.view(-1, 1, 1, 1))

    def eps_jax(x, t):
        return jnp.tanh(x) * (0.1 + 1e-4 * t.reshape(-1, 1, 1, 1))

    # --- reference (torch) with patched cuda + noise queue -------------------
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_svd_ddnm", "/root/reference/ddnm_functions/svd_ddnm.py")
    ref_sd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_sd)
    spec_ops = importlib.util.spec_from_file_location(
        "ref_svd_operators", "/root/reference/ddnm_functions/svd_operators.py")
    ref_ops = importlib.util.module_from_spec(spec_ops)
    spec_ops.loader.exec_module(ref_ops)

    a_ref = ref_ops.SuperResolution(3, res, 4, "cpu")
    betas_t = torch.linspace(1e-4, 0.02, M, dtype=torch.float32)
    y_ref = (a_ref.A(torch.from_numpy(cond).reshape(1, -1))
             + sigma_y * torch.from_numpy(eps_y))

    queue = [torch.from_numpy(noise_seq[i]) for i in range(n_scan)]
    orig_randn_like, orig_to = torch.randn_like, torch.Tensor.to

    def fake_randn_like(t, *a, **k):
        return queue.pop(0).to(t.dtype).reshape(t.shape)

    def patched_to(self, *a, **k):
        a = tuple("cpu" if (isinstance(x, (str, torch.device))
                            and str(x).startswith("cuda")) else x for x in a)
        if isinstance(k.get("device"), (str, torch.device)) and str(
                k["device"]).startswith("cuda"):
            k["device"] = "cpu"
        return orig_to(self, *a, **k)

    cfg = _types.SimpleNamespace(
        diffusion=_types.SimpleNamespace(num_diffusion_timesteps=M),
        time_travel=_types.SimpleNamespace(T_sampling=steps,
                                           travel_length=travel_length,
                                           travel_repeat=travel_repeat))
    torch.randn_like = fake_randn_like
    torch.Tensor.to = patched_to
    try:
        xs_out, _ = ref_sd.ddnm_plus_diffusion(
            torch.from_numpy(noise0), _EpsNet(), betas_t, eta, a_ref, y_ref,
            sigma_y, config=cfg)
    finally:
        torch.randn_like = orig_randn_like
        torch.Tensor.to = orig_to
    assert not queue, "reference consumed fewer noise draws than scheduled"
    x_ref = xs_out[-1].detach().numpy()

    # --- ours (jax) with the same injected noise ----------------------------
    a_jax = svd_ops.SuperResolution(3, res, 4)
    y_jax = (a_jax.A(jnp.asarray(cond).reshape(1, -1))
             + sigma_y * jnp.asarray(eps_y))
    np.testing.assert_allclose(np.asarray(y_jax), y_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    x, _ = ddnm_sample(eps_jax, a_jax, jnp.asarray(noise0), y_jax,
                       num_steps=steps, sigma_y=sigma_y, eta=eta, M=M,
                       travel_length=travel_length,
                       travel_repeat=travel_repeat,
                       noise_seq=jnp.asarray(noise_seq))
    x = np.asarray(x)

    scale = max(np.abs(x_ref).max(), 1.0)
    np.testing.assert_allclose(x / scale, x_ref / scale, rtol=0, atol=5e-3)
