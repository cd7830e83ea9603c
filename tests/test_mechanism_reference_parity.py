"""Per-call cross-framework parity for the seven STATELESS conditioning
mechanisms (DPS, PiGDM, PiGDM-videodiff, PengConvert, PengAnalytic, TMPD,
DiffPIR) against the torch reference.

The FreeHunch mechanism has its own oracle (test_freehunch_reference_parity);
until now the other seven had only e2e smoke coverage on our side. This test
drives each reference mechanism (conditioning_utils/conditioning_mechanisms.py:
DPS:52, PengConvert:65, PengAnalytic:87, TMPD:112, PiGDM:134,
PiGDM_Videodiff_schedule:154, DiffPIR:173) and ours through identical
(x_t, sigma) call sequences on the same tiny converted UNet, for both an
inpainting and a gaussian_blur measurement, comparing the updated denoiser
means call by call.

Solver-uniqueness notes baked into the sigma choices:
- scalar-variance solves (PiGDM/videodiff/DiffPIR/Peng* above threshold,
  PengAnalytic below) are closed-form on both sides -> unique, tight gates;
- PengConvert below its 0.2 threshold runs per-pixel-variance CG at rtol 1e-4
  (reference _inpainting_mat/_deblur_mat numel>1 branch, scipy x0=0) on both
  sides -> solutions unique to ~1e-4;
- TMPD uses the sigma-adaptive rtol_func_2 schedule, which is loose (>0.2)
  for all sigma > 0.1 — CG iterates are then path-dependent, so TMPD is
  driven at sigma <= 0.1 where the schedule bottoms out at 1e-4.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_oracle import install_reference_stubs

install_reference_stubs()

import jax.numpy as jnp  # noqa: E402

RES = 32
D = 3 * RES * RES


def _gauss_kernel(ks=9, std=1.5):
    g = np.exp(-0.5 * ((np.arange(ks) - (ks - 1) / 2) / std) ** 2)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


@pytest.fixture(scope="module")
def rig():
    cwd = os.getcwd()
    os.chdir("/root/reference")  # reference loads relative asset paths
    try:
        import conditioning_utils.online_update_bfgs as oub
        if not hasattr(oub, "CovarianceHessianBFGSDCTPCA"):
            # upstream imports this name but never defines it (SURVEY §7.4)
            oub.CovarianceHessianBFGSDCTPCA = oub.CovarianceHessianBFGSDCT
        from conditioning_utils import conditioning_mechanisms as ref_mech

        # this scipy renamed cg(tol=...) to rtol (same norm(b)-relative
        # semantics); the reference predates the rename
        import inspect

        import scipy.sparse.linalg as spla
        if "tol" not in inspect.signature(spla.cg).parameters:
            def _cg_compat(A, b, tol=1e-5, maxiter=None, **kw):
                return spla.cg(A, b, rtol=tol, atol=0.0, maxiter=maxiter, **kw)
            ref_mech.cg = _cg_compat
        from measurement_utils.measurements import (GaussialBlurOperator,
                                                    InpaintingOperator)
        from training.openai_preconditioning import iDDPMLinearPrecond as TorchPrecond
        from training.openai_unet import UNetModel as TorchUNet

        from free_hunch_tpu.guidance import mechanisms as my_mech
        from free_hunch_tpu.models.convert import (convert_state_dict,
                                                   randomize_zero_tensors)
        from free_hunch_tpu.models.precond import IDDPMLinearPrecond
        from free_hunch_tpu.models.unet import UNetConfig, UNetModel
        from free_hunch_tpu.operators import get_operator

        kwargs = dict(image_size=RES, in_channels=3, model_channels=32,
                      out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                      channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                      use_scale_shift_norm=True, resblock_updown=True)
        tnet = TorchUNet(**kwargs)
        tnet.load_state_dict(randomize_zero_tensors(tnet.state_dict()))
        tnet.eval()
        tpre = TorchPrecond(tnet, img_resolution=RES, img_channels=3, label_dim=0)

        cfg = UNetConfig(image_size=RES, in_channels=3, model_channels=32,
                         out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                         channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                         use_scale_shift_norm=True, resblock_updown=True,
                         dtype=jnp.float32, remat=False)
        jnet = UNetModel(cfg)
        params = convert_state_dict(tnet.state_dict(), cfg)
        jpre = IDDPMLinearPrecond(jnet, img_resolution=RES, img_channels=3)

        rng = np.random.default_rng(0)
        x_clean = rng.uniform(-1, 1, (1, 3, RES, RES)).astype(np.float32)

        # --- matched inpainting operators (mask injected, bypassing RNG)
        mask_hw = (rng.uniform(size=(RES, RES)) > 0.3).astype(np.float32)
        mask = np.broadcast_to(mask_hw, (1, 3, RES, RES)).copy()
        t_inp = InpaintingOperator.__new__(InpaintingOperator)
        t_inp.device = "cpu"
        t_inp.sigma_s = torch.tensor([0.05])
        t_inp.in_shape = (1, 3, RES, RES)
        t_inp.mask = torch.from_numpy(mask)
        j_inp = get_operator(name="inpainting", sigma_s=0.05, mask=mask,
                             in_shape=(1, 3, RES, RES))
        y_inp = (mask * x_clean).astype(np.float32)

        # --- matched gaussian_blur operators (small kernel injected; the
        # shipped 61x61 asset exceeds the 32px test image)
        kern = _gauss_kernel()
        t_blur = GaussialBlurOperator.__new__(GaussialBlurOperator)
        t_blur.device = "cpu"
        t_blur.kernel_size = kern.shape[0]
        t_blur.kernel = torch.from_numpy(kern)
        t_blur.sigma_s = torch.tensor([0.05])
        t_blur.in_shape = (1, 3, RES, RES)
        j_blur = get_operator(name="gaussian_blur", sigma_s=0.05, kernel=kern,
                              in_shape=(1, 3, RES, RES))
        # forward() also stores the reference's pre_calculated FFT tuple
        y_ref = t_blur.forward(torch.from_numpy(x_clean), noiseless=True).numpy()
        y_blur = np.asarray(j_blur.forward(jnp.asarray(x_clean), noiseless=True))
        np.testing.assert_allclose(y_blur, y_ref, atol=1e-5)

        # --- matched super_resolution operators (shipped bicubic kernel; the
        # .mat asset and our npz are bit-identical, verified in test_operators)
        from functools import partial

        import scipy.io
        from measurement_utils.measurements import SuperResolutionOperator
        from measurement_utils.resizer import Resizer
        from torch.nn import functional as F
        sf = 2
        t_sr = SuperResolutionOperator.__new__(SuperResolutionOperator)
        t_sr.device = "cpu"
        t_sr.up_sample = partial(F.interpolate, scale_factor=sf)
        t_sr.down_sample = Resizer((1, 3, RES, RES), 1 / sf).float()
        t_sr.scale_factor = sf
        kmat = scipy.io.loadmat(
            "measurement_utils/kernels/kernels_bicubicx234.mat")["kernels"]
        t_sr.kernel = torch.Tensor(kmat[0, sf - 2].astype(np.float64))
        t_sr.sigma_s = torch.tensor([0.05])
        t_sr.in_shape = (1, 3, RES, RES)
        t_sr.out_shape = (1, 3, RES // sf, RES // sf)
        j_sr = get_operator(name="super_resolution", scale_factor=sf,
                            sigma_s=0.05, in_shape=(1, 3, RES, RES))
        y_sr_ref = t_sr.forward(torch.from_numpy(x_clean), noiseless=True).numpy()
        y_sr = np.asarray(j_sr.forward(jnp.asarray(x_clean), noiseless=True))
        np.testing.assert_allclose(y_sr, y_sr_ref, atol=1e-5)

        # --- matched motion_blur operators. The kernel is ASYMMETRIC (a real
        # motion PSF from our synthesiser) — unlike the symmetric gaussian it
        # catches FB-vs-conj(FB) / kernel-flip bugs in the FFT conv and the
        # deblur solvers, which cancel exactly for symmetric kernels.
        from measurement_utils.measurements import \
            MotionBlurOperator as TorchMotionBlur

        from free_hunch_tpu.operators.motionblur import MotionKernel
        km = MotionKernel(size=(9, 9), intensity=0.5, rng=7).kernelMatrix
        km = km.astype(np.float32)
        assert np.abs(km - km[::-1, ::-1]).max() > 1e-4  # genuinely asymmetric
        t_mb = TorchMotionBlur.__new__(TorchMotionBlur)
        t_mb.device = "cpu"
        t_mb.kernel_size = km.shape[0]
        t_mb.kernel = km
        t_mb.sigma_s = torch.tensor([0.05])
        t_mb.in_shape = (1, 3, RES, RES)
        j_mb = get_operator(name="motion_blur", sigma_s=0.05, kernel=km,
                            in_shape=(1, 3, RES, RES))
        y_mb_ref = t_mb.forward(torch.from_numpy(x_clean), noiseless=True).numpy()
        y_mb = np.asarray(j_mb.forward(jnp.asarray(x_clean), noiseless=True))
        np.testing.assert_allclose(y_mb, y_mb_ref, atol=1e-5)

        yield dict(ref_mech=ref_mech, my_mech=my_mech, tpre=tpre, jpre=jpre,
                   params=params,
                   ops={"inpainting": (t_inp, j_inp, y_inp),
                        "gaussian_blur": (t_blur, j_blur, y_blur),
                        "super_resolution": (t_sr, j_sr, y_sr_ref),
                        "motion_blur": (t_mb, j_mb, y_mb_ref)})
    finally:
        os.chdir(cwd)


# name -> (ref extra ctor kwargs, our extra ctor kwargs, sigmas, rel gate)
MECHS = {
    "dps": (dict(), dict(), [2.0, 0.5, 0.15], 1e-4),
    "pigdm": (dict(pigdm_posthoc_scaling=True),
              dict(pigdm_posthoc_scaling=True), [2.0, 0.5, 0.15], 1e-4),
    "pigdm_videodiff_schedule": (dict(pigdm_posthoc_scaling=False),
                                 dict(), [2.0, 0.5, 0.15], 1e-4),
    # 0.15 < mle_sigma_thres exercises the per-pixel-variance CG branch
    "peng_convert": (dict(), dict(), [2.0, 0.5, 0.15], 2e-3),
    "peng_analytic": (dict(), dict(dataset="imagenet"), [2.0, 0.5, 0.15], 1e-4),
    # rtol_func_2 only reaches 1e-4 at sigma <= 0.1 (see module docstring)
    "tmpd": (dict(), dict(), [0.1, 0.09], 2e-3),
    "diffpir": (dict(diffpir_lambda=10), dict(diffpir_lambda=10.0),
                [2.0, 0.5, 0.15], 1e-4),
}


@pytest.mark.parametrize("op_name", ["inpainting", "gaussian_blur",
                                     "super_resolution", "motion_blur"])
@pytest.mark.parametrize("mech_name", sorted(MECHS))
def test_stateless_mechanism_matches_reference(rig, mech_name, op_name):
    ref_extra, my_extra, sigmas, gate = MECHS[mech_name]
    t_op, j_op, y = rig["ops"][op_name]
    tpre, jpre, params = rig["tpre"], rig["jpre"], rig["params"]

    RefCls = rig["ref_mech"].choose_conditioning_mechanism(mech_name)
    ref = RefCls(0.7, t_op, False, init_denoiser_variance=1,
                 init_noise_variance=torch.tensor(4.0), data_dim=D,
                 max_rtol=1.0, **ref_extra)
    MyCls = rig["my_mech"].choose_conditioning_mechanism(mech_name)
    mine = MyCls(cond_scaling=0.7, forward_operator=j_op, clip_x0_mean=False,
                 **my_extra)
    state = mine.init_state(1, (3, RES, RES))
    denoise = lambda x, s: jpre.apply(params, x, s)

    rng = np.random.default_rng(3)
    yt = torch.from_numpy(y)
    yj = jnp.asarray(y)
    for i, sig in enumerate(sigmas):
        x = (rng.normal(size=(1, 3, RES, RES)) * max(sig, 0.5)).astype(np.float32)
        xt = torch.from_numpy(x).requires_grad_()
        with torch.enable_grad():
            out_t = ref.x0_mean_update(xt, tpre, yt, torch.tensor(sig))
        want = out_t.detach().numpy()
        out_j, state = mine.x0_mean_update(denoise, jnp.asarray(x), yj, sig, state)
        got = np.asarray(out_j)
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < gate, (f"{mech_name}/{op_name} call {i} (sigma={sig}): "
                            f"rel err {err:.3e} >= {gate:.0e}")
