"""Cross-framework parity of the Free Hunch mechanism itself.

Drives the REFERENCE BFGSOnlineUpdate (torch, imported from /root/reference
as an oracle, with stubs for its missing deps: torch_dct, pywt, hdf5storage,
and CUDA-on-CPU) and our FreeHunch mechanism through an identical sequence of
(x_t, sigma) guidance calls on the same tiny converted UNet and the same
inpainting measurement, then compares the updated denoiser means step by step.

This validates the whole chain — time update + analytic transport, BFGS space
update, tailored CG solve, vjp guidance — end to end against the paper's own
implementation.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_oracle import install_reference_stubs

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RES = 32
D = 3 * RES * RES


@pytest.fixture(scope="module")
def pair():
    cwd = os.getcwd()
    os.chdir("/root/reference")  # reference loads relative asset paths
    try:
        import conditioning_utils.online_update_bfgs as oub
        if not hasattr(oub, "CovarianceHessianBFGSDCTPCA"):
            # upstream imports this name but never defines it (SURVEY §7.4)
            oub.CovarianceHessianBFGSDCTPCA = oub.CovarianceHessianBFGSDCT
        from conditioning_utils import conditioning_mechanisms as ref_mech
        from training.openai_unet import UNetModel as TorchUNet
        from training.openai_preconditioning import iDDPMLinearPrecond as TorchPrecond

        from free_hunch_tpu.guidance.mechanisms import FreeHunch
        from free_hunch_tpu.models.convert import convert_state_dict
        from free_hunch_tpu.models.precond import IDDPMLinearPrecond
        from free_hunch_tpu.models.unet import UNetConfig, UNetModel
        from free_hunch_tpu.operators import get_operator

        kwargs = dict(image_size=RES, in_channels=3, model_channels=32,
                      out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                      channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                      use_scale_shift_norm=True, resblock_updown=True)
        tnet = TorchUNet(**kwargs)
        # randomise the zero_module layers: a fresh ADM UNet computes
        # F(x) == 0, degenerating the denoiser to clip(x) and the comparison
        # to a UNet-free one
        from free_hunch_tpu.models.convert import randomize_zero_tensors
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

        # shared random mask + measurement
        rng = np.random.default_rng(0)
        mask_hw = (rng.uniform(size=(RES, RES)) > 0.3).astype(np.float32)
        mask = np.broadcast_to(mask_hw, (1, 3, RES, RES)).copy()
        x_clean = rng.uniform(-1, 1, (1, 3, RES, RES)).astype(np.float32)
        y = (mask * x_clean).astype(np.float32)  # noiseless measurement

        # reference operator (mask injected directly, bypassing its RNG)
        from measurement_utils.measurements import InpaintingOperator
        t_op = InpaintingOperator.__new__(InpaintingOperator)
        t_op.device = "cpu"
        t_op.sigma_s = torch.tensor([0.05])
        t_op.in_shape = (1, 3, RES, RES)
        t_op.mask = torch.from_numpy(mask)

        j_op = get_operator(name="inpainting", sigma_s=0.05, mask=mask,
                            in_shape=(1, 3, RES, RES))

        common = dict(max_vector_count=100000, project_to_diagonal=False,
                      denoiser_mean_error_threshold=1e9,  # disable the fallback
                      use_analytical_score_time_update=True,
                      space_step_update_threshold=10.0,
                      space_step_update_lower_threshold=0.1,
                      do_space_updates=True, use_analytic_var_at_end=False,
                      # tight CG tolerance makes the linear-system solution
                      # unique, so the two CG implementations are comparable
                      max_rtol=1e-6, use_rtol_func=False)

        def make_ref(image_base_covariance, init_sigma):
            return ref_mech.BFGSOnlineUpdate(
                1.0, t_op, False,
                init_denoiser_variance=1, init_noise_variance=torch.tensor(init_sigma**2),
                data_dim=D, pigdm_posthoc_scaling=False,
                image_base_covariance=image_base_covariance,
                data_dir="data/imagenet/", pca_component_count=10,
                solver_type="customcuda", diffpir_lambda=10, **common)

        def make_mine(image_base_covariance, init_sigma):
            return FreeHunch(forward_operator=j_op, cond_scaling=1.0,
                             clip_x0_mean=False, init_denoiser_variance=1.0,
                             data_dim=D, image_base_covariance=image_base_covariance,
                             init_noise_variance=init_sigma**2, cov_capacity=32,
                             solver_type="customcuda", **common)

        yield dict(tpre=tpre, params=params, jpre=jpre, y=y,
                   make_ref=make_ref, make_mine=make_mine, mask=mask)
    finally:
        os.chdir(cwd)


def _drive_pair(pair, basis):
    tpre, jpre, params = pair["tpre"], pair["jpre"], pair["params"]
    y = pair["y"]
    ref = pair["make_ref"](basis, 2.0)
    mine = pair["make_mine"](basis, 2.0)
    state = mine.init_state(1, (3, RES, RES))
    denoise = lambda x, s: jpre.apply(params, x, s)

    rng = np.random.default_rng(1)
    x = (rng.normal(size=(1, 3, RES, RES)) * 2.0).astype(np.float32)
    yt = torch.from_numpy(y)

    # the Heun-like call pattern: same sigma with new x (space update),
    # then a new sigma (time update + space update)
    seq = [(x, 2.0),
           (x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 2.0),
           (x + 0.2 * rng.normal(size=x.shape).astype(np.float32), 1.2)]
    outs_ref, outs_mine = [], []
    for xi, sig in seq:
        xt = torch.from_numpy(xi).requires_grad_()
        with torch.enable_grad():
            out_t = ref.x0_mean_update(xt, tpre, yt, torch.tensor(sig))
        outs_ref.append(out_t.detach().numpy())
        out_j, state = mine.x0_mean_update(denoise, jnp.asarray(xi), jnp.asarray(y),
                                           sig, state)
        outs_mine.append(np.asarray(out_j))
    return outs_ref, outs_mine, ref, mine, state


@pytest.mark.parametrize("basis", ["identity", "dct_diagonal_noinfo"])
def test_freehunch_mechanism_matches_reference(pair, basis):
    outs_ref, outs_mine, ref, mine, state = _drive_pair(pair, basis)
    for i, (a, b) in enumerate(zip(outs_ref, outs_mine)):
        err = np.abs(a - b).max()
        denom = np.abs(a).max()
        assert err / denom < 2e-2, f"call {i}: max abs err {err:.2e} vs scale {denom:.2e}"

    # the covariance states agree as operators: compare Sigma_0 @ probe
    probe = np.random.default_rng(2).normal(size=(1, 3, RES, RES)).astype(np.float32)
    got = np.asarray(mine.cov_matvec_pixel(state.cov, jnp.asarray(probe)))
    want = ref.covariance_model.denoiser_cov_vector_dot(
        torch.from_numpy(probe)).numpy()
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-2
