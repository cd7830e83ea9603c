"""Operator registry, adjointness, masks, resizer-vs-reference, precond parity."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.append("/root/reference")  # append: repo-root modules must win name collisions

from free_hunch_tpu.operators import get_operator, get_noise  # noqa: E402
from free_hunch_tpu.operators import assets, masks  # noqa: E402
from free_hunch_tpu.operators.resize import build_resizer  # noqa: E402

SHAPE = (1, 3, 64, 64)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def _adjoint_check(op, in_shape, out_shape, seed=1, tol=1e-4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=in_shape), jnp.float32)
    y = jnp.asarray(rng.normal(size=out_shape), jnp.float32)
    lhs = float(jnp.sum(op.forward(x, noiseless=True) * y))
    rhs = float(jnp.sum(x * op.transpose(y)))
    assert abs(lhs - rhs) <= tol * max(abs(lhs), 1.0), (lhs, rhs)


def test_gaussian_blur_adjoint_and_kernel():
    k = np.ones((5, 5)) / 25.0
    op = get_operator(name="gaussian_blur", in_shape=SHAPE, sigma_s=0.1, kernel=k)
    _adjoint_check(op, SHAPE, SHAPE)
    # vjp oracle agrees with transpose (reference auto_transpose :49)
    y = _rand(SHAPE, 2)
    np.testing.assert_allclose(op.transpose(y), op.auto_transpose(y), rtol=1e-4, atol=1e-5)


def test_motion_blur_adjoint():
    from free_hunch_tpu.operators.motionblur import MotionKernel
    k = MotionKernel(size=(7, 7), intensity=0.5, rng=0).kernelMatrix
    assert abs(k.sum() - 1.0) < 1e-9
    op = get_operator(name="motion_blur", in_shape=SHAPE, sigma_s=0.1, kernel=k)
    _adjoint_check(op, SHAPE, SHAPE)


def test_inpainting_mask_and_adjoint():
    op = get_operator(name="inpainting", sigma_s=0.1,
                      mask_opt={"mask_type": "random", "image_size": 64,
                                "mask_prob_range": (0.3, 0.5)},
                      mask_key=jax.random.PRNGKey(0))
    m = np.asarray(op.mask)
    frac_masked = 1 - m.mean()
    assert 0.29 <= frac_masked <= 0.51
    # mask shared across channels
    assert np.all(m[0, 0] == m[0, 1])
    _adjoint_check(op, op.in_shape, op.in_shape)


def test_box_mask_geometry():
    m = np.asarray(masks.box_mask(jax.random.PRNGKey(1), 64, (16, 32)))
    hole = 1 - m[0, 0]
    rows = hole.any(axis=1).nonzero()[0]
    cols = hole.any(axis=0).nonzero()[0]
    assert 16 <= len(rows) <= 32 and 16 <= len(cols) <= 32
    assert hole.sum() == len(rows) * len(cols)  # solid rectangle


def test_colorization_adjoint():
    op = get_operator(name="colorization", sigma_s=0.1, in_shape=SHAPE)
    _adjoint_check(op, SHAPE, (1, 1, 64, 64))


def test_super_resolution_adjoint_and_shapes():
    op = get_operator(name="super_resolution", in_shape=SHAPE, scale_factor=4, sigma_s=0.05)
    y = op.forward(_rand(SHAPE), noiseless=True)
    assert y.shape == (1, 3, 16, 16)
    _adjoint_check(op, SHAPE, (1, 3, 16, 16))


def test_resizer_matches_reference_resizer():
    torch = pytest.importorskip("torch")
    from measurement_utils.resizer import Resizer

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ref = Resizer((1, 3, 32, 32), 1 / 4).float()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(build_resizer((32, 32), 1 / 4)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_noise_registry():
    key = jax.random.PRNGKey(0)
    x = _rand(SHAPE)
    assert np.allclose(get_noise(name="clean")(x), x)
    y = get_noise(name="gaussian", sigma=0.1)(x, key)
    assert 0.05 < float(jnp.std(y - x)) < 0.2
    z = get_noise(name="poisson", rate=1.0)(jnp.clip(x, -1, 1), key)
    assert z.shape == x.shape and float(jnp.abs(z).max()) <= 1.0


def test_phase_retrieval_amplitude():
    op = get_operator(name="phase_retrieval", oversample=2.0, in_shape=SHAPE)
    y = op.forward(_rand(SHAPE), noiseless=True)
    assert y.shape[-1] == 64 + 2 * op.pad
    assert float(y.min()) >= 0.0


def test_asset_kernels_load():
    g = assets.gaussian_blur_kernel()
    m = assets.motion_blur_kernel()
    assert g.shape == (61, 61) and abs(g.sum() - 1) < 1e-6
    assert m.shape == (61, 61) and abs(m.sum() - 1) < 1e-6
    for sf in (2, 3, 4):
        assert assets.bicubic_sr_kernel(sf).shape == (25, 25)
    dv = assets.dct_variance()
    assert dv.shape == (3, 256, 256) and (dv > 0).all()
    rm = assets.recon_mse()
    assert rm["sigmas"].shape == (1001,)


def test_precond_parity_vs_reference():
    """iDDPMLinearPrecond parity: same small UNet, same sigma, same outputs."""
    torch = pytest.importorskip("torch")
    from training.openai_unet import UNetModel as TorchUNet
    from training.openai_preconditioning import iDDPMLinearPrecond as TorchPrecond

    from free_hunch_tpu.models.convert import convert_state_dict
    from free_hunch_tpu.models.precond import IDDPMLinearPrecond
    from free_hunch_tpu.models.unet import UNetConfig, UNetModel

    kwargs = dict(image_size=32, in_channels=3, model_channels=32, out_channels=6,
                  num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
                  num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
                  resblock_updown=True)
    tnet = TorchUNet(**kwargs)
    tnet.eval()
    tpre = TorchPrecond(tnet, img_resolution=32, img_channels=3, label_dim=0)

    cfg = UNetConfig(image_size=32, in_channels=3, model_channels=32, out_channels=6,
                     num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
                     resblock_updown=True, dtype=jnp.float32, remat=False)
    jnet = UNetModel(cfg)
    params = convert_state_dict(tnet.state_dict(), cfg)
    jpre = IDDPMLinearPrecond(jnet, img_resolution=32, img_channels=3)

    np.testing.assert_allclose(np.asarray(jpre.u), tpre.u.numpy(), rtol=2e-4)
    assert abs(jpre.sigma_min - tpre.sigma_min) < 1e-5
    assert abs(jpre.sigma_max - tpre.sigma_max) < 1e-4

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    for sigma in (0.05, 1.0, 20.0):
        with torch.no_grad():
            t_dx, t_var = tpre(torch.from_numpy(x), torch.tensor(sigma))
        j_dx, j_var = jpre.apply(params, jnp.asarray(x), sigma)
        np.testing.assert_allclose(np.asarray(j_dx), t_dx.numpy(), rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(j_var), t_var.numpy(), rtol=1e-3, atol=2e-4)

    # round_sigma snaps to the grid identically
    s = np.asarray([0.013, 0.7, 55.0], np.float32)
    np.testing.assert_allclose(np.asarray(jpre.round_sigma(jnp.asarray(s))),
                               tpre.round_sigma(torch.from_numpy(s)).numpy(), rtol=2e-4)


def test_blurkernel_synthesis():
    from free_hunch_tpu.operators.blurkernel import gaussian_kernel, make_kernel
    g = gaussian_kernel(61, 3.0)
    ref_g = assets.gaussian_blur_kernel()
    # the bundled asset IS a 61x61 std-3 gaussian: synthesis must match it
    np.testing.assert_allclose(g, ref_g, atol=5e-6)
    m = make_kernel("motion", 21, 0.5, rng=0)
    assert m.shape == (21, 21) and abs(m.sum() - 1) < 1e-9


def test_centered_fft_roundtrip():
    from free_hunch_tpu.ops.fftops import fft2c, ifft2c
    x = _rand((1, 3, 16, 16), 9).astype(jnp.complex64)
    np.testing.assert_allclose(np.asarray(ifft2c(fft2c(x)).real),
                               np.asarray(x.real), atol=1e-5)
    # Parseval
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(fft2c(x))**2)),
                               float(jnp.sum(jnp.abs(x)**2)), rtol=1e-5)


def test_operators_cross_jit_boundary_as_arguments():
    """Operators must flow through jit as ARGUMENTS (per-image masks/kernels
    without retracing) with float-only pytree leaves: complex leaves embed
    fine as trace-time constants but cannot be device_put as jit arguments on
    remote TPU backends, so OTFs are stored as stacked (real, imag) f32."""
    x = _rand(SHAPE, 3)
    fwd = jax.jit(lambda o, v: o.forward(v, noiseless=True))
    for name, kw in [("noise", {}), ("colorization", {}),
                     ("gaussian_blur", {}), ("motion_blur", {}),
                     ("super_resolution", dict(scale_factor=4)),
                     ("inpainting", dict(mask_key=jax.random.PRNGKey(0),
                                         mask_opt={"mask_type": "random",
                                                   "image_size": 64,
                                                   "mask_prob_range": (0.2, 0.4)}))]:
        op = get_operator(name=name, in_shape=SHAPE, sigma_s=0.1, **kw)
        for leaf in jax.tree.leaves(op):
            assert not np.iscomplexobj(leaf), (name, getattr(leaf, "dtype", leaf))
        np.testing.assert_allclose(np.asarray(fwd(op, x)),
                                   np.asarray(op.forward(x, noiseless=True)),
                                   rtol=1e-5, atol=1e-5)
    # pytree round-trip preserves behaviour (flatten/unflatten identity)
    op = get_operator(name="gaussian_blur", in_shape=SHAPE, sigma_s=0.1)
    leaves, treedef = jax.tree.flatten(op)
    op2 = jax.tree.unflatten(treedef, leaves)
    np.testing.assert_allclose(np.asarray(op2.forward(x, noiseless=True)),
                               np.asarray(op.forward(x, noiseless=True)))
