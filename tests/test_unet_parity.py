"""Checkpoint-conversion fidelity: flax UNet output == torch reference output.

Builds the reference torch UNet (imported from /root/reference as a test
oracle, never copied), randomly initialises it, converts its state dict with
``free_hunch_tpu.models.convert`` and compares forward passes in float32.
Covers: scale-shift ResBlocks, resblock up/down, attention (legacy + new
order), skip widths, learned-sigma output head.
"""
import sys

import numpy as np
import pytest

sys.path.append("/root/reference")  # append: repo-root modules must win name collisions

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from free_hunch_tpu.models.convert import convert_state_dict  # noqa: E402
from free_hunch_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _build_pair(use_new_attention_order=False, resblock_updown=True,
                use_scale_shift_norm=True, num_head_channels=16, num_classes=None):
    from training.openai_unet import UNetModel as TorchUNet

    kwargs = dict(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_heads=2, num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm, resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
        num_classes=num_classes,
    )
    tmodel = TorchUNet(**kwargs)
    # the ADM UNet zero-initialises every residual output conv, proj_out and
    # the final out conv — a fresh net computes F(x) == 0 identically, which
    # would make this parity comparison vacuous; randomise them
    from free_hunch_tpu.models.convert import randomize_zero_tensors
    tmodel.load_state_dict(randomize_zero_tensors(tmodel.state_dict()))
    tmodel.eval()
    cfg = UNetConfig(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_heads=2, num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm, resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order, num_classes=num_classes,
        dtype=jnp.float32, remat=False,
    )
    jmodel = UNetModel(cfg)
    params = convert_state_dict(tmodel.state_dict(), cfg)
    return tmodel, jmodel, params


def _compare(tmodel, jmodel, params, num_classes=None):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.asarray([3.0, 500.0], np.float32)
    y = None if num_classes is None else np.asarray([1, 4])
    with torch.no_grad():
        targs = (torch.from_numpy(x), torch.from_numpy(t))
        if y is None:
            tout = tmodel(*targs).numpy()
        else:
            # the torch oracle demands one-hot class_labels alongside y
            onehot = torch.nn.functional.one_hot(torch.from_numpy(y), num_classes).float()
            tout = tmodel(*targs, class_labels=onehot).numpy()
    jout = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                                   y=None if y is None else jnp.asarray(y)))
    # guard against the vacuous 0 == 0 comparison of a zero-initialised net
    assert np.abs(tout).max() > 1e-3, "torch oracle output is (near) zero"
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-5)


def test_parity_default_arch():
    tmodel, jmodel, params = _build_pair()
    _compare(tmodel, jmodel, params)


def test_parity_new_attention_order():
    tmodel, jmodel, params = _build_pair(use_new_attention_order=True)
    _compare(tmodel, jmodel, params)


def test_parity_conv_resample_path():
    tmodel, jmodel, params = _build_pair(resblock_updown=False)
    _compare(tmodel, jmodel, params)


def test_parity_additive_time_embedding():
    tmodel, jmodel, params = _build_pair(use_scale_shift_norm=False)
    _compare(tmodel, jmodel, params)


def test_parity_heads_from_num_heads():
    tmodel, jmodel, params = _build_pair(num_head_channels=-1)
    _compare(tmodel, jmodel, params)


def test_parity_class_conditional():
    tmodel, jmodel, params = _build_pair(num_classes=10)
    _compare(tmodel, jmodel, params, num_classes=10)
