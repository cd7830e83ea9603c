"""DDNM+ sampler: schedule correctness + end-to-end run on a tiny UNet."""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.samplers.ddnm import (ddnm_conditional_sampler,
                                          ddnm_schedule, get_schedule_jump)

import pytest

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

RES = 32


def test_schedule_jump_plain():
    ts = get_schedule_jump(5, 1, 1)
    assert ts == [4, 3, 2, 1, 0, -1]


def test_schedule_jump_time_travel():
    ts = get_schedule_jump(6, travel_length=1, travel_repeat=2)
    # every step below T-1 is revisited once
    assert ts[0] == 5 and ts[-1] == -1
    assert all(abs(a - b) == 1 for a, b in zip(ts[:-1], ts[1:]))
    assert len(ts) > 7  # longer than the plain schedule


def test_ddnm_schedule_alphas():
    at, at_next, fwd = ddnm_schedule(4, M=1000)
    assert fwd.all() and len(at) == 4
    assert (at_next[:-1] > at[:-1]).all()  # alpha-bar grows as t decreases
    assert at_next[-1] == 1.0  # terminal step lands on alpha_bar[0] = 1


def test_ddnm_end_to_end_inpainting_and_sr():
    from free_hunch_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(image_size=RES, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                     channel_mult=(1, 2), num_heads=2, num_head_channels=16,
                     dtype=jnp.float32, remat=False)
    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES)),
                        jnp.zeros((1,)))

    def eps_fn(x, t):
        return model.apply(params, x, t)[:, :3]

    cond = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 3, RES, RES)),
                       jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 3, RES, RES))

    x, x_all, y = ddnm_conditional_sampler(
        eps_fn, noise, cond,
        {"name": "inpainting",
         "mask_opt": {"mask_type": "random", "image_size": RES,
                      "mask_prob_range": (0.2, 0.4)}},
        {"sigma": 0.05}, num_steps=4, rng_key=jax.random.PRNGKey(3),
        mask_key=jax.random.PRNGKey(4))
    assert x.shape == (2, 3, RES, RES) and np.isfinite(np.asarray(x)).all()
    assert y.shape == (2, 3, RES, RES)

    x2, _, y2 = ddnm_conditional_sampler(
        eps_fn, noise, cond,
        {"name": "super_resolution", "scale_factor": 2},
        {"sigma": 0.05}, num_steps=4, rng_key=jax.random.PRNGKey(5))
    assert x2.shape == (2, 3, RES, RES) and np.isfinite(np.asarray(x2)).all()
    assert y2.shape == (2, 3, RES // 2, RES // 2)


def test_ddnm_driver(tmp_path):
    """Full DDNM evaluation through the CLI path (heun doubling applied)."""
    import generate_conditional as gc
    setup = tmp_path / "setup32.txt"
    setup.write_text("--channel_mult 1,2 --attention_resolutions 8 "
                     "--class_cond False --diffusion_steps 1000 --dropout 0.0 "
                     "--image_size 32 --learn_sigma True --noise_schedule linear "
                     "--num_channels 32 --num_head_channels 16 --num_res_blocks 1 "
                     "--resblock_updown True --use_fp16 False "
                     "--use_scale_shift_norm True --use_new_attention_order False")
    argv = [f"--outdir={tmp_path/'out'}",
            f"--openai_setup_path={setup}",
            f"--openai_state_dict_path={tmp_path/'missing.pt'}",
            "--allow_random_init=true",
            "--dataset_path=/root/reference/data/imagenet/00000",
            "--total_images=1", "--batch_size=1", "--num_steps=2",
            "--conditioning_mechanism=ddnm", "--operator_name=super_resolution",
            "--scale_factor=2", "--mesh_shape=data:1", "--dtype=float32",
            "--seeds=0"]
    results = gc.cmdline(argv)
    assert np.isfinite(results["psnr"])
