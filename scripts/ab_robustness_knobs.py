#!/usr/bin/env python
"""A/B the Free Hunch robustness knobs (transport_mean_bound /
guidance_update_bound) against exact reference behaviour (bounds = None).

Both knobs are elementwise clips that are inactive while values stay in
range, so on a well-behaved chain the guided samples must agree; on a chain
whose covariance solve diverges, the bounded run stays finite. The committed
JSON (docs/ab_robustness_knobs.json) backs the docs/design.md §6 table.

Run: python scripts/ab_robustness_knobs.py  (CPU, ~2 min)
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_hunch_tpu.guidance import choose_conditioning_mechanism
from free_hunch_tpu.metrics.quality import psnr
from free_hunch_tpu.models.precond import IDDPMLinearPrecond
from free_hunch_tpu.models.unet import UNetConfig, UNetModel
from free_hunch_tpu.operators import get_operator
from free_hunch_tpu.samplers import conditional_sampler

RES, BATCH, STEPS = 32, 4, 6


def run(transport_mean_bound, guidance_update_bound):
    cfg = UNetConfig(image_size=RES, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(4,), channel_mult=(1, 2),
                     num_heads=2, num_head_channels=16, dtype=jnp.float32)
    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES)),
                        jnp.zeros((1,)))
    pre = IDDPMLinearPrecond(model, img_resolution=RES, img_channels=3)
    denoise = lambda x, s: pre.apply(params, x, s)

    k = np.exp(-0.5 * (np.mgrid[-3:4, -3:4][0] ** 2
                       + np.mgrid[-3:4, -3:4][1] ** 2) / 1.5**2)
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, RES, RES),
                      sigma_s=0.05, kernel=k / k.sum())
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=True,
        image_base_covariance="dct_diagonal_noinfo",
        init_denoiser_variance=1.0, init_noise_variance=80.0**2,
        data_dim=3 * RES * RES, cov_capacity=32, cg_maxiter=50,
        space_step_update_lower_threshold=0.01,
        space_step_update_threshold=100.0,
        transport_mean_bound=transport_mean_bound,
        guidance_update_bound=guidance_update_bound)

    cond = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (BATCH, 3, RES, RES)), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 3, RES, RES))
    x, _, _ = conditional_sampler(
        denoise, noise, cond, op, mech, rng_key=jax.random.PRNGKey(3),
        round_sigma=pre.round_sigma, net_sigma_min=pre.sigma_min,
        net_sigma_max=pre.sigma_max, num_steps=STEPS, solver="heun",
        discretization="edm", schedule="linear", scaling="none")
    return np.asarray(x), np.asarray(cond)


def main():
    x_ref, cond = run(None, None)          # reference behaviour
    x_bnd, _ = run(1.0, 0.5)               # both bounds active

    u8 = lambda a: np.clip((a + 1) * 127.5, 0, 255)
    out = {
        "protocol": f"{RES}px random-init UNet, gaussian blur, {STEPS} Heun "
                    f"steps, dct_diagonal_noinfo, batch {BATCH}",
        "reference_behaviour": {
            "finite_fraction": float(np.isfinite(x_ref).mean()),
            "psnr_vs_cond": float(np.mean(np.asarray(psnr(u8(cond), u8(x_ref))))),
        },
        "bounded": {
            "transport_mean_bound": 1.0, "guidance_update_bound": 0.5,
            "finite_fraction": float(np.isfinite(x_bnd).mean()),
            "psnr_vs_cond": float(np.mean(np.asarray(psnr(u8(cond), u8(x_bnd))))),
        },
        "max_abs_diff": float(np.max(np.abs(x_ref - x_bnd))),
        "identical_when_in_range": bool(np.allclose(x_ref, x_bnd, atol=1e-5)),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ab_robustness_knobs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
