#!/usr/bin/env python
"""Batched multi-operator throughput sweep (BASELINE.json config 5): the full
Free Hunch pipeline across all four paper inverse problems (gaussian blur,
motion blur, 4x super-resolution, random inpainting) on one TPU chip, in
both guidance gradient modes. Each operator exercises a different tailored
solver family (deblur FFT CG, SR polyphase CG, inpainting mask CG), so this
is the throughput-completeness check the single-operator bench cannot give.

Output: docs/bench/operator_sweep.json
Env: OS_BATCH (8), OS_STEPS (30), OS_MODES (vjp,covariance).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from free_hunch_tpu.guidance import choose_conditioning_mechanism
    from free_hunch_tpu.metrics.quality import psnr
    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import (prepare_schedule,
                                             required_cov_capacity,
                                             sample_scan)

    batch = int(os.environ.get("OS_BATCH", 8))
    num_steps = int(os.environ.get("OS_STEPS", 30))
    modes = os.environ.get("OS_MODES", "vjp,covariance").split(",")
    res = 256

    log(f"devices: {jax.devices()}")
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True)
    precond = wrap_precond(model, model_args, "linear")

    # the paper's four operators (README.md:88-95 / measurements.py kernels)
    operators = {
        "gaussian_blur": dict(name="gaussian_blur", kernel_size=61,
                              intensity=3.0),
        "motion_blur": dict(name="motion_blur", kernel_size=61, intensity=0.5),
        "super_resolution": dict(name="super_resolution", scale_factor=4),
        "inpainting": dict(name="inpainting",
                           mask_opt={"mask_type": "random", "image_size": res,
                                     "mask_prob_range": (0.6, 0.8)}),
    }

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
        net_sigma_max=precond.sigma_max, num_steps=num_steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")
    cov_k = required_cov_capacity(xs)

    key = jax.random.PRNGKey(0)
    cond = jax.random.uniform(jax.random.fold_in(key, 0), (batch, 3, res, res),
                              minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.fold_in(key, 2), (batch, 3, res, res))

    results = {}
    for op_name, okw in operators.items():
        op = get_operator(in_shape=(1, 3, res, res), sigma_s=0.1,
                          mask_key=jax.random.PRNGKey(1), **okw)
        y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
            cond, jax.random.fold_in(key, 1))
        for mode in modes:
            mech = choose_conditioning_mechanism("online_covariance")(
                cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
                image_base_covariance="dct_diagonal",
                init_denoiser_variance=1.0, init_noise_variance=80.0**2,
                data_dim=3 * res * res, cov_capacity=cov_k,
                solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000,
                guidance_gradient=mode)

            @jax.jit
            def run(params_, noise_, y_, key_):
                denoise = lambda x, s: precond.apply(params_, x, s)
                x, _ = sample_scan(denoise, mech, noise_, y_, xs, key_,
                                   sigma0_scaled=sigma0_scaled)
                return x, jnp.sum(x)

            tag = f"{op_name}/{mode}"
            try:
                t0 = time.time()
                x, chk = run(params, noise, y, jax.random.fold_in(key, 3))
                float(chk)
                t_first = time.time() - t0
                times = []
                for _ in range(2):
                    t0 = time.time()
                    x, chk = run(params, noise, y, jax.random.fold_in(key, 3))
                    float(chk)
                    times.append(time.time() - t0)
                t_run = min(times)
                x_img = np.clip(np.asarray(x), -1, 1)
                c_img = np.asarray(cond)
                ps = float(np.mean([psnr(c_img[i], x_img[i], data_range=2.0)
                                    for i in range(batch)]))
                finite = bool(np.isfinite(np.asarray(x)).all())
                results[tag] = dict(
                    samples_per_min=round(batch * 60.0 / t_run, 2),
                    wall_s_per_run=round(t_run, 2),
                    first_run_s=round(t_first, 1),
                    psnr_vs_cond=round(ps, 3), finite=finite)
                log(f"{tag}: {t_run:.2f}s/run -> "
                    f"{batch * 60.0 / t_run:.1f} samples/min (finite={finite})")
            except Exception as e:
                results[tag] = dict(error=str(e)[:400])
                log(f"{tag}: FAILED {str(e)[:200]}")

    out = dict(protocol=dict(res=res, batch=batch, steps=num_steps,
                             cov_capacity=cov_k, sigma_s=0.1,
                             prior="dct_diagonal",
                             model="552M ADM UNet (random init)"),
               results=results)
    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/operator_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
