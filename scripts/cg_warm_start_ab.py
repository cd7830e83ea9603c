#!/usr/bin/env python
"""Quality + throughput A/B for cg_warm_start at the paper's operating point.

Free-running 256px Free Hunch runs (dct prior, 30 Heun steps, gaussian blur,
flagship 552M UNet topology) on one TPU chip, same noise/measurement across
configs:

  b      the reference torch-CG start x0 = rhs (cg.py:143 semantics)
  prev   recycle the previous guidance stage's CG solution as the start
         (consecutive ODE stages solve nearby systems — identical wherever
         CG converges, fewer iterations to get there)

Reports per-config PSNR/SSIM vs the conditioning images, pairwise output
differences, total CG iterations, and wall clock. This is the adoption gate
for making 'prev' the default: the deviation class is the same as the
(default-on, documented) spectral preconditioner — loose-rtol iterates may
differ, converged solutions cannot.

Output: docs/bench/cg_warm_start_ab.json
Env: WA_BATCH (8), WA_STEPS (30).
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
    from free_hunch_tpu.metrics.quality import psnr, ssim
    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan
    from free_hunch_tpu.samplers.edm import required_cov_capacity

    batch = int(os.environ.get("WA_BATCH", 8))
    num_steps = int(os.environ.get("WA_STEPS", 30))
    res = 256

    log(f"devices: {jax.devices()}")
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True)
    precond = wrap_precond(model, model_args, "linear")

    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
        net_sigma_max=precond.sigma_max, num_steps=num_steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")

    base = dict(cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
                image_base_covariance="dct_diagonal",
                init_denoiser_variance=1.0, init_noise_variance=80.0**2,
                data_dim=3 * res * res,
                cov_capacity=required_cov_capacity(xs),
                solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000)
    configs = {"b": dict(base, cg_warm_start="b"),
               "prev": dict(base, cg_warm_start="prev")}

    key = jax.random.PRNGKey(0)
    cond = jax.random.uniform(jax.random.fold_in(key, 0), (batch, 3, res, res),
                              minval=-1, maxval=1)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        cond, jax.random.fold_in(key, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (batch, 3, res, res))

    results, outputs = {}, {}
    for name, cfg in configs.items():
        mech = choose_conditioning_mechanism("online_covariance")(**cfg)

        @jax.jit
        def run(params_, noise_, y_, key_):
            denoise = lambda x, s: precond.apply(params_, x, s)
            x, _, diag = sample_scan(denoise, mech, noise_, y_, xs, key_,
                                     sigma0_scaled=sigma0_scaled,
                                     collect_diagnostics=True)
            return x, diag

        t0 = time.time()
        x, diag = run(params, noise, y, jax.random.fold_in(key, 3))
        x = np.asarray(jax.block_until_ready(x))
        t_compile = time.time() - t0
        t0 = time.time()
        x2, diag = run(params, noise, y, jax.random.fold_in(key, 3))
        x2 = np.asarray(jax.block_until_ready(x2))
        t_run = time.time() - t0
        niter = np.asarray(diag["cg_niter"])

        x_img = np.clip(x, -1, 1)
        c_img = np.asarray(cond)
        ps = float(np.mean([psnr(c_img[i], x_img[i], data_range=2.0)
                            for i in range(batch)]))
        ss = float(np.mean([ssim(c_img[i], x_img[i], data_range=2.0,
                                 channel_axis=0) for i in range(batch)]))
        profile = [dict(step=i, sigma=round(float(xs["sigma_hat"][i]), 4),
                        niter=[int(niter[i, 0]), int(niter[i, 1])])
                   for i in range(niter.shape[0])]
        total_iters = int(niter[niter > 0].sum())
        results[name] = dict(
            psnr_vs_cond=round(ps, 4), ssim_vs_cond=round(ss, 4),
            wall_s_per_run=round(t_run, 2), compile_s=round(t_compile, 1),
            total_cg_iters=total_iters,
            samples_per_min=round(batch * 60.0 / t_run, 2),
            cg_profile=profile)
        outputs[name] = x
        log(f"{name}: psnr={ps:.3f} ssim={ss:.4f} {t_run:.1f}s/run "
            f"total_cg={total_iters}")

    d = np.abs(outputs["b"] - outputs["prev"])
    pair = dict(max_abs_diff=round(float(d.max()), 5),
                mean_abs_diff=round(float(d.mean()), 6),
                psnr_delta=round(results["prev"]["psnr_vs_cond"]
                                 - results["b"]["psnr_vs_cond"], 4),
                ssim_delta=round(results["prev"]["ssim_vs_cond"]
                                 - results["b"]["ssim_vs_cond"], 5))

    out = dict(
        protocol=dict(res=res, batch=batch, steps=num_steps,
                      operator="gaussian_blur 61x61 std3.0 sigma_s=0.1",
                      prior="dct_diagonal (shipped ImageNet spectrum)",
                      model="flagship 552M ADM UNet (random init — real "
                            "checkpoints unobtainable, zero egress)"),
        configs={k: {kk: vv for kk, vv in v.items() if kk != "cg_profile"}
                 for k, v in results.items()},
        b_vs_prev=pair,
        cg_profiles={k: v["cg_profile"] for k, v in results.items()},
    )
    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/cg_warm_start_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(configs=out["configs"], b_vs_prev=pair), indent=1))


if __name__ == "__main__":
    main()
