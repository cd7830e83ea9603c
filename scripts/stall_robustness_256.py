#!/usr/bin/env python
"""Mid-sigma CG stall + robustness-knob ablation at the paper's operating
point (VERDICT r2 items 2 and 6).

Free-running 256px Free Hunch runs (dct prior, 30 Heun steps, gaussian blur,
flagship 552M UNet) on one TPU chip, same noise/measurement across configs:

  defaults    the framework defaults: stall detection 25, best-iterate CG,
              BFGS curvature guard, spectral preconditioner
  stall_off   defaults but stall detection off + maxiter budget burned
              (isolates what stall-truncation does to the OUTPUT)
  reference   reference semantics: stall off, last-iterate CG, no curvature
              guard, no preconditioner (the r2 robustness probe at 32px was
              not probative — this is the real operating point)

Reports per-config PSNR/SSIM vs the conditioning images, pairwise output
max-abs differences and PSNR deltas, and a per-sigma CG profile
(iterations + converged-row fraction) for each config.

Output: docs/bench/stall_robustness_256.json
Env: SR_BATCH (4), SR_STEPS (30), SR_MAXITER (300 — the budget when stall is
off; 5000 would run for hours at mid-sigma).
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

    batch = int(os.environ.get("SR_BATCH", 4))
    num_steps = int(os.environ.get("SR_STEPS", 30))
    maxiter_burn = int(os.environ.get("SR_MAXITER", 300))
    res = 256

    log(f"devices: {jax.devices()}")
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True)
    precond = wrap_precond(model, model_args, "linear")

    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)

    base = dict(cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
                image_base_covariance="dct_diagonal",
                init_denoiser_variance=1.0, init_noise_variance=80.0**2,
                data_dim=3 * res * res, cov_capacity=128,
                solver_type="customcuda", max_rtol=1.0)
    configs = {
        "defaults": dict(base, cg_maxiter=5000),  # stall detector caps iters
        "stall_off": dict(base, cg_maxiter=maxiter_burn, cg_stall_iters=10**6),
        "reference": dict(base, cg_maxiter=maxiter_burn, cg_stall_iters=10**6,
                          cg_track_best=False, bfgs_curvature_guard=False,
                          cg_precondition=False),
    }

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
        net_sigma_max=precond.sigma_max, num_steps=num_steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")

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
        optfrac = np.asarray(diag["cg_optfrac"])

        x_img = np.clip(x, -1, 1)
        c_img = np.asarray(cond)
        ps = float(np.mean([psnr(c_img[i], x_img[i], data_range=2.0)
                            for i in range(batch)]))
        ss = float(np.mean([ssim(c_img[i], x_img[i], data_range=2.0,
                                 channel_axis=0) for i in range(batch)]))
        profile = [dict(step=i, sigma=round(float(xs["sigma_hat"][i]), 4),
                        niter=[int(niter[i, 0]), int(niter[i, 1])],
                        converged_frac=[round(float(optfrac[i, 0]), 3),
                                        round(float(optfrac[i, 1]), 3)])
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

    pairs = {}
    names = list(configs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            d = np.abs(outputs[a] - outputs[b])
            pairs[f"{a}_vs_{b}"] = dict(
                max_abs_diff=round(float(d.max()), 5),
                mean_abs_diff=round(float(d.mean()), 6),
                psnr_delta=round(results[a]["psnr_vs_cond"]
                                 - results[b]["psnr_vs_cond"], 4),
                ssim_delta=round(results[a]["ssim_vs_cond"]
                                 - results[b]["ssim_vs_cond"], 5))

    out = dict(
        protocol=dict(res=res, batch=batch, steps=num_steps,
                      operator="gaussian_blur 61x61 std3.0 sigma_s=0.1",
                      prior="dct_diagonal (shipped ImageNet spectrum)",
                      model="flagship 552M ADM UNet (random init — real "
                            "checkpoints unobtainable, zero egress)",
                      maxiter_when_stall_off=maxiter_burn),
        configs={k: {kk: vv for kk, vv in v.items() if kk != "cg_profile"}
                 for k, v in results.items()},
        pairwise=pairs,
        cg_profiles={k: v["cg_profile"] for k, v in results.items()},
    )
    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/stall_robustness_256.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(configs=out["configs"], pairwise=pairs), indent=1))


if __name__ == "__main__":
    main()
