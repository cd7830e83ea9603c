#!/usr/bin/env python
"""guidance_gradient A/B at the paper's operating point: vjp (reference
default) vs covariance (Sigma_0 mat / sigma^2 — the reference's own
commented-out alternative, conditioning_mechanisms.py:283).

Free-running 256px Free Hunch runs (dct prior, 30 Heun steps, gaussian blur,
flagship 552M UNet) on one TPU chip, same noise/measurement across configs.
Reports per-config PSNR/SSIM vs the conditioning images, throughput, HBM
accounting (XLA memory_analysis — runtime memory_stats is unavailable through
the axon tunnel), and pairwise output deltas. The covariance mode drops the
entire vjp pullback (FLOPs and residual memory), so it is additionally
measured at batch 16, which the vjp path cannot fit without remat.

Output: docs/bench/guidance_gradient_ab.json
Env: GG_BATCH (8), GG_STEPS (30), GG_BIG_BATCH (16, 0 = skip).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_experiments import hbm_stats  # noqa: E402


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
    from free_hunch_tpu.samplers.edm import (prepare_schedule,
                                             required_cov_capacity,
                                             sample_scan)

    batch = int(os.environ.get("GG_BATCH", 8))
    big_batch = int(os.environ.get("GG_BIG_BATCH", 16))
    num_steps = int(os.environ.get("GG_STEPS", 30))
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
    cov_k = required_cov_capacity(xs)

    base = dict(cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
                image_base_covariance="dct_diagonal",
                init_denoiser_variance=1.0, init_noise_variance=80.0**2,
                data_dim=3 * res * res, cov_capacity=cov_k,
                solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000)
    configs = {
        "vjp": dict(base, guidance_gradient="vjp", batch=batch),
        "covariance": dict(base, guidance_gradient="covariance", batch=batch),
        # pullback only below sigma=2 (the GMM measurement puts the
        # covariance product at vjp-grade wherever the posterior is not
        # multimodal at scale sigma); the transpose pass sits in a lax.cond
        "hybrid": dict(base, guidance_gradient="hybrid",
                       guidance_vjp_below=2.0, batch=batch),
    }
    if big_batch:
        configs["covariance_b%d" % big_batch] = dict(
            base, guidance_gradient="covariance", batch=big_batch)

    key = jax.random.PRNGKey(0)

    def inputs(b):
        cond = jax.random.uniform(jax.random.fold_in(key, 0),
                                  (b, 3, res, res), minval=-1, maxval=1)
        y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
            cond, jax.random.fold_in(key, 1))
        noise = jax.random.normal(jax.random.fold_in(key, 2), (b, 3, res, res))
        return cond, y, noise

    results, outputs = {}, {}
    for name, cfg in configs.items():
        b = cfg.pop("batch")
        mech = choose_conditioning_mechanism("online_covariance")(**cfg)
        cond, y, noise = inputs(b)

        def run_fn(params_, noise_, y_, key_):
            denoise = lambda x, s: precond.apply(params_, x, s)
            x, _ = sample_scan(denoise, mech, noise_, y_, xs, key_,
                               sigma0_scaled=sigma0_scaled)
            return x, jnp.sum(x)

        try:
            lowered = jax.jit(run_fn).lower(params, noise, y,
                                            jax.random.fold_in(key, 3))
            compiled = lowered.compile()
        except Exception as e:
            results[name] = dict(batch=b, error=str(e)[:500])
            log(f"{name}: COMPILE FAILED {str(e)[:200]}")
            continue
        hbm = hbm_stats(compiled)

        t0 = time.time()
        x, chk = compiled(params, noise, y, jax.random.fold_in(key, 3))
        float(chk)
        t_first = time.time() - t0
        times = []
        for i in range(2):
            t0 = time.time()
            x, chk = compiled(params, noise, y, jax.random.fold_in(key, 3))
            float(chk)
            times.append(time.time() - t0)
        t_run = min(times)
        x = np.asarray(x)

        x_img = np.clip(x, -1, 1)
        c_img = np.asarray(cond)
        ps = float(np.mean([psnr(c_img[i], x_img[i], data_range=2.0)
                            for i in range(b)]))
        ss = float(np.mean([ssim(c_img[i], x_img[i], data_range=2.0,
                                 channel_axis=0) for i in range(b)]))
        results[name] = dict(
            batch=b, psnr_vs_cond=round(ps, 4), ssim_vs_cond=round(ss, 4),
            wall_s_per_run=round(t_run, 2), first_run_s=round(t_first, 1),
            samples_per_min=round(b * 60.0 / t_run, 2), hbm=hbm)
        outputs[name] = x[:batch]
        log(f"{name}: b={b} psnr={ps:.3f} ssim={ss:.4f} {t_run:.2f}s/run "
            f"-> {b * 60.0 / t_run:.1f} samples/min")

    pairs = {}
    names = [n for n in results if "error" not in results[n]]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, bname = names[i], names[j]
            n = min(len(outputs[a]), len(outputs[bname]))
            d = np.abs(outputs[a][:n] - outputs[bname][:n])
            pairs[f"{a}_vs_{bname}"] = dict(
                max_abs_diff=round(float(d.max()), 5),
                mean_abs_diff=round(float(d.mean()), 6),
                psnr_delta=round(results[a]["psnr_vs_cond"]
                                 - results[bname]["psnr_vs_cond"], 4),
                ssim_delta=round(results[a]["ssim_vs_cond"]
                                 - results[bname]["ssim_vs_cond"], 5))

    out = dict(
        protocol=dict(res=res, steps=num_steps, cov_capacity=cov_k,
                      operator="gaussian_blur 61x61 std3.0 sigma_s=0.1",
                      prior="dct_diagonal (shipped ImageNet spectrum)",
                      model="flagship 552M ADM UNet (random init — real "
                            "checkpoints unobtainable, zero egress)",
                      note="guidance quality of the covariance mode on REAL "
                           "weights is not measurable here; the analytic GMM "
                           "tests (tests/test_guidance_gradient.py) bound it "
                           "against exact posteriors"),
        configs=results, pairwise=pairs)
    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/guidance_gradient_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
