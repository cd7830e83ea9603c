#!/usr/bin/env python
"""Step-count efficiency study (VERDICT r3 item 5): samples/min vs quality
at 10/15/20/30(/40) Heun steps for both guidance gradient modes.

The paper's pitch — a better covariance estimate buys better guidance per
step — predicts Free Hunch degrades gracefully as the step budget shrinks.
Two measurement tiers:

* exact tier (default, CPU): the linear-Gaussian image oracle
  (analysis/linear_gaussian.py — closed-form posterior, production pipeline,
  d=3072) gives bias-vs-steps curves with NO sampling-metric ambiguity:
  posterior-mean rel-L2 and covariance trace ratio per (steps, mode).
* image tier (SC_IMAGES=1, TPU): full 256px pipeline, batch 8, the bundled
  ImageNet subset as conditioning (data/imagenet/00000, reference
  README.md:42), random weights (checkpoints unobtainable here) — RELATIVE
  PSNR/SSIM across step counts plus measured samples/min per config.
  sigma-grid anchor: reference generate_conditional.py:172-201.

Output: docs/bench/steps_curve.json. Env: SC_STEPS (csv, default
"10,15,20,30,40" exact / "10,20,30" image), SC_MODES, SC_IMAGES.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def exact_tier(steps_list, modes):
    import numpy as np

    from free_hunch_tpu.analysis.linear_gaussian import (
        dense_operator_matrix, exact_posterior, idct_basis_matrix,
        make_smooth_spectrum, sample_linear_gaussian_posterior)

    shape = (3, 32, 32)
    operator = dict(name="gaussian_blur", kernel_size=9, intensity=1.5)
    sigma_y = 0.1
    v = make_smooth_spectrum(shape, decades=4.0, v_max=30.0)

    rows = []
    A = B = mu = Sig = None
    for mode in modes:
        for steps in steps_list:
            t0 = time.time()
            with tempfile.TemporaryDirectory() as td:
                samples, y, op, _ = sample_linear_gaussian_posterior(
                    v, img_shape=shape, operator_kwargs=operator,
                    sigma_y=sigma_y, data_dir=td, n=256, num_steps=steps,
                    mechanism_kwargs=dict(guidance_gradient=mode))
            if A is None:
                A = dense_operator_matrix(op, shape)
                B = idct_basis_matrix(shape)
            mu, Sig = exact_posterior(A, B, v, y, sigma_y)
            m = samples.mean(0)
            centered = (B.T @ (samples - m).T).T
            var_got = centered.var(0)
            var_exact = np.diag(B.T @ Sig @ B)
            row = dict(
                tier="exact", mode=mode, steps=steps,
                denoiser_evals=2 * steps - 1,
                mean_rel_l2=float(np.linalg.norm(m - mu)
                                  / np.linalg.norm(mu)),
                trace_ratio=float(var_got.sum()
                                  / max(var_exact.sum(), 1e-12)),
                wall_s=round(time.time() - t0, 1))
            rows.append(row)
            log(f"[exact] {row}")
    return rows


def image_tier(steps_list, modes):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import PIL.Image

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

    res, batch = 256, 8
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True, remat=False)
    precond = wrap_precond(model, model_args, "linear")
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)

    # conditioning = the bundled reference smoke subset (first `batch`)
    img_dir = "data/imagenet/00000"
    files = sorted(os.listdir(img_dir))[:batch]
    imgs = np.stack([np.asarray(PIL.Image.open(os.path.join(img_dir, f))
                                .convert("RGB"), np.float32)
                     for f in files])
    cond = jnp.asarray(imgs.transpose(0, 3, 1, 2) / 127.5 - 1.0)
    key = jax.random.PRNGKey(0)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        cond, jax.random.fold_in(key, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 2),
                              (batch, 3, res, res))

    rows = []
    for mode in modes:
        for steps in steps_list:
            xs, sigma0_scaled = prepare_schedule(
                round_sigma=precond.round_sigma,
                net_sigma_min=precond.sigma_min,
                net_sigma_max=precond.sigma_max, num_steps=steps,
                solver="heun", discretization="edm", schedule="linear",
                scaling="none")
            mech = choose_conditioning_mechanism("online_covariance")(
                cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
                image_base_covariance="dct_diagonal",
                init_denoiser_variance=1.0, init_noise_variance=80.0**2,
                data_dim=3 * res * res,
                cov_capacity=required_cov_capacity(xs),
                solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000,
                cg_warm_start="prev", guidance_gradient=mode)

            @functools.partial(jax.jit)
            def run(params_, noise_, y_, k, _m=mech, _xs=xs,
                    _s0=sigma0_scaled):
                x, _ = sample_scan(
                    lambda xx, ss: precond.apply(params_, xx, ss), _m,
                    noise_, y_, _xs, k, sigma0_scaled=_s0)
                return x, jnp.sum(x)

            t0 = time.time()
            out, chk = run(params, noise, y, jax.random.fold_in(key, 3))
            float(chk)
            compile_s = time.time() - t0
            times = []
            for i in range(2):
                t0 = time.time()
                out, chk = run(params, noise, y,
                               jax.random.fold_in(key, 10 + i))
                float(chk)
                times.append(time.time() - t0)
            best = min(times)
            o = np.clip(np.asarray(out), -1, 1)
            c = np.clip(np.asarray(cond), -1, 1)
            ps = float(np.mean([psnr(o[i], c[i], data_range=2.0)
                                for i in range(batch)]))
            ss_v = float(np.mean([ssim(o[i], c[i], data_range=2.0,
                                       channel_axis=0)
                                  for i in range(batch)]))
            row = dict(tier="image", mode=mode, steps=steps,
                       denoiser_evals=2 * steps - 1,
                       samples_per_min=round(batch * 60 / best, 2),
                       best_s=round(best, 2), compile_s=round(compile_s, 1),
                       psnr_vs_clean=round(ps, 3),
                       ssim_vs_clean=round(ss_v, 4),
                       note="random weights: RELATIVE comparison across "
                            "rows only")
            rows.append(row)
            log(f"[image] {row}")
    return rows


def main():
    modes = (os.environ.get("SC_MODES") or "vjp,covariance").split(",")
    out_path = os.environ.get("SC_OUT", "docs/bench/steps_curve.json")
    rows = []
    if os.environ.get("SC_IMAGES") == "1":
        steps = [int(s) for s in
                 (os.environ.get("SC_STEPS") or "10,20,30").split(",")]
        rows += image_tier(steps, modes)
    else:
        steps = [int(s) for s in
                 (os.environ.get("SC_STEPS") or "10,15,20,30,40").split(",")]
        rows += exact_tier(steps, modes)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    existing = []
    if os.path.exists(out_path) and os.environ.get("SC_APPEND") == "1":
        existing = json.load(open(out_path))
    with open(out_path, "w") as f:
        json.dump(existing + rows, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
