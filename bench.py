#!/usr/bin/env python
"""Headline benchmark: guided 256x256 sampling throughput on one TPU chip.

Protocol (BASELINE.md north star): Free Hunch full pipeline — 256x256 ADM
UNet denoiser (552M params, bf16 torso), DCT-basis online covariance with
time+BFGS space updates, tailored CG guidance solve, 30 Heun steps,
gaussian-blur operator. Metric: guided samples per minute per chip;
vs_baseline is measured against the 64 samples/min/chip target (the reference
publishes no numbers — BASELINE.md).

Prints ONE JSON line on stdout; progress goes to stderr.
Env knobs: BENCH_BATCH (default 8), BENCH_STEPS (default 30), BENCH_ITERS.
"""
import functools
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compilation cache: later runs skip the big compile
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from free_hunch_tpu.guidance import choose_conditioning_mechanism
    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan

    batch = int(os.environ.get("BENCH_BATCH", 8))
    num_steps = int(os.environ.get("BENCH_STEPS", 30))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    res = int(os.environ.get("BENCH_RES", 256))

    log(f"devices: {jax.devices()}")
    log(f"batch={batch} steps={num_steps} res={res}")

    # hybrid guidance REQUIRES the remat'd UNet: without jax.checkpoint the
    # pullback's residuals (every forward activation) must cross the lax.cond
    # boundary — measured 44G of HBM at batch 8 (vs 15.75G capacity). With
    # remat only block boundaries cross; the recompute runs inside the taken
    # branch only.
    remat = (os.environ.get("BENCH_REMAT", "0") == "1"
             or os.environ.get("BENCH_GRAD") == "hybrid")
    if remat and os.environ.get("BENCH_REMAT", "0") != "1":
        log("BENCH_GRAD=hybrid forces remat=True (cond-boundary residuals)")
    # BENCH_QUANT (default int8): torso convs + attention projections on the
    # v5e int8 MXU (2x the bf16 peak), int8 pullback included — ops/quant.py.
    # The algorithm is unchanged (the headline stays the exact vjp-gradient
    # pipeline); reduced-precision torso arithmetic mirrors the reference's
    # own default posture (its released setup ships use_fp16=True). Error
    # budget at 256px (docs/bench/int8_quality_ab.json; gates in
    # tests/test_quant.py): per-call x0_mean rel err median 0.4% / max 1.1%,
    # x0_var 3%/9%, pullback 10%/51% (largest where the gradient is
    # near-zero) — and the full guided run's PSNR differs from bf16 by
    # 0.004 dB. BENCH_QUANT=none restores the bf16 torso (25.7 samples/min).
    quant = os.environ.get("BENCH_QUANT", "int8")
    quant = None if quant in ("", "none") else quant
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True,
        remat=remat, quant=quant)
    precond = wrap_precond(model, model_args, "linear")

    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
        net_sigma_max=precond.sigma_max, num_steps=num_steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")

    # BENCH_COV_K: "auto" (default) = exact schedule-derived capacity; every
    # CG iteration streams the full (d, K) factor from HBM, so anything
    # larger is pure bandwidth waste (4*steps was ~3.3x oversized)
    cov_k_env = os.environ.get("BENCH_COV_K", "auto")
    from free_hunch_tpu.samplers.edm import required_cov_capacity
    cov_k = (required_cov_capacity(xs) if cov_k_env == "auto"
             else int(cov_k_env))
    log(f"cov_capacity={cov_k}")
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        image_base_covariance="dct_diagonal",
        init_denoiser_variance=1.0, init_noise_variance=80.0**2,
        data_dim=3 * res * res, cov_capacity=cov_k,
        solver_type="customcuda", max_rtol=float(os.environ.get("BENCH_MAX_RTOL", 1.0)),
        cg_maxiter=int(os.environ.get("BENCH_CG_MAXITER", 5000)),
        cg_coords=os.environ.get("BENCH_CG_COORDS", "auto"),
        # cg_warm_start=prev (production default): recycle the previous
        # guidance stage's CG solution as the next solve's starting point
        # (consecutive stages solve nearby systems) — 568 -> 300 iterations,
        # quality A/B in docs/bench/cg_warm_start_ab.json. BENCH_CG_WARM=b
        # restores the reference torch-CG x0=rhs start.
        cg_warm_start=os.environ.get("BENCH_CG_WARM", "prev"),
        # BENCH_GRAD=covariance: Sigma_0 mat / sigma^2 instead of the UNet
        # vjp pullback (the reference's :283 alternative) — no pullback pass,
        # no vjp residual memory
        guidance_gradient=os.environ.get("BENCH_GRAD", "vjp"),
        guidance_vjp_below=float(os.environ.get("BENCH_VJP_BELOW", 2.0)))

    # BENCH_DONATE=1: donate the noise/y input buffers (the output x aliases
    # noise's allocation). Worth ~2x batch*3*res^2*4 bytes of HBM — enough to
    # fit configurations that miss capacity by a few MB (batch-16 remat
    # misses by 16.19M without it). Donated buffers die after the call, so
    # the timing loop must re-materialise them per iteration.
    donate = os.environ.get("BENCH_DONATE", "0") == "1"

    @functools.partial(jax.jit, donate_argnums=(1, 2) if donate else ())
    def run(params_, noise, y, key):
        denoise = lambda x, s: precond.apply(params_, x, s)
        x, _ = sample_scan(denoise, mech, noise, y, xs, key,
                           sigma0_scaled=sigma0_scaled)
        # scalar checksum: fetching it forces full completion even on remote
        # backends where block_until_ready is unreliable
        return x, jnp.sum(x)

    key = jax.random.PRNGKey(0)
    cond = jax.random.uniform(jax.random.fold_in(key, 0), (batch, 3, res, res),
                              minval=-1, maxval=1)
    # measurement under jit: eager complex-FFT dispatch is broken on the
    # remote axon TPU backend (and poisons the runtime afterwards)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        cond, jax.random.fold_in(key, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (batch, 3, res, res))

    def fresh_inputs():
        if not donate:
            return noise, y
        c = jax.jit(lambda k: jax.random.uniform(
            k, (batch, 3, res, res), minval=-1, maxval=1))(jax.random.fold_in(key, 0))
        y_ = jax.jit(lambda cc, k: op.forward(cc, noiseless=False, key=k))(
            c, jax.random.fold_in(key, 1))
        n_ = jax.jit(lambda k: jax.random.normal(
            k, (batch, 3, res, res)))(jax.random.fold_in(key, 2))
        return n_, y_

    log("compiling + warmup run...")
    t0 = time.time()
    _, chk = run(params, *fresh_inputs(), jax.random.fold_in(key, 3))
    log(f"checksum {float(chk):.4f}")
    log(f"compile+first run: {time.time() - t0:.1f}s")

    times = []
    for i in range(iters):
        n_, y_ = fresh_inputs()
        t0 = time.time()
        _, chk = run(params, n_, y_, jax.random.fold_in(key, 10 + i))
        chk = float(chk)
        times.append(time.time() - t0)
        log(f"iter {i}: {times[-1]:.2f}s (checksum {chk:.4f})")

    if os.environ.get("BENCH_CG_PROFILE") == "1":
        # per-sigma CG iteration profile (VERDICT r1 #4); separate jit so the
        # timed graph above is untouched
        import numpy as np

        @jax.jit
        def run_diag(params_, noise_, y_, key_):
            denoise = lambda x, s: precond.apply(params_, x, s)
            x, _, diag = sample_scan(denoise, mech, noise_, y_, xs, key_,
                                     sigma0_scaled=sigma0_scaled,
                                     collect_diagnostics=True)
            return jnp.sum(x), diag

        chk, diag = run_diag(params, noise, y, jax.random.fold_in(key, 99))
        float(chk)
        niter = np.asarray(diag["cg_niter"])
        prof = [dict(step=i, sigma_hat=float(xs["sigma_hat"][i]),
                     niter=[int(niter[i, 0]), int(niter[i, 1])])
                for i in range(niter.shape[0])]
        for p in prof:
            log(f"cg profile step {p['step']:2d} sigma={p['sigma_hat']:8.4f} "
                f"niter={p['niter']}")
        os.makedirs("docs/bench", exist_ok=True)
        with open("docs/bench/cg_profile.json", "w") as f:
            json.dump(prof, f, indent=2)

    best = min(times)
    samples_per_min = batch * 60.0 / best
    target = 64.0
    arith = quant or "bf16"
    print(json.dumps({
        "metric": "freehunch_guided_samples_per_min_per_chip",
        "value": round(samples_per_min, 3),
        "unit": (f"samples/min ({res}x{res}, {num_steps} Heun steps, "
                 f"online_covariance+CG"
                 f", {os.environ.get('BENCH_GRAD', 'vjp')} gradient, "
                 f"{arith} torso)"),
        "vs_baseline": round(samples_per_min / target, 4),
    }))


if __name__ == "__main__":
    main()
