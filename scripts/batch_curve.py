#!/usr/bin/env python
"""Samples/min vs batch size for the Free Hunch guided sampler (VERDICT r1
weak #4: batch scaling past 8 was broken/unmeasured).

Sweeps batch sizes with rematerialisation off and on, records per-iteration
wall clock (two timed iterations each — HBM-thrash configurations show up as
iter1 >> iter0) and live HBM stats. Writes docs/bench/batch_curve.json.

Env: BC_BATCHES ("2,4,8"), BC_BATCHES_REMAT ("8,12,16"), BC_STEPS (30).
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from free_hunch_tpu.guidance import choose_conditioning_mechanism
    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import prepare_schedule, sample_scan

    num_steps = int(os.environ.get("BC_STEPS", 30))
    batches_noremat = [int(b) for b in os.environ.get(
        "BC_BATCHES", "2,4,8,12").split(",") if b]
    batches_remat = [int(b) for b in os.environ.get(
        "BC_BATCHES_REMAT", "8,12,16").split(",") if b]
    res = 256

    results = {"config": dict(num_steps=num_steps, res=res), "points": []}

    def hbm_stats():
        try:
            d = jax.devices()[0]
            s = d.memory_stats()
            return {k: int(v) for k, v in s.items()
                    if k in ("bytes_in_use", "peak_bytes_in_use",
                             "bytes_limit")}
        except Exception:
            return {}

    for remat in (False, True):
        model, params, model_args = load_model(
            "models/256x256_diffusion_uncond.pt",
            "models/256x256_diffusion_uncond_setup.txt",
            dtype=jnp.bfloat16, init_random_if_missing=True, remat=remat)
        precond = wrap_precond(model, model_args, "linear")
        op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                          sigma_s=0.1, kernel_size=61, intensity=3.0)
        mech = choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
            image_base_covariance="dct_diagonal",
            init_denoiser_variance=1.0, init_noise_variance=80.0**2,
            data_dim=3 * res * res, cov_capacity=128,
            solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000)
        xs, sigma0_scaled = prepare_schedule(
            round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
            net_sigma_max=precond.sigma_max, num_steps=num_steps,
            solver="heun", discretization="edm", schedule="linear",
            scaling="none")

        for batch in (batches_remat if remat else batches_noremat):
            key = jax.random.PRNGKey(0)
            cond = jax.random.uniform(jax.random.fold_in(key, 0),
                                      (batch, 3, res, res), minval=-1, maxval=1)
            y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
                cond, jax.random.fold_in(key, 1))
            noise = jax.random.normal(jax.random.fold_in(key, 2),
                                      (batch, 3, res, res))

            @jax.jit
            def run(params_, noise_, y_, k):
                x, _ = sample_scan(
                    lambda xx, ss: precond.apply(params_, xx, ss), mech,
                    noise_, y_, xs, k, sigma0_scaled=sigma0_scaled)
                return jnp.sum(x)

            tag = f"b{batch}_remat{int(remat)}"
            log(f"[{tag}] compile+warmup...")
            point = dict(batch=batch, remat=remat)
            try:
                t0 = time.time()
                float(run(params, noise, y, jax.random.fold_in(key, 3)))
                point["compile_s"] = round(time.time() - t0, 1)
                times = []
                for i in range(2):
                    t0 = time.time()
                    float(run(params, noise, y, jax.random.fold_in(key, 10 + i)))
                    times.append(round(time.time() - t0, 2))
                    log(f"[{tag}] iter {i}: {times[-1]}s")
                point["iter_s"] = times
                point["samples_per_min"] = round(batch * 60 / min(times), 2)
                point["hbm"] = hbm_stats()
            except Exception as e:  # OOM and friends are data, not crashes
                point["error"] = f"{type(e).__name__}: {str(e)[:300]}"
                log(f"[{tag}] FAILED: {point['error']}")
            results["points"].append(point)
            log(f"[{tag}] {point}")

    os.makedirs("docs/bench", exist_ok=True)
    with open("docs/bench/batch_curve.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
