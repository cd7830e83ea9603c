#!/usr/bin/env python
"""Chaos-noise control for the free-running quality A/B (QAB e2e tier).

The QAB e2e compares quantized vs bf16 guided runs with SHARED noise on a
random-init flagship UNet. A random denoiser has no Lipschitz smoothness,
so per-call perturbations amplify exponentially and the two runs' final
images differ completely (final_image_rel_l2 ~ 1); the PSNR-vs-cond DELTA
is then a draw from the protocol's own chaos distribution, not a clean
systematic-bias readout. This control measures that distribution: the SAME
bf16 pipeline run with K different initial noises — the spread of
PSNR-vs-cond across noises is the scale below which QAB e2e deltas are
indistinguishable from noise.

Output: docs/bench/qab_noise_control.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.operators import get_operator
    from free_hunch_tpu.samplers.edm import (prepare_schedule,
                                             required_cov_capacity,
                                             sample_scan)

    res, batch, steps = 256, int(os.environ.get("QNC_BATCH", 4)), 30
    n_seeds = int(os.environ.get("QNC_SEEDS", 4))

    model, params, margs = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True, remat=False)
    pre = wrap_precond(model, margs, "linear")
    xs, s0 = prepare_schedule(
        round_sigma=pre.round_sigma, net_sigma_min=pre.sigma_min,
        net_sigma_max=pre.sigma_max, num_steps=steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)
    mech = choose_conditioning_mechanism("online_covariance")(
        cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
        image_base_covariance="dct_diagonal", init_denoiser_variance=1.0,
        init_noise_variance=80.0**2, data_dim=3 * res * res,
        cov_capacity=required_cov_capacity(xs), solver_type="customcuda",
        cg_warm_start="prev")

    key = jax.random.PRNGKey(0)
    # SAME conditioning/measurement as the QAB e2e tier
    cond = jax.random.uniform(jax.random.fold_in(key, 100),
                              (batch, 3, res, res), minval=-1, maxval=1)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        cond, jax.random.fold_in(key, 101))

    @jax.jit
    def run(p, nz, yy, k):
        x, _ = sample_scan(lambda xx, ss: pre.apply(p, xx, ss), mech,
                           nz, yy, xs, k, sigma0_scaled=s0)
        return x

    c = np.clip(np.asarray(cond), -1, 1)
    psnrs = []
    for s in range(n_seeds):
        noise = jax.random.normal(jax.random.fold_in(key, 102 + s),
                                  (batch, 3, res, res))
        out = np.clip(np.asarray(run(params, noise, y,
                                     jax.random.fold_in(key, 103))), -1, 1)
        mse = np.mean((out - c) ** 2)
        psnrs.append(float(10 * np.log10(4.0 / mse)))
        print(f"noise seed {s}: psnr_vs_cond {psnrs[-1]:.4f}",
              file=sys.stderr, flush=True)

    result = dict(
        protocol=dict(res=res, batch=batch, steps=steps, arith="bf16",
                      n_noise_seeds=n_seeds,
                      note="same pipeline/cond/measurement, different "
                           "initial noise — PSNR spread = the chaos-noise "
                           "scale of the QAB e2e delta on random-init "
                           "weights"),
        psnr_vs_cond=psnrs,
        spread=dict(max_abs_pairwise=float(np.max(psnrs) - np.min(psnrs)),
                    std=float(np.std(psnrs))))
    out_path = "docs/bench/qab_noise_control.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["spread"]))


if __name__ == "__main__":
    main()
