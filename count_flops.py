#!/usr/bin/env python
"""FLOP accounting for the denoiser forward (and the full guided step).

Parity: reference ``count_flops.py:21-277`` (monkey-patched conv2d/einsum/SDPA
counters over a torch.jit trace). TPU redesign: XLA already knows — lower the
jitted function and read ``cost_analysis()`` (flops, bytes accessed) from the
compiled executable; per-op tables come from the optimized HLO.

Usage: python count_flops.py [--res 256] [--batch 1] [--full-step]
"""
from __future__ import annotations

import argparse
import json
import sys


def count_flops(fn, *example_args):
    """Compile fn and return XLA's cost analysis dict (flops, bytes, ...)."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return dict(cost or {}), compiled


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--setup", default="models/256x256_diffusion_uncond_setup.txt")
    p.add_argument("--state-dict", default="models/256x256_diffusion_uncond.pt")
    p.add_argument("--full-step", action="store_true",
                   help="count the whole guided sampler step, not just the UNet")
    args = p.parse_args()

    import jax.numpy as jnp

    from free_hunch_tpu.models.loading import load_model, wrap_precond
    from free_hunch_tpu.utils.misc import count_parameters

    model, params, model_args = load_model(args.state_dict, args.setup,
                                           dtype=jnp.bfloat16,
                                           init_random_if_missing=True)
    precond = wrap_precond(model, model_args, "linear")
    res = model_args.get("image_size", args.res)

    x = jnp.zeros((args.batch, 3, res, res), jnp.float32)
    sigma = jnp.full((args.batch,), 10.0, jnp.float32)

    if args.full_step:
        # the whole guided sampling run (UNet forwards + vjp pullbacks +
        # covariance updates + CG), identically constructed to bench.py
        import jax

        from free_hunch_tpu.guidance import choose_conditioning_mechanism
        from free_hunch_tpu.operators import get_operator
        from free_hunch_tpu.samplers.edm import (prepare_schedule,
                                                 required_cov_capacity,
                                                 sample_scan)

        op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                          sigma_s=0.1, kernel_size=61, intensity=3.0)
        xs, s0 = prepare_schedule(
            round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
            net_sigma_max=precond.sigma_max, num_steps=30, solver="heun",
            discretization="edm", schedule="linear", scaling="none")
        mech = choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
            image_base_covariance="dct_diagonal",
            init_denoiser_variance=1.0, init_noise_variance=80.0**2,
            data_dim=3 * res * res, cov_capacity=required_cov_capacity(xs),
            solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000)

        def step(p_, noise_, y_, k_):
            denoise = lambda xx, ss: precond.apply(p_, xx, ss)
            out, _ = sample_scan(denoise, mech, noise_, y_, xs, k_,
                                 sigma0_scaled=s0)
            return out

        y = jax.eval_shape(lambda c: op.forward(c, noiseless=True), x)
        cost, compiled = count_flops(step, params, x,
                                     jnp.zeros(y.shape, jnp.float32),
                                     jax.random.PRNGKey(0))
        flop_key = "flops_per_guided_run"
    else:
        def forward(p_, x_, s_):
            return precond.apply(p_, x_, s_)[0]

        cost, compiled = count_flops(forward, params, x, sigma)
        flop_key = "flops_per_forward"
    n_params = count_parameters(params)
    report = {
        "params": n_params,
        "batch": args.batch,
        "resolution": res,
        flop_key: cost.get("flops"),
        "g" + flop_key: (cost.get("flops") or 0) / 1e9,
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mib": (compiled.memory_analysis().temp_size_in_bytes / 2**20
                       if compiled.memory_analysis() else None),
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
