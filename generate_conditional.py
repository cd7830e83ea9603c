#!/usr/bin/env python
"""CLI entry point for guided conditional generation.

Usage mirrors the reference (``python generate_conditional.py --outdir=...
--conditioning_mechanism=online_covariance --operator_name=gaussian_blur ...``,
reference generate_conditional.py:434-598); the full key surface lives in
config/config.yaml. The DDNM+ path (`--conditioning_mechanism=ddnm`) routes to
the dedicated SVD sampler with the reference's step doubling.
"""
import os
import sys

from free_hunch_tpu.config import load_config
from free_hunch_tpu.parallel import dist_init, get_rank
from free_hunch_tpu.utils.logging import Tee, setup_logger

logger = setup_logger()


def cmdline(argv=None):
    opts = load_config(argv=argv)
    os.makedirs(opts.outdir, exist_ok=True)

    try:  # persistent compilation cache across runs
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    if not opts.get("conditional", True):
        raise SystemExit("unconditional generation is not part of this pipeline")
    if opts.get("net") is None and opts.get("openai_state_dict_path") is None:
        raise SystemExit("specify --openai_state_dict_path (or --net)")

    def run():
        if opts.get("conditioning_mechanism") == "ddnm":
            from free_hunch_tpu.eval_ddnm import DDNMEvaluator
            if opts.get("solver", "heun") == "heun":
                # match the reference's NFE-parity doubling
                # (generate_conditional.py:489-490)
                opts["num_steps"] = int(opts["num_steps"]) * 2
            logger.info(f"DDNM+ sampler with {opts['num_steps']} steps")
            return DDNMEvaluator(opts).run()
        from free_hunch_tpu.eval import Evaluator
        return Evaluator(opts).run()

    # join the distributed runtime BEFORE the first rank query: get_rank()
    # initialises the local jax backend, after which
    # jax.distributed.initialize() raises (and every host reads rank 0)
    dist_init()

    def summarize(results):
        print(f"Time taken: {results.get('time_taken', float('nan')):.1f}s")
        print(f"PSNR: {results['psnr']}, SSIM: {results['ssim']}, "
              f"LPIPS: {results['lpips']}")

    if get_rank() == 0:
        # rank-0 output.log is part of the documented artifact layout
        # (reference generate_conditional.py:454-459 redirects
        # unconditionally); Tee echoes to the terminal as well
        with Tee(os.path.join(opts.outdir, "output.log")):
            results = run()
            summarize(results)
    else:
        results = run()
    return results


if __name__ == "__main__":
    cmdline()
