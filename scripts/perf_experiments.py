#!/usr/bin/env python
"""UNet kernel-efficiency experiments on the real TPU (VERDICT r2 items 3+7).

Measures the 256px ADM UNet forward and forward+vjp with the dispatch gap
removed (K calls chained inside one jitted ``lax.fori_loop`` — one dispatch
per measurement), under controllable variants:

  PE_VARIANT=base     f32 params, bf16 compute (the current production path)
  PE_VARIANT=bf16w    params pre-cast to bf16 (halves weight HBM reads and
                      removes the f32->bf16 convert fused into every conv)
  PE_BATCH=8|12|16    batch size (batch>=12 is the r2 open question; HBM is
                      recorded via device_memory_stats either way)
  PE_MODE=fwd|vjp|both
  XLA flag variants come from the caller's XLA_FLAGS (process-global).

Also settles the vjp FLOP factor: XLA cost_analysis of one compiled
fwd-only and one fwd+vjp executable (r2's 3x was an assumption written into
perf_breakdown.py:173-181; the MFU numbers inherit it).

Output: one JSON blob appended to docs/bench/perf_experiments.jsonl with the
variant config, steady-state ms/call, TFLOP/s, MFU, and HBM stats.
Reference cost anchor: count_flops.py:69-277.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # v5e bf16 peak; 394 is the INT8 number (we previously used it by mistake)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hbm_stats(compiled=None):
    """Best-available HBM accounting.

    ``device.memory_stats()`` returns None under the axon tunnel (probed
    2026-08-17), so runtime bytes-in-use is unobservable here; fall back to
    XLA's compile-time memory_analysis of the measured executable, which is
    the allocator's own plan (argument/output/temp/generated-code bytes).
    """
    import jax
    out = {}
    try:
        s = jax.devices()[0].memory_stats() or {}
        out.update({k: int(v) for k, v in s.items()
                    if k in ("bytes_in_use", "peak_bytes_in_use",
                             "bytes_limit", "largest_alloc_size")})
    except Exception as e:
        out["runtime_error"] = str(e)[:200]
    if compiled is not None:
        try:
            ma = compiled.memory_analysis()
            if isinstance(ma, list):
                ma = ma[0]
            if ma is not None:
                for k in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes", "alias_size_in_bytes",
                          "generated_code_size_in_bytes"):
                    v = getattr(ma, k, None)
                    if v is not None:
                        out["xla_" + k] = int(v)
        except Exception as e:
            out["xla_error"] = str(e)[:200]
    return out


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from free_hunch_tpu.models.loading import load_model, wrap_precond

    variant = os.environ.get("PE_VARIANT", "base")
    batch = int(os.environ.get("PE_BATCH", 8))
    mode = os.environ.get("PE_MODE", "both")
    loop_k = int(os.environ.get("PE_LOOP", 8))
    res = 256
    out_path = os.environ.get("PE_OUT", "docs/bench/perf_experiments.jsonl")

    log(f"devices: {jax.devices()}  variant={variant} batch={batch}")
    if mode != "calib":  # calib needs no model
        t0 = time.time()
        model, params, model_args = load_model(
            "models/256x256_diffusion_uncond.pt",
            "models/256x256_diffusion_uncond_setup.txt",
            dtype=jnp.bfloat16, init_random_if_missing=True)
        precond = wrap_precond(model, model_args, "linear")
        log(f"model loaded in {time.time() - t0:.1f}s")

        if variant == "bf16w":
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)

    def fwd_once(p, x, sigma):
        mean, _ = precond.apply(p, x, sigma)
        return mean

    def vjp_once(p, x, sigma):
        mean, pullback, _var = jax.vjp(
            lambda xx: precond.apply(p, xx, sigma), x, has_aux=True)
        (grad,) = pullback(mean)
        return grad

    def looped(once):
        def run(p, x, sigma):
            def body(_, xx):
                out = once(p, xx, sigma)
                # feed the output back so iterations can't be elided
                return xx + 1e-6 * out.astype(xx.dtype)
            out = jax.lax.fori_loop(0, loop_k, body, x)
            # scalar checksum: float() on it forces completion on the remote
            # axon backend, where block_until_ready returns early
            return jnp.sum(out.astype(jnp.float32))
        return run

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 3, res, res),
                          jnp.float32)
    sigma = jnp.full((batch,), 10.0, jnp.float32)

    record = dict(variant=variant, batch=batch, loop_k=loop_k,
                  xla_flags=os.environ.get("XLA_FLAGS", ""),
                  ts=time.strftime("%Y-%m-%d %H:%M:%S"))

    if mode == "calib":
        # practical MXU ceiling of THIS chip/tunnel: a big bf16 matmul and an
        # ideal-shape 3x3 conv, measured the same looped way. Conv %peak is
        # only meaningful relative to these.
        import numpy as np
        m = k = n = 8192
        a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)),
                        jnp.bfloat16)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)),
                        jnp.bfloat16)

        def mm_loop(a_, b_):
            # pure GEMM chain: the scale keeps ~unit variance (1/sqrt(k)) and
            # fuses into the GEMM epilogue — the first cut used a tanh on the
            # 67M-element product, which cost ~half the loop time and made
            # the "ceiling" read 27% instead of the chip's real number
            scale = jnp.bfloat16(0.011)

            def body(_, acc):
                return (acc @ b_) * scale
            out = jax.lax.fori_loop(0, loop_k, body, a_)
            return jnp.sum(out.astype(jnp.float32))

        fn = jax.jit(mm_loop).lower(a, b).compile()
        float(fn(a, b))
        times = []
        for _ in range(3):
            t0 = time.time()
            float(fn(a, b))
            times.append(time.time() - t0)
        mm_flops = 2.0 * m * k * n
        mm_tfs = mm_flops / (min(times) / loop_k) / 1e12
        record["matmul_8192"] = dict(
            per_call_ms=round(min(times) / loop_k * 1e3, 2),
            tflops_per_s=round(mm_tfs, 1),
            pct_bf16_peak=round(100 * mm_tfs / V5E_BF16_PEAK_TFLOPS, 1))
        log(f"[calib] matmul {mm_tfs:.1f} TFLOP/s "
            f"({mm_tfs/V5E_BF16_PEAK_TFLOPS:.1%})")

        cw = jnp.asarray(np.random.default_rng(2).normal(
            size=(3, 3, 512, 512)) * 0.02, jnp.bfloat16)
        cx = jnp.asarray(np.random.default_rng(3).normal(
            size=(8, 128, 128, 512)), jnp.bfloat16)

        def conv_loop(x_, w_):
            # pure conv chain (scale keeps ~unit variance: 1/(sqrt(9*512)*0.02))
            scale = jnp.bfloat16(0.736)

            def body(_, xx):
                out = jax.lax.conv_general_dilated(
                    xx, w_, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return out.astype(xx.dtype) * scale
            out = jax.lax.fori_loop(0, loop_k, body, x_)
            return jnp.sum(out.astype(jnp.float32))

        fnc = jax.jit(conv_loop).lower(cx, cw).compile()
        float(fnc(cx, cw))
        times = []
        for _ in range(3):
            t0 = time.time()
            float(fnc(cx, cw))
            times.append(time.time() - t0)
        cflops = 2.0 * 8 * 128 * 128 * 512 * 512 * 9
        ctfs = cflops / (min(times) / loop_k) / 1e12
        record["conv_3x3_512_512"] = dict(
            per_call_ms=round(min(times) / loop_k * 1e3, 2),
            tflops_per_s=round(ctfs, 1),
            pct_bf16_peak=round(100 * ctfs / V5E_BF16_PEAK_TFLOPS, 1),
            note="bare bf16 conv (UNet up_11_us in_conv shape: 512->512 "
                 "at 128^2), no epilogue fusion")
        log(f"[calib] conv {ctfs:.1f} TFLOP/s "
            f"({ctfs/V5E_BF16_PEAK_TFLOPS:.1%})")
        modes = ()
    else:
        modes = ("fwd", "vjp") if mode == "both" else (mode,)
    for m in modes:
        once = fwd_once if m == "fwd" else vjp_once
        # single-eval FLOPs (no loop) from cost analysis
        t0 = time.time()
        single = jax.jit(once).lower(params, x, sigma).compile()
        ca = single.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops1 = float(ca.get("flops", 0.0)) if ca else 0.0
        log(f"[{m}] single-eval compile {time.time()-t0:.1f}s, "
            f"cost_analysis {flops1/1e12:.3f} TFLOP")

        t0 = time.time()
        fn = jax.jit(looped(once)).lower(params, x, sigma).compile()
        log(f"[{m}] loop compile {time.time()-t0:.1f}s")
        t0 = time.time()
        float(fn(params, x, sigma))
        warm = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            float(fn(params, x, sigma))
            times.append(time.time() - t0)
        per_call_ms = min(times) / loop_k * 1e3
        tflops_s = flops1 / (per_call_ms * 1e-3) / 1e12
        record[m] = dict(
            single_eval_tflop=round(flops1 / 1e12, 3),
            per_call_ms=round(per_call_ms, 2),
            tflops_per_s=round(tflops_s, 1),
            mfu_vs_v5e_bf16_peak=round(tflops_s / V5E_BF16_PEAK_TFLOPS, 4),
            warm_first_s=round(warm, 2),
            hbm=hbm_stats(fn))
        log(f"[{m}] {per_call_ms:.2f} ms/call  {tflops_s:.1f} TFLOP/s  "
            f"MFU {tflops_s/V5E_BF16_PEAK_TFLOPS:.1%}")

    if "fwd" in record and "vjp" in record:
        record["vjp_flop_factor"] = round(
            record["vjp"]["single_eval_tflop"]
            / max(record["fwd"]["single_eval_tflop"], 1e-9), 3)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
