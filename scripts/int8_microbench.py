#!/usr/bin/env python
"""Does XLA reach the v5e int8 MXU path? (VERDICT r3 next-round item 1.)

The v5e's int8 peak (~394 TOP/s) is 2x its bf16 peak (~197 TFLOP/s) — the
one hardware lever left toward the 64 samples/min north star. Before building
a quantized UNet, measure on THIS chip whether plain XLA ops hit the int8
MXU rate:

  mm_bf16 / mm_int8        8192^3 matmul, bf16 vs s8xs8->s32
  conv_bf16 / conv_int8    3x3 512->512 conv at 128^2 (the UNet's hottest
                           conv shape), bf16 vs s8xs8->s32
  conv_int8_e2e            same int8 conv including the realistic epilogue:
                           f32 activations in -> per-sample dynamic
                           quantization -> int8 conv -> dequant to f32
  convT_bf16 / convT_int8  the pullback twin (dx = conv with flipped kernel,
                           I/O swapped) — quantized backward feasibility

All measured the perf_experiments.py way: K calls chained inside one jitted
fori_loop so dispatch is amortised; rate = analytic op count / per-call time.
Appends one JSON blob to docs/bench/int8_microbench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197.0   # TFLOP/s
V5E_INT8_PEAK = 394.0   # TOP/s


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

    loop_k = int(os.environ.get("I8_LOOP", 8))
    record = {"loop_k": loop_k, "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    rng = np.random.default_rng(0)

    def timed(fn, args, ops, name, peak):
        """ops = MACs*2 per single call; peak in T(FL)OP/s."""
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        log(f"[{name}] compile {time.time()-t0:.1f}s")
        float(c(*args))
        times = []
        for _ in range(3):
            t0 = time.time()
            float(c(*args))
            times.append(time.time() - t0)
        per_call = min(times) / loop_k
        rate = ops / per_call / 1e12
        entry = dict(per_call_ms=round(per_call * 1e3, 3),
                     tops_per_s=round(rate, 1),
                     pct_peak=round(100 * rate / peak, 1))
        record[name] = entry
        log(f"[{name}] {entry}")
        return entry

    # ---- matmul 8192^3 ----
    m = k = n = 8192
    a16 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    mm_ops = 2.0 * m * k * n

    def mm_bf16(a_, b_):
        scale = jnp.bfloat16(0.011)

        def body(_, acc):
            return (acc @ b_) * scale
        return jnp.sum(jax.lax.fori_loop(0, loop_k, body, a_)
                       .astype(jnp.float32))

    def mm_int8(a_, b_):
        def body(_, acc):
            out = jax.lax.dot_general(
                acc, b_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # re-narrow so every iteration is s8 x s8 (epilogue on VPU)
            return (out >> 12).astype(jnp.int8)
        return jnp.sum(jax.lax.fori_loop(0, loop_k, body, a_)
                       .astype(jnp.int32))

    timed(mm_bf16, (a16, b16), mm_ops, "mm_bf16", V5E_BF16_PEAK)
    timed(mm_int8, (a8, b8), mm_ops, "mm_int8", V5E_INT8_PEAK)

    # ---- 3x3 conv, UNet hot shape: 512->512 at 128^2, batch 8 ----
    B, H, W, C = 8, 128, 128, 512
    cw16 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.02, jnp.bfloat16)
    cx16 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    cw8 = jnp.asarray(rng.integers(-127, 128, size=(3, 3, C, C)), jnp.int8)
    cx8 = jnp.asarray(rng.integers(-127, 128, size=(B, H, W, C)), jnp.int8)
    conv_ops = 2.0 * B * H * W * C * C * 9
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_bf16(x_, w_):
        scale = jnp.bfloat16(0.736)

        def body(_, xx):
            out = jax.lax.conv_general_dilated(
                xx, w_, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            return out.astype(xx.dtype) * scale
        return jnp.sum(jax.lax.fori_loop(0, loop_k, body, x_)
                       .astype(jnp.float32))

    def conv_int8(x_, w_):
        def body(_, xx):
            out = jax.lax.conv_general_dilated(
                xx, w_, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (out >> 14).astype(jnp.int8)
        return jnp.sum(jax.lax.fori_loop(0, loop_k, body, x_)
                       .astype(jnp.int32))

    timed(conv_bf16, (cx16, cw16), conv_ops, "conv_bf16", V5E_BF16_PEAK)
    try:
        timed(conv_int8, (cx8, cw8), conv_ops, "conv_int8", V5E_INT8_PEAK)
    except Exception as e:
        record["conv_int8"] = {"error": str(e)[:300]}
        log(f"[conv_int8] FAILED: {e}")

    # ---- realistic end-to-end int8 conv: f32 in/out, dynamic per-sample
    #      activation scale, per-channel weight scale ----
    cxf = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    wscale = jnp.asarray(rng.uniform(0.5, 2.0, size=(C,)), jnp.float32)

    def conv_int8_e2e(x_, wq, ws):
        def body(_, xx):
            amax = jnp.max(jnp.abs(xx), axis=(1, 2, 3), keepdims=True)
            ascale = jnp.maximum(amax, 1e-12) / 127.0
            xq = jnp.clip(jnp.round(xx / ascale), -127, 127).astype(jnp.int8)
            out = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            outf = out.astype(jnp.float32) * (ascale * ws * 1e-4)
            return outf
        return jnp.sum(jax.lax.fori_loop(0, loop_k, body, x_))

    try:
        timed(conv_int8_e2e, (cxf, cw8, wscale), conv_ops, "conv_int8_e2e",
              V5E_INT8_PEAK)
    except Exception as e:
        record["conv_int8_e2e"] = {"error": str(e)[:300]}
        log(f"[conv_int8_e2e] FAILED: {e}")

    # ---- pullback twin: dx-conv (flipped kernel, I<->O swapped) ----
    # grad-of-conv w.r.t. input at stride 1 is itself a 3x3 conv with the
    # kernel spatially reversed and in/out channels transposed — same MXU
    # shape, so int8 speed here is what makes a quantized *pullback* viable.
    cwT16 = jnp.transpose(cw16[::-1, ::-1], (0, 1, 3, 2))
    cwT8 = jnp.transpose(cw8[::-1, ::-1], (0, 1, 3, 2))
    timed(conv_bf16, (cx16, cwT16), conv_ops, "convT_bf16", V5E_BF16_PEAK)
    try:
        timed(conv_int8, (cx8, cwT8), conv_ops, "convT_int8", V5E_INT8_PEAK)
    except Exception as e:
        record["convT_int8"] = {"error": str(e)[:300]}
        log(f"[convT_int8] FAILED: {e}")

    out_path = os.environ.get("I8_OUT", "docs/bench/int8_microbench.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
