#!/usr/bin/env python
"""Op-level TPU profile of the UNet forward / forward+vjp with READABLE names.

VERDICT r2 item 3: the round-2 trace summary aggregated opaque fusion ids
("fusion.23628"); this script keeps each device event's metadata (tf_op =
the JAX op path through the flax module tree, hlo_category) so every entry in
the top-op table is attributable to a specific layer and op kind, and
aggregates by category to show where the 65% of non-MXU time goes.

Profiles the compiled forward / forward+vjp executable, or — OP_MODE=full —
the COMPLETE guided sampling scan (identical construction to bench.py:
online_covariance mechanism, DCT prior, tailored CG, 30 Heun steps), so the
guidance-algebra overhead above the fwd+vjp ceiling can be attributed op by
op instead of inferred by ablation (perf_breakdown.py).

Usage: python scripts/op_profile.py              # forward
       OP_MODE=vjp  python scripts/op_profile.py # forward + cotangent pullback
       OP_MODE=full python scripts/op_profile.py # full guided pipeline
Env: OP_BATCH (8), OP_ITERS (3; full default 1), OP_MODE (fwd|vjp|full),
     OP_DTYPE (bf16|f32), OP_STEPS (30, full only),
     OP_OUT (docs/bench/op_profile_<mode>.json)
Reference cost anchor: count_flops.py:69-277.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # v5e bf16 peak; 394 is the INT8 number (we previously used it by mistake)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_trace(tdir):
    """Aggregate device-track complete events by (name), keeping metadata."""
    paths = glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise RuntimeError(f"no trace files under {tdir}")
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = {}
    total_us = 0.0
    tracks = set()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = procs.get(e["pid"], "")
        tname = threads.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        # XLA op-level track only (avoid double counting module/step tracks)
        low = tname.lower()
        if "step" in low or "module" in low or "scope" in low:
            continue
        tracks.add((pname, tname))
        args = e.get("args") or {}
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        total_us += dur
        a = agg.setdefault(name, {"us": 0.0, "count": 0, "meta": {}})
        a["us"] += dur
        a["count"] += 1
        for k in ("long_name", "tf_op", "source", "hlo_category", "tf_name_scope"):
            if k in args and k not in a["meta"]:
                # keep enough of the HLO text that every operand shape
                # survives (conv_roofline.py parses them) — backward conv
                # fusions list several activation operands before the kernel
                a["meta"][k] = str(args[k])[:2500]
    return agg, total_us, sorted(tracks)


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

    batch = int(os.environ.get("OP_BATCH", 8))
    iters = int(os.environ.get("OP_ITERS", 3))
    mode = os.environ.get("OP_MODE", "fwd")
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("OP_DTYPE", "bf16")]
    res = 256
    out_path = os.environ.get(
        "OP_OUT", os.path.join("docs", "bench", f"op_profile_{mode}.json"))

    # OP_REMAT=0 (default) matches the headline bench path (BENCH_REMAT=0):
    # the vjp profile must not include remat recompute kernels
    remat = os.environ.get("OP_REMAT", "0") == "1"
    quant = os.environ.get("OP_QUANT") or None

    log(f"devices: {jax.devices()}  remat={remat} quant={quant}")
    t0 = time.time()
    model, params, model_args = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=dtype, init_random_if_missing=True, remat=remat, quant=quant)
    qscales = None
    if quant == "int8_static":
        # calibrated per-(site, sigma-stage) activation scales (cached);
        # profiled at the bench schedule's length
        from free_hunch_tpu.models.calibrate import bench_qscales
        qscales = bench_qscales(
            "models/256x256_diffusion_uncond.pt", model_args, params,
            num_steps=int(os.environ.get("OP_STEPS", 30)), res=res,
            batch=batch, dtype=dtype)
        log(f"qscales ready ({len(qscales[0])} stages)")
    precond = wrap_precond(model, model_args, "linear", qscales=qscales)
    log(f"model loaded in {time.time() - t0:.1f}s")

    if mode == "fwd":
        def step(p, x, sigma):
            mean, _var = precond.apply(p, x, sigma)
            return mean
    elif mode == "vjp":
        def step(p, x, sigma):
            mean, pullback, _var = jax.vjp(
                lambda xx: precond.apply(p, xx, sigma), x, has_aux=True)
            (grad,) = pullback(mean)  # cotangent = mean, like guidance's mat
            return mean + 0 * grad, grad

    if mode == "full":
        # identical pipeline construction to bench.py
        from free_hunch_tpu.guidance import choose_conditioning_mechanism
        from free_hunch_tpu.operators import get_operator
        from free_hunch_tpu.samplers.edm import (
            prepare_schedule, required_cov_capacity, sample_scan)

        num_steps = int(os.environ.get("OP_STEPS", 30))
        iters = int(os.environ.get("OP_ITERS", 1))
        op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                          sigma_s=0.1, kernel_size=61, intensity=3.0)
        xs, sigma0_scaled = prepare_schedule(
            round_sigma=precond.round_sigma, net_sigma_min=precond.sigma_min,
            net_sigma_max=precond.sigma_max, num_steps=num_steps,
            solver="heun", discretization="edm", schedule="linear",
            scaling="none")
        mech = choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
            image_base_covariance="dct_diagonal",
            init_denoiser_variance=1.0, init_noise_variance=80.0**2,
            data_dim=3 * res * res, cov_capacity=required_cov_capacity(xs),
            solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000,
            cg_warm_start=os.environ.get("OP_CG_WARM", "prev"),
            guidance_gradient=os.environ.get("OP_GRAD", "vjp"))

        @jax.jit
        def fn(p, noise, y, k):
            denoise = lambda xx, ss: precond.apply(p, xx, ss)
            out, _ = sample_scan(denoise, mech, noise, y, xs, k,
                                 sigma0_scaled=sigma0_scaled)
            return out, jnp.sum(out)

        key = jax.random.PRNGKey(0)
        cond = jax.random.uniform(jax.random.fold_in(key, 0),
                                  (batch, 3, res, res), minval=-1, maxval=1)
        y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
            cond, jax.random.fold_in(key, 1))
        noise = jax.random.normal(jax.random.fold_in(key, 2),
                                  (batch, 3, res, res))
        args = (params, noise, y, jax.random.fold_in(key, 3))
    else:
        fn = jax.jit(step)
        x = jnp.zeros((batch, 3, res, res), jnp.float32)
        sigma = jnp.full((batch,), 10.0, jnp.float32)
        args = (params, x, sigma)

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"compile+first: {time.time() - t0:.1f}s")

    times = []
    for _ in range(1 if mode == "full" else 2):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    log(f"steady-state: {min(times)*1e3:.1f} ms")

    # FLOPs from XLA cost analysis of the compiled executable
    lowered = fn.lower(*args).compile()
    ca = lowered.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) if ca else 0.0

    tdir = "/tmp/op_trace"
    os.system(f"rm -rf {tdir}")
    from free_hunch_tpu.utils.profiling import trace
    with trace(tdir):
        for _ in range(iters):
            jax.block_until_ready(fn(*args))

    agg, total_us, tracks = parse_trace(tdir)
    log(f"device tracks: {tracks[:6]} (+{max(0, len(tracks)-6)} more)")
    per_iter_us = total_us / iters
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["us"])

    def cat_of(name, meta):
        c = meta.get("hlo_category")
        if c:
            return c
        for pref in ("fusion", "convolution", "conv", "copy", "dot", "custom-call",
                     "all-reduce", "reshape", "transpose", "convert", "bitcast"):
            if name.startswith(pref):
                return pref
        return "other"

    by_cat = {}
    for name, a in rows:
        c = cat_of(name, a["meta"])
        e = by_cat.setdefault(c, {"us": 0.0, "count": 0})
        e["us"] += a["us"]
        e["count"] += a["count"]

    wall_s = min(times)
    result = {
        "mode": mode, "batch": batch, "res": res,
        "dtype": os.environ.get("OP_DTYPE", "bf16"),
        "remat": remat, "quant": quant,
        "steady_state_ms": round(wall_s * 1e3, 2),
        "device_us_per_iter": round(per_iter_us, 1),
        "xla_flops_per_call": flops,
        "tflops_per_s": round(flops / wall_s / 1e12, 1) if flops else None,
        "mfu_vs_v5e_bf16_peak": round(flops / wall_s / 1e12
                                      / V5E_BF16_PEAK_TFLOPS, 4) if flops else None,
        "by_category": {k: {"us_per_iter": round(v["us"] / iters, 1),
                            "pct": round(100 * v["us"] / total_us, 2),
                            "count": v["count"] // iters}
                        for k, v in sorted(by_cat.items(),
                                           key=lambda kv: -kv[1]["us"])},
        "top_ops": [
            {"name": name,
             "us_per_iter": round(a["us"] / iters, 1),
             "pct": round(100 * a["us"] / total_us, 2),
             "count_per_iter": a["count"] // iters,
             **{k: v for k, v in a["meta"].items() if k in
                ("tf_op", "hlo_category", "source")},
             "long_name": a["meta"].get("long_name", "")[:1500]}
            for name, a in rows[:60]],
        # every conv fusion (not just top-60): conv_roofline.py needs the
        # complete set for a total-coverage roofline
        "all_ops": [
            {"name": name,
             "us_per_iter": round(a["us"] / iters, 1),
             "pct": round(100 * a["us"] / total_us, 2),
             "count_per_iter": a["count"] // iters,
             **{k: v for k, v in a["meta"].items() if k in
                ("tf_op", "hlo_category")},
             "long_name": a["meta"].get("long_name", "")[:1500]}
            for name, a in rows
            if cat_of(name, a["meta"]) == "convolution fusion"],
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("mode", "steady_state_ms", "tflops_per_s",
                       "mfu_vs_v5e_bf16_peak")}))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
