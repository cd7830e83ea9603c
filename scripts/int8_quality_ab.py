#!/usr/bin/env python
"""Int8-vs-bf16 error budget at the flagship 256px topology (VERDICT r3
item 1): per-call denoiser contract errors across the production sigma
schedule, plus a free-running end-to-end delta.

Teacher-forced tier: the SAME random-init 552M-param ADM UNet evaluated with
quant=None (bf16 torso) and quant='int8' on identical (x, sigma) inputs for
every sigma of the 30-step Heun grid — relative errors of x0_mean, x0_var
(the denoiser contract, reference openai_preconditioning.py:167-197), and
the guidance pullback (cotangent = x0_mean, the vjp mode's actual use).

Free-running tier: the full guided pipeline (gaussian_blur, online
covariance, 30 steps, batch 4) in both arithmetics — PSNR-vs-conditioning
delta and final-image distance (relative comparison; random weights).

The GMM / linear-Gaussian oracles contain no UNet, so quantization cannot
affect them — the end-to-end quality gates for quant live here and in
tests/test_quant.py (small-topology CPU budget gates).

Output: docs/bench/int8_quality_ab.json. Runs on the TPU (minutes).
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

    res = 256
    batch = int(os.environ.get("QAB_BATCH", 4))
    steps = int(os.environ.get("QAB_STEPS", 30))

    quant = os.environ.get("QAB_QUANT", "int8")  # int8 | int8_static

    model_b, params, margs = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True, remat=False)
    model_q, _, _ = load_model(
        "models/256x256_diffusion_uncond.pt",
        "models/256x256_diffusion_uncond_setup.txt",
        dtype=jnp.bfloat16, init_random_if_missing=True, remat=False,
        quant=quant)
    qscales = None
    if quant == "int8_static":
        from free_hunch_tpu.models.calibrate import bench_qscales
        margin = float(os.environ.get("QAB_MARGIN", 1.0))
        qscales = bench_qscales(
            "models/256x256_diffusion_uncond.pt", margs, params,
            num_steps=steps, res=res, batch=8, dtype=jnp.bfloat16,
            margin=margin)
        log(f"qscales ready ({len(qscales[0])} stages, margin={margin})")
    pre_b = wrap_precond(model_b, margs, "linear")
    pre_q = wrap_precond(model_q, margs, "linear", qscales=qscales)

    xs, sigma0_scaled = prepare_schedule(
        round_sigma=pre_b.round_sigma, net_sigma_min=pre_b.sigma_min,
        net_sigma_max=pre_b.sigma_max, num_steps=steps, solver="heun",
        discretization="edm", schedule="linear", scaling="none")

    def call(pre):
        def f(p, x, sigma):
            mean, pullback, var = jax.vjp(
                lambda xx: pre.apply(p, xx, sigma), x, has_aux=True)
            (g,) = pullback(mean)
            return mean, var, g
        return jax.jit(f)

    f_b, f_q = call(pre_b), call(pre_q)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))

    key = jax.random.PRNGKey(0)
    sig_grid = np.asarray(xs["sigma_hat"], np.float64)
    if os.environ.get("QAB_SKIP_TEACHER") == "1":
        sig_grid = sig_grid[:0]  # e2e-only sweep runs

    # Teacher states are REAL trajectory states from a bf16 guided replay —
    # static activation scales are calibrated for the trajectory
    # distribution, so probing with off-distribution noise-scaled inputs
    # (the pre-round-5 protocol) measures a quantization-grid mismatch that
    # production never sees. Gathering stays under jit (remote-backend eager
    # dispatch + tunnel-transfer rules, models/calibrate.py).
    traj = None
    if len(sig_grid):
        from free_hunch_tpu.guidance import choose_conditioning_mechanism
        from free_hunch_tpu.operators import get_operator
        t_op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                            sigma_s=0.1, kernel_size=61, intensity=3.0)
        t_mech = choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=t_op, clip_x0_mean=False,
            image_base_covariance="dct_diagonal", init_denoiser_variance=1.0,
            init_noise_variance=80.0**2, data_dim=3 * res * res,
            cov_capacity=required_cov_capacity(xs),
            solver_type="customcuda", guidance_gradient="covariance")
        t_cond = jax.random.uniform(jax.random.fold_in(key, 200),
                                    (batch, 3, res, res), minval=-1, maxval=1)
        t_y = jax.jit(lambda c, k: t_op.forward(c, noiseless=False, key=k))(
            t_cond, jax.random.fold_in(key, 201))
        t_noise = jax.random.normal(jax.random.fold_in(key, 202),
                                    (batch, 3, res, res))
        _, traj = jax.jit(lambda p, n, yy, k: sample_scan(
            lambda x, s: pre_b.apply(p, x, s), t_mech, n, yy, xs, k,
            sigma0_scaled=sigma0_scaled, return_trajectory=True))(
                params, t_noise, t_y, jax.random.fold_in(key, 203))
        scale_ratio = np.asarray(xs["scale_ratio"], np.float64)

        @jax.jit
        def gather(traj_, n_, j, ratio):
            x0_ = n_.astype(jnp.float32) * sigma0_scaled
            prev = jnp.where(
                j == 0, x0_,
                jax.lax.dynamic_index_in_dim(traj_, jnp.maximum(j - 1, 0), 0,
                                             keepdims=False))
            return ratio * prev

    rows = []
    for i, sig in enumerate(sig_grid):
        x = gather(traj, t_noise, jnp.asarray(i, jnp.int32),
                   jnp.float32(scale_ratio[i]))
        s = jnp.full((batch,), float(sig), jnp.float32)
        mb, vb, gb = f_b(params, x, s)
        mq, vq, gq = f_q(params, x, s)
        row = dict(sigma=round(float(sig), 4),
                   mean_rel=rel(mq, mb), var_rel=rel(vq, vb),
                   pullback_rel=rel(gq, gb))
        rows.append(row)
        log(f"call {i:2d} {row}")

    summary = {k: dict(
        max=max(r[k] for r in rows),
        median=float(np.median([r[k] for r in rows])))
        for k in ("mean_rel", "var_rel", "pullback_rel")} if rows else {}
    log(f"teacher summary: {summary}")

    # --- free-running tier -------------------------------------------------
    op = get_operator(name="gaussian_blur", in_shape=(1, 3, res, res),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)
    cov_k = required_cov_capacity(xs)

    def mech():
        return choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
            image_base_covariance="dct_diagonal",
            init_denoiser_variance=1.0, init_noise_variance=80.0**2,
            data_dim=3 * res * res, cov_capacity=cov_k,
            solver_type="customcuda", max_rtol=1.0, cg_maxiter=5000,
            cg_warm_start="prev")

    cond = jax.random.uniform(jax.random.fold_in(key, 100),
                              (batch, 3, res, res), minval=-1, maxval=1)
    y = jax.jit(lambda c, k: op.forward(c, noiseless=False, key=k))(
        cond, jax.random.fold_in(key, 101))
    noise = jax.random.normal(jax.random.fold_in(key, 102),
                              (batch, 3, res, res))

    e2e = {}
    for name, pre in (("bf16", pre_b), ("int8", pre_q)):
        # 'int8' labels the quantized side regardless of QAB_QUANT mode;
        # the protocol block records which mode ran
        m = mech()

        @jax.jit
        def run(p, nz, yy, k, _pre=pre, _m=m):
            x, _ = sample_scan(lambda xx, ss: _pre.apply(p, xx, ss), _m,
                               nz, yy, xs, k, sigma0_scaled=sigma0_scaled)
            return x

        t0 = time.time()
        out = run(params, noise, y, jax.random.fold_in(key, 103))
        out = np.asarray(out)
        o = np.clip(out, -1, 1)
        c = np.clip(np.asarray(cond), -1, 1)
        mse = np.mean((o - c) ** 2)
        e2e[name] = dict(psnr_vs_cond=float(10 * np.log10(4.0 / mse)),
                         wall_s=round(time.time() - t0, 1))
        e2e[name + "_final"] = o
        log(f"[e2e {name}] {e2e[name]}")

    final_rel = rel(e2e.pop("int8_final"), e2e.pop("bf16_final"))
    e2e["final_image_rel_l2"] = final_rel
    e2e["psnr_delta"] = abs(e2e["int8"]["psnr_vs_cond"]
                            - e2e["bf16"]["psnr_vs_cond"])

    out_path = os.environ.get("QAB_OUT", "docs/bench/int8_quality_ab.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    result = dict(protocol=dict(res=res, batch=batch, steps=steps, quant=quant,
                                weights="random-init flagship (zero egress)",
                                note="teacher-forced per-call + free-running "
                                     "relative comparison, quantized vs bf16"),
                  per_call=rows, per_call_summary=summary, e2e=e2e)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(dict(per_call_summary=summary, e2e=e2e), indent=1))


if __name__ == "__main__":
    main()
