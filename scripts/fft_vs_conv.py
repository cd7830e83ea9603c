#!/usr/bin/env python
"""Microbench: FFT-based vs direct-convolution application of the blur
operator at the production CG-matvec shape.

The full-pipeline op profile (docs/bench/op_profile_full.json) shows the CG
body spends 65% of its time in jnp.fft fusions — 6 complex FFT2s per
iteration (A^T u, A v, and the Fourier-diagonal preconditioner) at ~0.22 ms
each on the VPU, ~3x off HBM roofline. The blur A is a 61x61 circular
convolution; on TPU the MXU can apply it directly (depthwise conv over a
wrap-padded input), and the gaussian kernel is rank-1 so a separable 61x1 +
1x61 pair is exact. This script measures, dispatch-amortised via fori_loop:

  fft:       ifft2(FB * fft2(u)).real               (the current matvec leg)
  rfft:      irfft2(FBhalf * rfft2(u))              (Hermitian half-spectrum)
  conv:      depthwise 61x61 VALID conv on wrap-padded u
  sepconv:   depthwise (61x1 then 1x61) on wrap-padded u
  dftmm:     F^-1 D F as complex64 matmuls (256x256 DFT matrices on the MXU)

Each variant loops K applications with a dependency chain so XLA cannot
elide work. Writes docs/bench/fft_vs_conv.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


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

    B, C, H, W = 8, 3, 256, 256
    K = int(os.environ.get("FC_LOOP", 50))
    ksz = 61
    rng = np.random.default_rng(0)

    # gaussian 61x61 kernel (rank-1), like the production operator
    from free_hunch_tpu.operators.blurkernel import gaussian_kernel
    ker = np.asarray(gaussian_kernel(ksz, 3.0), np.float32)
    u0 = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.float32)

    # FFT filters computed host-side with numpy (eager complex FFT is broken
    # on the remote axon backend; the production code precomputes under jit)
    from free_hunch_tpu.ops.fftops import p2o_np
    FB = np.asarray(p2o_np(ker[None, None], (H, W)), np.complex64)
    rolled = np.roll(np.pad(ker, ((0, H - ksz), (0, W - ksz))),
                     (-(ksz // 2), -(ksz // 2)), axis=(-2, -1))
    FBh = np.asarray(np.fft.rfft2(rolled), np.complex64)[None, None]

    def time_variant(name, body):
        @jax.jit
        def run(u):
            def it(_, x):
                return body(x) * (1.0 / (1.0 + 1e-9))  # keep chain, avoid growth
            return jax.lax.fori_loop(0, K, it, u)

        out = run(u0)
        jax.block_until_ready(out)
        chk = float(jnp.sum(out))  # force completion on async backends
        times = []
        for _ in range(3):
            t0 = time.time()
            r = run(u0)
            float(jnp.sum(r))
            times.append(time.time() - t0)
        per_call_us = min(times) / K * 1e6
        log(f"{name:10s} {per_call_us:9.1f} us/apply  (checksum {chk:.3f})")
        return per_call_us

    results = {"shape": [B, C, H, W], "kernel": ksz, "loop_k": K}

    # 1) current FFT leg
    def fft_leg(u):
        cu = jnp.fft.fft2(u.astype(jnp.complex64))
        return jnp.fft.ifft2(FB * cu).real.astype(jnp.float32)
    results["fft_us"] = time_variant("fft", fft_leg)

    # 2) rfft2 (real input, Hermitian filter)
    def rfft_leg(u):
        cu = jnp.fft.rfft2(u)
        return jnp.fft.irfft2(FBh * cu, s=(H, W)).astype(jnp.float32)
    results["rfft_us"] = time_variant("rfft", rfft_leg)

    # 3) direct depthwise conv on wrap-padded input (exact circular conv)
    kflip = ker[::-1, ::-1].copy()
    wk = np.broadcast_to(kflip, (C, 1, ksz, ksz)).copy()  # OIHW depthwise

    def conv_leg(u):
        up = jnp.pad(u, ((0, 0), (0, 0), (ksz // 2, ksz // 2), (ksz // 2, ksz // 2)),
                     mode="wrap")
        return jax.lax.conv_general_dilated(
            up, wk, (1, 1), "VALID", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    results["conv_us"] = time_variant("conv", conv_leg)

    # 4) separable (gaussian is rank-1: exact)
    uu, ss, vv = np.linalg.svd(ker)
    kcol = (uu[:, 0] * np.sqrt(ss[0])).astype(np.float32)  # (61,)
    krow = (vv[0] * np.sqrt(ss[0])).astype(np.float32)
    log(f"kernel rank-1 residual: {ss[1] / ss[0]:.2e}")
    wcol = np.broadcast_to(kcol[::-1].copy()[:, None].reshape(1, 1, ksz, 1),
                           (C, 1, ksz, 1)).copy()
    wrow = np.broadcast_to(krow[::-1].copy().reshape(1, 1, 1, ksz),
                           (C, 1, 1, ksz)).copy()

    def sep_leg(u):
        up = jnp.pad(u, ((0, 0), (0, 0), (ksz // 2, ksz // 2), (0, 0)), mode="wrap")
        v = jax.lax.conv_general_dilated(
            up, wcol, (1, 1), "VALID", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (ksz // 2, ksz // 2)), mode="wrap")
        return jax.lax.conv_general_dilated(
            vp, wrow, (1, 1), "VALID", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    results["sepconv_us"] = time_variant("sepconv", sep_leg)

    # 5) DFT as complex matmuls on the MXU (F^-1 D F)
    n = H
    w_dft = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    Fm = np.asarray(w_dft, np.complex64)
    Fi = np.asarray(np.conj(w_dft) / n, np.complex64)

    def dftmm_leg(u):
        cu = u.astype(jnp.complex64)
        # rows then cols: F x F^T ; filter ; inverse pair
        y = jnp.einsum("km,bcmw->bckw", Fm, cu)
        y = jnp.einsum("bckw,wl->bckl", y, Fm.T.copy())
        y = FB * y
        y = jnp.einsum("km,bcmw->bckw", Fi, y)
        y = jnp.einsum("bckw,wl->bckl", y, Fi.T.copy())
        return y.real.astype(jnp.float32)
    results["dftmm_us"] = time_variant("dftmm", dftmm_leg)

    # correctness cross-check (single application, vs fft leg; jitted — eager
    # complex FFT is broken on the axon backend)
    ref = jax.jit(fft_leg)(u0)
    for nm, fn in [("rfft", rfft_leg), ("conv", conv_leg), ("sep", sep_leg),
                   ("dftmm", dftmm_leg)]:
        err = float(jax.jit(lambda u: jnp.max(jnp.abs(fn(u) - ref))
                    / jnp.max(jnp.abs(ref)))(u0))
        results[f"relerr_{nm}"] = err
        log(f"relerr {nm}: {err:.2e}")

    out = os.environ.get("FC_OUT", "docs/bench/fft_vs_conv.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
