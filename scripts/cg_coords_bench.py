#!/usr/bin/env python
"""Per-iteration device cost of the two deblur CG coordinate systems.

Times `deblur_mat_cg` (pixel coordinates, 6 complex FFT2s/iter) against
`deblur_mat_cg_fourier` (weighted rfft2 coordinates, one real FFT
round-trip/iter) at the production shape with the production covariance
matvec (DCT matmuls + low-rank K=34 factor dots), forcing an identical fixed
iteration count per solve (min_iter = maxiter, stall detection off) so the
measurement is pure per-iteration cost, not decision-sequence drift.

Writes docs/bench/cg_coords_bench.json.
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

    import free_hunch_tpu.guidance.solvers as S
    from free_hunch_tpu.guidance import covariance as cov_mod
    from free_hunch_tpu.ops.dct import dct_2d, idct_2d
    from free_hunch_tpu.operators import get_operator

    B, C, H, W = (int(os.environ.get("CB_BATCH", 8)), 3,
                  int(os.environ.get("CB_RES", 256)),
                  int(os.environ.get("CB_RES", 256)))
    K = int(os.environ.get("CB_COVK", 34))
    NIT = int(os.environ.get("CB_NITER", 25))
    REPS = int(os.environ.get("CB_REPS", 20))
    d = C * H * W

    rng = np.random.default_rng(0)
    op = get_operator(name="gaussian_blur", in_shape=(1, C, H, W),
                      sigma_s=0.1, kernel_size=61, intensity=3.0)

    # production-like covariance state: dct prior diag + K active columns
    diag = jnp.asarray(rng.uniform(0.01, 10.0, (d,)), jnp.float32)
    cov1 = cov_mod.init_state(diag, d, K)
    cov = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), cov1)
    Ut = jnp.asarray(rng.normal(size=(B, K, d)) / np.sqrt(d), jnp.float32)
    M = jnp.broadcast_to(jnp.eye(K, dtype=jnp.float32) * 0.5, (B, K, K)).copy()
    cov = cov._replace(Ut=Ut, M=M, k=jnp.full((B,), K, jnp.int32))

    def cov_mv(v):
        vb = dct_2d(v).reshape(B, -1)
        out = jax.vmap(cov_mod.cov_matvec)(cov, vb)
        return idct_2d(out.reshape(B, C, H, W))

    x0 = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.float32)
    spec = jnp.asarray(rng.uniform(0.01, 10.0, (B, C, H, W)), jnp.float32)

    kw = dict(cov_mv=cov_mv, rtol=0.0, maxiter=NIT, min_iter=NIT,
              stall_iters=10**6, warm_start=True, precondition=True,
              cov_fourier_spec=spec, return_info=True, track_best=True)

    results = {"shape": [B, C, H, W], "K": K, "niter": NIT, "reps": REPS}
    for name, fn in (("pixel", S.deblur_mat_cg),
                     ("fourier", S.deblur_mat_cg_fourier)):
        run = jax.jit(lambda y_, x_, fn=fn: fn(op, y_, x_, **kw))
        mat, info = run(y, x0)
        jax.block_until_ready(mat)
        t0 = time.perf_counter()
        for _ in range(REPS):
            mat, info = run(y, x0)
        jax.block_until_ready(mat)
        dt = (time.perf_counter() - t0) / REPS
        per_it = dt / NIT * 1e3
        results[name] = {"solve_ms": dt * 1e3, "per_iter_ms": per_it,
                         "niter": int(np.max(np.asarray(info.niter)))}
        log(f"{name}: {dt*1e3:.2f} ms/solve, {per_it:.3f} ms/iter")

    results["fourier_over_pixel"] = (results["fourier"]["per_iter_ms"]
                                     / results["pixel"]["per_iter_ms"])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "bench", "cg_coords_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
