#!/usr/bin/env python
"""Precision isolation: run OUR low-rank covariance updates at 256px scale
(real dct_diagonal prior, d=196,608) in f32 and f64 with identical inputs
and measure the divergence of Sigma_0 @ probe over an interleaved
time/space-update schedule.

If f32-vs-f64 of the SAME code reproduces the covariance drift seen in the
256px reference A/B, the drift is inner-algebra precision (the k x k
Woodbury on matrices whose entries span the prior's ~8 decades), not an
algorithmic divergence — and any conditioning fix can be validated by
re-running this script. CPU-only (x64 via jax config).

Writes docs/diag_inner_precision.json.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from free_hunch_tpu.guidance import covariance as C  # noqa: E402
from free_hunch_tpu.operators.assets import dct_variance  # noqa: E402


def run(dtype):
    d = 3 * 256 * 256
    prior = jnp.asarray(dct_variance("imagenet").reshape(-1), dtype)
    cov = C.init_state(prior, d, capacity=64)

    # the 30-step EDM sigma ladder (sigma_hat values)
    idx = np.arange(30, dtype=np.float64)
    sig = (80 ** (1 / 7) + idx / 29 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7

    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.normal(size=(d,)), dtype)
    outs = []
    for i in range(len(sig) - 1):
        s_prev, s = float(sig[i]), float(sig[i + 1])
        cov2 = C.time_update(cov, s_prev, s)
        # synthetic but realistic space pair inside the (1, 10) window:
        # dx ~ the Heun corrector displacement, de ~ sigma^2 * mean diff
        if 1.0 < s < 10.0:
            x = jnp.asarray(rng.normal(size=(d,)) * s, dtype)
            dxv = jnp.asarray(rng.normal(size=(d,)) * 0.1 * s, dtype)
            mean_a = jnp.asarray(rng.uniform(-1, 1, size=(d,)), dtype)
            mean_b = mean_a + jnp.asarray(rng.normal(size=(d,)) * 0.05, dtype)
            cov2 = C.space_update(cov2, s, x, x + dxv, mean_a, mean_b)
        cov = cov2
        mv = np.asarray(C.cov_matvec(cov, probe), np.float64)
        outs.append(mv)
    return outs, int(cov.k)


def main():
    f32, k32 = run(jnp.float32)
    f64, k64 = run(jnp.float64)
    rows = []
    for i, (a, b) in enumerate(zip(f32, f64)):
        rel = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-300))
        rows.append(dict(step=i, rel_err_f32_vs_f64=rel))
        print(f"step {i:2d} rel_err={rel:.3e}", flush=True)
    out = dict(note="Sigma_0 @ probe divergence of our own low-rank updates, "
                    "f32 vs f64, real 256px dct prior, interleaved "
                    "time/space schedule", k_final=[k32, k64], rows=rows,
               max_rel_err=float(max(r["rel_err_f32_vs_f64"] for r in rows)))
    with open(os.path.join(REPO, "docs", "diag_inner_precision.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("max rel err:", out["max_rel_err"])


if __name__ == "__main__":
    main()
