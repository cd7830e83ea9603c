#!/usr/bin/env python
"""Self-sensitivity of the REFERENCE covariance model: drive two identical
complex128 reference states (CovarianceHessianBFGSDCT, 256px, real
dct_diagonal prior) through the same interleaved time/space schedule whose
space-pair mean inputs differ by a relative ~1e-4 — the f32 cross-framework
UNet parity level — and measure how fast their Sigma_0 @ probe diverge.

If the reference self-diverges at the same ~3x/step compounding observed in
the 256px teacher-forced A/B (docs/ab_reference_256_dct.json), then the A/B
covariance drift is intrinsic BFGS-recursion sensitivity to input precision
(each appended column feeds back through S@dx into all later columns), not
an implementation divergence: ANY two implementations whose denoiser
outputs differ at the f32 level drift identically — including the reference
against itself.

Writes docs/diag_bfgs_compounding.json.
"""
import copy
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from ab_reference_pipeline import install_reference_stubs  # noqa: E402


def main():
    import torch
    install_reference_stubs()
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        run(torch)
    finally:
        os.chdir(cwd)


def run(torch):
    import conditioning_utils.online_update_bfgs as oub

    res = 256
    d = 3 * res * res
    idx = np.arange(30, dtype=np.float64)
    sig = (80 ** (1 / 7) + idx / 29 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    sigma0 = float(sig[0])

    def make():
        return oub.CovarianceHessianBFGSDCT(
            data_dir="data/imagenet/", init_noise_variance=sigma0**2,
            data_dim=d, use_precalculated_info=True)

    a, b = make(), make()
    rng = np.random.default_rng(0)
    probe = torch.from_numpy(rng.normal(size=(1, 3, res, res)))

    eps = 1e-4
    rows = []
    for i in range(len(sig) - 1):
        s_prev, s = float(sig[i]), float(sig[i + 1])
        x = torch.from_numpy(rng.normal(size=(1, 3, res, res)) * s)
        score = torch.from_numpy(rng.normal(size=(1, 3, res, res)) / s)
        a.update_time_step(x, torch.tensor(s_prev), torch.tensor(s), score)
        b.update_time_step(x, torch.tensor(s_prev), torch.tensor(s), score)
        if 1.0 < s < 10.0:
            xn = x + torch.from_numpy(rng.normal(size=x.shape) * 0.1 * s)
            mean_a1 = torch.from_numpy(rng.uniform(-1, 1, size=x.shape))
            mean_a2 = mean_a1 + torch.from_numpy(
                rng.normal(size=x.shape) * 1e-3)
            # twin b sees the SAME pair perturbed at the f32 parity level
            noise1 = torch.from_numpy(rng.normal(size=x.shape) * eps)
            noise2 = torch.from_numpy(rng.normal(size=x.shape) * eps)
            a.update_space_step(mean_a1, mean_a2, torch.tensor(s), x, xn)
            b.update_space_step(mean_a1 + noise1, mean_a2 + noise2,
                                torch.tensor(s), x, xn)
        va = a.denoiser_cov_vector_dot(probe).detach().numpy()
        vb = b.denoiser_cov_vector_dot(probe).detach().numpy()
        rel = float(np.abs(va - vb).max() / max(np.abs(va).max(), 1e-300))
        rows.append(dict(step=i, sigma=s, cov_probe_rel_div=rel))
        print(f"step {i:2d} sigma={s:9.4f} ref-self-divergence={rel:.3e}",
              flush=True)

    with open(os.path.join(REPO, "docs", "diag_bfgs_compounding.json"), "w") as f:
        json.dump(dict(
            note="reference (complex128) vs itself with space-pair means "
                 "perturbed by rel ~1e-4 (the f32 cross-framework UNet "
                 "parity level); mean-diff signal 1e-3 per pair",
            pair_mean_noise=eps, rows=rows,
            max_divergence=max(r["cov_probe_rel_div"] for r in rows)),
            f, indent=2)
    print("max:", max(r["cov_probe_rel_div"] for r in rows))


if __name__ == "__main__":
    main()
