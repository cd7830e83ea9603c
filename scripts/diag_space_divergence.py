#!/usr/bin/env python
"""Isolate the 256px real-prior covariance divergence at the first BFGS
space update (seen in docs/ab_reference_256_dct_f64_sharednet.json: state
parity ~2e-6 through calls 1-21, then 0.95 at call 22).

Protocol: both covariance models (ours f64, reference complex128) start from
the REAL dct_diagonal prior at 256px, run the identical time-update sigma
schedule (80.29 -> 9.41, no space updates — mirrors the A/B's call 1-21
regime), then perform ONE space update from bitwise-shared synthetic
(x, x', net mean m2) — exactly the teacher-forced situation. Three probes:

  A. transported-mean agreement: ours telescoped (I + a Sigma)^-1 vs the
     reference's two-inverse H(s')H(s)^-1 (online_update_bfgs.py:153-192)
  B. state agreement after the space update when each side consumes ITS OWN
     transported mean (what the A/B measures)
  C. state agreement when BOTH sides consume the SAME (our) transported mean
     — if C is at the floor while B is not, the divergence is entirely the
     transport formula's conditioning, not the BFGS update itself.

Writes docs/diag_space_divergence.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from tests._reference_oracle import install_reference_stubs  # noqa: E402


def main():
    install_reference_stubs()
    import jax
    # the axon TPU plugin claims the backend regardless of JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    import conditioning_utils.online_update_bfgs as oub

    from free_hunch_tpu.guidance import covariance as cov_mod
    from free_hunch_tpu.ops.dct import dct_2d, idct_2d

    res, d = 256, 3 * 256 * 256
    rng = np.random.default_rng(0)

    # --- reference model with the real prior ---
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        ref = oub.CovarianceHessianBFGSDCT(
            data_dir="data/imagenet/", init_noise_variance=80.2878**2,
            data_dim=d, max_vector_count=100000,
            use_precalculated_info=True)
    finally:
        os.chdir(cwd)

    # --- ours with the same prior, f64 algebra ---
    prior = np.asarray(ref.dct_variance.reshape(-1), np.float64)[:d]
    cov = cov_mod.init_state(jnp.asarray(prior, jnp.float64), d, capacity=8)

    # sigma schedule matching the A/B's call sigmas (edm, 30 steps) down to
    # the first in-window value
    sigmas = [80.2878, 67.2696, 56.0605, 46.4969, 38.4053, 31.6111, 25.7360,
              20.8137, 16.7234, 13.3437, 10.5737, 9.4126]
    # FULL time updates (the real mechanism flow, conditioning_mechanisms.py
    # :244, runs the hessian/inv-hessian evolution at every sigma change;
    # only_covariance=True would leave the reference's inv_hessian stale at
    # sigma_0 and corrupt the next transport)
    for s, sn in zip(sigmas[:-2], sigmas[1:-1]):
        cov = cov_mod.time_update(cov, s, sn)
        ref.update_time_step_(
            torch.zeros(1, 3, res, res), s, sn,
            torch.zeros(1, 3, res, res), only_covariance=False)

    probe = jnp.asarray(rng.normal(size=(1, 3, res, res)), jnp.float32)

    def ours_matvec(c, v):
        vb = dct_2d(v).reshape(1, -1).astype(jnp.float64)
        out = cov_mod.cov_matvec(c, vb[0])
        return np.asarray(idct_2d(out.reshape(1, 3, res, res)
                                  .astype(jnp.float32)))

    def ref_matvec(v):
        return ref.denoiser_cov_vector_dot(
            torch.from_numpy(np.asarray(v))).detach().numpy()

    def state_rel():
        got, want = ours_matvec(cov_now, probe), ref_matvec(probe)
        return float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-12))

    cov_now = cov
    out = {"after_time_updates_state_rel": None}
    out["after_time_updates_state_rel"] = state_rel()

    # --- shared synthetic teacher inputs at sigma_prev -> sigma ---
    s_prev, s = sigmas[-2], sigmas[-1]
    x_prev = rng.normal(size=(1, 3, res, res)).astype(np.float32) * s_prev
    x_next = (x_prev + 0.3 * rng.normal(size=x_prev.shape)).astype(np.float32)
    m1 = rng.uniform(-1, 1, x_prev.shape).astype(np.float32)   # net mean at x_prev
    m2 = (m1 + 0.05 * rng.normal(size=x_prev.shape)).astype(np.float32)

    # A. transported means
    xb = dct_2d(jnp.asarray(x_prev)).reshape(1, -1).astype(jnp.float64)
    mb = dct_2d(jnp.asarray(m1)).reshape(1, -1).astype(jnp.float64)
    score_b = (mb - xb) / s_prev**2
    cov2 = cov_mod.time_update(cov, s_prev, s)
    mean_t_b, _ = cov_mod.transport_score(cov, cov2, s_prev, s,
                                          xb[0], score_b[0])
    ours_mean_t = np.asarray(idct_2d(
        mean_t_b.reshape(1, 3, res, res).astype(jnp.float32)))

    import copy
    twin = copy.deepcopy(ref)
    score_px = (m1 - x_prev) / s_prev**2
    ref_mean_t, _ = twin.update_time_step(
        torch.from_numpy(x_prev), s_prev, s, torch.from_numpy(score_px))
    ref_mean_t = ref_mean_t.detach().numpy()
    # scalar-exact oracle: with a diagonal state the transport per DCT
    # coefficient is mean'_i = x_i + s^2 score_i / (1 + a p_i), p_i evolved
    # by the exact inverse-shift chain — adjudicates which side is right
    p_i = prior.copy()
    for aa_, bb_ in zip(sigmas[:-2], sigmas[1:-1]):
        p_i = 1.0 / (1.0 / p_i + (1.0 / bb_**2 - 1.0 / aa_**2))
    a_c = 1.0 / s**2 - 1.0 / s_prev**2
    xb64 = np.asarray(xb[0], np.float64)
    sb64 = np.asarray(score_b[0], np.float64)
    oracle_b = xb64 + s_prev**2 * sb64 / (1.0 + a_c * p_i)
    oracle_px = np.asarray(idct_2d(jnp.asarray(
        oracle_b.reshape(1, 3, res, res), jnp.float64)), np.float64)
    scale_m = float(max(np.abs(ref_mean_t).max(), 1e-12))
    scale_o = float(max(np.abs(oracle_px).max(), 1e-12))
    out["transport"] = dict(
        sigma_prev=s_prev, sigma=s,
        ref_absmax=float(np.abs(ref_mean_t).max()),
        ours_absmax=float(np.abs(ours_mean_t).max()),
        oracle_absmax=float(np.abs(oracle_px).max()),
        rel_diff=float(np.abs(ours_mean_t - ref_mean_t).max() / scale_m),
        ours_vs_oracle=float(np.abs(ours_mean_t - oracle_px).max() / scale_o),
        ref_vs_oracle=float(np.abs(ref_mean_t - oracle_px).max() / scale_o))

    # advance both models' time state to sigma s (the space update operates
    # on the time-updated state)
    cov_s = cov2
    ref.update_time_step_(torch.zeros(1, 3, res, res), s_prev, s,
                          torch.zeros(1, 3, res, res), only_covariance=False)

    # B. space update, each side its own transported mean
    params = cov_mod.CovParams(project_to_diagonal=False,
                               curvature_guard=False)

    def ours_space(c, mean_at_x_px):
        return cov_mod.space_update(
            c, s,
            dct_2d(jnp.asarray(x_prev)).reshape(-1).astype(jnp.float64),
            dct_2d(jnp.asarray(x_next)).reshape(-1).astype(jnp.float64),
            dct_2d(jnp.asarray(mean_at_x_px)).reshape(-1).astype(jnp.float64),
            dct_2d(jnp.asarray(m2)).reshape(-1).astype(jnp.float64),
            params)

    cov_b = ours_space(cov_s, ours_mean_t)
    ref_b = copy.deepcopy(ref)
    ref_b.update_space_step(torch.from_numpy(ref_mean_t),
                            torch.from_numpy(m2), s,
                            torch.from_numpy(x_prev),
                            torch.from_numpy(x_next))
    cov_now, ref_probe = cov_b, ref_b

    def rel_against(c, r):
        got = ours_matvec(c, probe)
        want = r.denoiser_cov_vector_dot(
            torch.from_numpy(np.asarray(probe))).detach().numpy()
        return float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-12))

    out["B_own_transport_state_rel"] = rel_against(cov_b, ref_b)

    # C. space update, both sides the SAME (our) transported mean
    cov_c = ours_space(cov_s, ours_mean_t)
    ref_c = copy.deepcopy(ref)
    ref_c.update_space_step(torch.from_numpy(ours_mean_t),
                            torch.from_numpy(m2), s,
                            torch.from_numpy(x_prev),
                            torch.from_numpy(x_next))
    out["C_shared_transport_state_rel"] = rel_against(cov_c, ref_c)

    # breakdown of the BFGS pair scalars under both transported means
    def pair_scalars(mean_at_x):
        dxp = dct_2d(jnp.asarray(x_next - x_prev)).reshape(-1).astype(jnp.float64)
        dep = (s**2 * dct_2d(jnp.asarray(m2 - mean_at_x))
               .reshape(-1).astype(jnp.float64))
        sv = cov_mod.cov_matvec(cov_s, dxp)
        return dict(dx_de=float(jnp.sum(dxp * dep)),
                    dx_S_dx=float(jnp.sum(dxp * sv)),
                    de_absmax=float(jnp.abs(dep).max()))

    out["pair_with_ours_transport"] = pair_scalars(ours_mean_t)
    out["pair_with_ref_transport"] = pair_scalars(ref_mean_t)

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs",
            "diag_space_divergence.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
