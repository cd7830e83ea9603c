"""Schedule-derived ("auto") low-rank capacity for the Free Hunch state.

The covariance rank only grows via BFGS space updates — 2 columns per
guidance call whose sigma lies inside the space-update window (reference
``online_update_bfgs.py:250-257``) — and the schedule is host data, so the
exact capacity is static. These tests pin (i) the count itself against the
gate in ``guidance/mechanisms.py`` and (ii) that a tight capacity produces
the same results as an oversized one (inactive columns are exact zeros in
every matvec / update).
"""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.guidance import choose_conditioning_mechanism
from free_hunch_tpu.samplers.edm import prepare_schedule, required_cov_capacity

RES = 16


def _schedule(num_steps=30, solver="heun"):
    return prepare_schedule(round_sigma=lambda s: s, net_sigma_min=0.002,
                            net_sigma_max=80.0, num_steps=num_steps,
                            solver=solver, discretization="edm",
                            schedule="linear", scaling="none")


def test_count_matches_window_gate():
    xs, _ = _schedule()
    for lower, upper in [(1.0, 10.0), (0.3, 8.0), (0.01, 1e9)]:
        sig = np.concatenate([xs["sigma_hat"],
                              xs["sigma_prime"][np.asarray(xs["use_heun"], bool)]])
        want = 2 * int(np.sum((sig > lower) & (sig < upper))) + 2
        assert required_cov_capacity(xs, lower, upper) == max(want, 2)
    # the bench protocol: 30-step edm linear, default (1, 10) window
    cap = required_cov_capacity(xs)
    assert cap < 4 * 30  # strictly smaller than the old worst-case default
    assert cap >= 2


def test_no_space_updates_gives_minimum():
    xs, _ = _schedule(num_steps=8)
    assert required_cov_capacity(xs, do_space_updates=False) == 2


def test_tight_capacity_matches_oversized():
    """Same guidance outputs and the same active column count whether the
    capacity is exact or 4x oversized. Inactive columns are exact zeros in
    every (K, d) matvec, but the k x k inner solves (Woodbury inv) run at
    the full K x K shape, so LU rounding differs at ~eps between capacities
    and the BFGS recursion amplifies it over calls (the same measured chaos
    as docs/diag_bfgs_compounding.json). The algebra runs in f64 so the
    capacity-equivalence is tested sharply instead of chaos-limited (at f32
    the graded tolerances had to absorb whatever amplification the current
    dot layouts produce): in f64 the two capacities are bitwise identical on
    a single CPU device; under the suite's forced 8-device host platform,
    XLA's per-shape codegen differs enough to flip ONE f32 ulp in the f32
    stages (denoiser eval / final cast), with no growth across calls —
    hence the few-ulp tolerance on the later calls."""
    op_mask = (np.random.default_rng(0).uniform(size=(RES, RES)) > 0.3
               ).astype(np.float32)
    from free_hunch_tpu.operators import get_operator
    op = get_operator(name="inpainting", sigma_s=0.05,
                      mask=np.broadcast_to(op_mask, (1, 3, RES, RES)).copy(),
                      in_shape=(1, 3, RES, RES))
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.uniform(-1, 1, (2, 3, RES, RES)), jnp.float32)
    y = op.forward(cond, noiseless=True)

    def fake_denoise(x, s):
        # smooth deterministic stand-in with a non-trivial Jacobian
        return jnp.tanh(x) * 0.9, None

    def run(capacity):
        mech = choose_conditioning_mechanism("online_covariance")(
            cond_scaling=1.0, forward_operator=op, clip_x0_mean=False,
            init_denoiser_variance=1.0, init_noise_variance=4.0,
            data_dim=3 * RES * RES, cov_capacity=capacity, cg_maxiter=25,
            space_step_update_lower_threshold=0.0,
            space_step_update_threshold=1e9, algebra_dtype="float64")
        state = mech.init_state(2, (3, RES, RES))
        outs = []
        x = jnp.asarray(rng.normal(size=(2, 3, RES, RES)), jnp.float32) * 2.0
        x = jax.device_get(x)  # freeze the driving point across runs
        for sigma, dx in [(2.0, 0.0), (2.0, 0.1), (1.2, 0.2), (0.7, 0.3)]:
            xt = jnp.asarray(x + dx, jnp.float32)
            out, state = mech(fake_denoise, xt, y, sigma, state)
            outs.append(np.asarray(out))
        return outs, int(state.cov.k[0])

    rng_state = rng.bit_generator.state
    outs_small, k_small = run(8)   # exact: 3 space updates -> 6 cols (+2)
    rng.bit_generator.state = rng_state  # same driving noise
    outs_big, k_big = run(32)
    assert k_small == k_big == 6
    # f64 algebra: capacity-independent to the f32-ulp codegen floor (see
    # docstring); 2.5e-7 ~ 2 ulps at the O(1) output scale
    for (a, b), tol in zip(zip(outs_small, outs_big),
                           (1e-12, 1e-12, 2.5e-7, 2.5e-7)):
        scale = np.abs(b).max()
        assert np.abs(a - b).max() <= tol * scale, \
            f"capacity-dependence {np.abs(a - b).max():.3e} > {tol:.0e}*{scale:.3f}"
