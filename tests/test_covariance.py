"""Equivalence of the factored covariance updates vs dense reference math.

Mirrors the semantics of the reference's ``conditioning_utils/
online_update_tests.py`` (time update, time+rank structure, sequential BFGS,
interleaved schedule) with hard tolerances, against the dense update rules of
``online_update_bfgs.py:377-463``.
"""
import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.guidance import covariance as C
from free_hunch_tpu.ops import lowrank

D = 12
K = 32


def _dense_init(var, nv, d):
    cov = np.eye(d) * var
    inv_cov = np.linalg.inv(cov)
    hess = (cov / nv - np.eye(d)) / nv
    inv_hess = np.linalg.inv(hess)
    return cov, inv_cov, hess, inv_hess


def test_time_update_matches_dense():
    var, sigma = 1.0, 2.0
    state = C.init_state(jnp.asarray(var, jnp.float64), D, K)
    cov, inv_cov, hess, inv_hess = _dense_init(var, sigma**2, D)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=D))
    score = jnp.asarray(rng.normal(size=D))

    sigma_next = 1.3
    new_state = C.time_update(state, sigma, sigma_next)
    mean2, score2 = C.transport_score(state, new_state, sigma, sigma_next, x, score)

    dcov, dinv, dhess, dinvh, dscore, dmean = C.dense_time_update(
        jnp.asarray(cov), jnp.asarray(inv_cov), jnp.asarray(hess), jnp.asarray(inv_hess),
        score, x, sigma, sigma_next)

    np.testing.assert_allclose(lowrank.dense(new_state), dcov, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(score2, dscore, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(mean2, dmean, rtol=1e-9, atol=1e-11)
    # derived hessian / inverses consistent with the dense chain
    np.testing.assert_allclose(lowrank.dense(C.hessian(new_state, sigma_next)),
                               dhess, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        lowrank.dense(lowrank.inverse(C.hessian(new_state, sigma_next))),
        dinvh, rtol=1e-7, atol=1e-9)


def test_space_update_matches_dense():
    var, sigma = 0.8, 1.7
    state = C.init_state(jnp.asarray(var, jnp.float64), D, K)
    cov, inv_cov, _, _ = _dense_init(var, sigma**2, D)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=D))
    dx = jnp.asarray(rng.normal(size=D) * 0.1)
    mean_x = jnp.asarray(rng.normal(size=D))
    # keep dx^T de positive-ish as in real trajectories
    mean_xn = mean_x + 0.3 * dx + 0.02 * jnp.asarray(rng.normal(size=D))

    new_state = C.space_update(state, sigma, x, x + dx, mean_x, mean_xn)
    dcov, dinv, dhess, _ = C.dense_space_update(
        jnp.asarray(cov), jnp.asarray(inv_cov), sigma, x, dx, mean_x, mean_xn)

    np.testing.assert_allclose(lowrank.dense(new_state), dcov, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(lowrank.dense(lowrank.inverse(new_state)), dinv,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(lowrank.dense(C.hessian(new_state, sigma)), dhess,
                               rtol=1e-8, atol=1e-10)


def test_interleaved_schedule_matches_dense():
    """25 interleaved time+space rounds (reference online_update_tests.py:274)."""
    var = 1.0
    sigmas = np.geomspace(10.0, 0.5, 26)
    # 25 space updates append 50 columns; use a capacity that holds them all
    # so no eviction happens and the dense chain is followed exactly.
    state = C.init_state(jnp.asarray(var, jnp.float64), D, 64)
    cov, inv_cov, hess, inv_hess = _dense_init(var, sigmas[0]**2, D)
    cov, inv_cov, hess, inv_hess = map(jnp.asarray, (cov, inv_cov, hess, inv_hess))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=D))
    score = jnp.asarray(rng.normal(size=D))

    for i in range(25):
        s, sn = sigmas[i], sigmas[i + 1]
        new_state = C.time_update(state, s, sn)
        mean2, score2 = C.transport_score(state, new_state, s, sn, x, score)
        cov, inv_cov, hess, inv_hess, dscore, dmean = C.dense_time_update(
            cov, inv_cov, hess, inv_hess, score, x, s, sn)
        np.testing.assert_allclose(score2, dscore, rtol=1e-6, atol=1e-8)
        state, score = new_state, score2

        dx = jnp.asarray(rng.normal(size=D) * 0.05)
        mean_x = mean2
        mean_xn = mean_x + 0.2 * dx + 0.01 * jnp.asarray(rng.normal(size=D))
        state = C.space_update(state, sn, x, x + dx, mean_x, mean_xn)
        cov, inv_cov, hess, inv_hess = C.dense_space_update(
            cov, inv_cov, sn, x, dx, mean_x, mean_xn)
        np.testing.assert_allclose(lowrank.dense(state), cov, rtol=1e-5, atol=1e-7)
        x = x + dx
        score = jnp.asarray(rng.normal(size=D))  # fresh score, as from a new net eval

    # inverses stay consistent at the end of the schedule
    np.testing.assert_allclose(lowrank.dense(lowrank.inverse(state)),
                               np.linalg.inv(np.asarray(cov)), rtol=1e-4, atol=1e-6)


def test_project_to_diagonal():
    var, sigma = 1.0, 2.0
    state = C.init_state(jnp.asarray(var, jnp.float64), D, K)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=D))
    dx = jnp.asarray(rng.normal(size=D) * 0.1)
    mean_x = jnp.asarray(rng.normal(size=D))
    mean_xn = mean_x + 0.3 * dx
    out = C.space_update(state, sigma, x, x + dx, mean_x, mean_xn,
                         C.CovParams(project_to_diagonal=True))
    assert int(out.k) == 0
    de = sigma**2 * (mean_xn - mean_x)
    sv = var * dx
    expect = (np.full(D, var) + np.asarray(de) ** 2 / float(dx @ de)
              - np.asarray(sv) ** 2 / float(dx @ sv))
    np.testing.assert_allclose(out.diag, expect, rtol=1e-9)


def test_float32_precision_is_adequate():
    """The production dtype is f32: run the interleaved schedule in f32 and
    check the covariance stays within solver-relevant accuracy of the f64
    dense oracle (the CG solve only needs a few digits)."""
    var = 1.0
    sigmas = np.geomspace(8.0, 1.0, 13)
    state = C.init_state(jnp.asarray(var, jnp.float32), D, K)
    cov = jnp.asarray(np.eye(D) * var)
    inv_cov = jnp.linalg.inv(cov)

    rng = np.random.default_rng(4)
    x64 = jnp.asarray(rng.normal(size=D))
    for i in range(12):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        state = C.time_update(state, s, sn)
        eye = jnp.eye(D)
        inv_cov = inv_cov + (sn**-2 - s**-2) * eye
        cov = jnp.linalg.inv(inv_cov)

        dx = jnp.asarray(rng.normal(size=D) * 0.05)
        mean_x = jnp.asarray(rng.normal(size=D))
        mean_xn = mean_x + 0.2 * dx + 0.01 * jnp.asarray(rng.normal(size=D))
        state = C.space_update(state, sn, x64.astype(jnp.float32), (x64 + dx).astype(jnp.float32),
                               mean_x.astype(jnp.float32), mean_xn.astype(jnp.float32))
        cov, inv_cov, _, _ = C.dense_space_update(cov, inv_cov, sn, x64, dx, mean_x, mean_xn)
        x64 = x64 + dx

    got = np.asarray(lowrank.dense(state), np.float64)
    ref = np.asarray(cov)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-4, f"f32 covariance drifted: rel err {rel:.2e}"


def test_batched_updates_vmap():
    state = jax.vmap(lambda _: C.init_state(jnp.asarray(1.0, jnp.float32), D, K))(
        jnp.arange(3))
    out = jax.jit(jax.vmap(lambda st: C.time_update(st, 2.0, 1.5)))(state)
    assert out.Ut.shape == (3, K, D)


def test_transport_stable_at_hessian_singularity():
    """The analytic transport H(s')H(s)^-1 is evaluated via the telescoped
    closed form (s^2/s'^2)(I + a Sigma)^-1, which cancels the (p - s^2)
    singularity the reference's two-inverse product hits whenever a prior
    eigenvalue crosses s^2 (inevitable with the dct_diagonal prior). This
    test plants eigenvalues ON and NEAR the crossing and checks the f32
    result against an f64 oracle evaluated away from the removable
    singularity via the same closed form, plus the naive dense product where
    it is still computable."""
    import numpy as np

    from free_hunch_tpu.guidance import covariance as C
    from free_hunch_tpu.ops import lowrank

    sigma, sigma_next = 4.0, 3.0
    d = 8
    # eigenvalues straddling sigma^2 = 16: exactly on it, 1e-5 off it, far
    diag = np.array([16.0, 16.0 * (1 + 1e-5), 16.0 * (1 - 1e-5),
                     1e-4, 1e-2, 1.0, 1e2, 1e4], np.float64)
    x = np.linspace(-1, 1, d)
    score = np.linspace(0.5, -0.5, d)

    # f64 oracle via the closed form
    a = 1.0 / sigma_next**2 - 1.0 / sigma**2
    want_score = (sigma**2 / sigma_next**2) * score / (1.0 + a * diag)
    want_mean = x + sigma_next**2 * want_score

    # naive dense product f64 (computable here away from exact-crossing rows)
    H = (diag - sigma**2) / sigma**4
    ok = np.abs(H) > 1e-12
    naive = np.zeros_like(score)
    Hn = (1.0 / (1.0 / diag[ok] + a) - sigma_next**2) / sigma_next**4
    naive[ok] = Hn * (score[ok] / H[ok])
    np.testing.assert_allclose(
        (sigma**2 / sigma_next**2) * score[ok] / (1 + a * diag[ok]),
        naive[ok], rtol=1e-6)  # closed form == naive product off-singularity

    # f32 low-rank implementation
    cov = C.init_state(jnp.asarray(diag, jnp.float32), d, capacity=4)
    cov2 = C.time_update(cov, sigma, sigma_next)
    mean32, score32 = C.transport_score(cov, cov2, sigma, sigma_next,
                                        jnp.asarray(x, jnp.float32),
                                        jnp.asarray(score, jnp.float32))
    np.testing.assert_allclose(np.asarray(score32), want_score, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean32), want_mean, rtol=2e-5,
                               atol=1e-5)
    assert np.isfinite(np.asarray(score32)).all()

    # with a low-rank part straddling the crossing too
    u = np.zeros((d,), np.float32)
    u[0] = 1.0
    cov_lr = lowrank.append_pair(cov, jnp.asarray(u), 0.5,
                                 jnp.asarray(u[::-1].copy()), 0.25)
    cov_lr2 = C.time_update(cov_lr, sigma, sigma_next)
    m_lr, s_lr = C.transport_score(cov_lr, cov_lr2, sigma, sigma_next,
                                   jnp.asarray(x, jnp.float32),
                                   jnp.asarray(score, jnp.float32))
    assert np.isfinite(np.asarray(s_lr)).all()
    # f64 dense oracle for the low-rank case via the closed form
    Sig = np.diag(diag).astype(np.float64)
    Sig[0, 0] += 0.5
    Sig += 0.25 * np.outer(u[::-1], u[::-1])
    op = np.linalg.inv(np.eye(d) + a * Sig) * (sigma**2 / sigma_next**2)
    np.testing.assert_allclose(np.asarray(s_lr), op @ score, rtol=1e-4,
                               atol=1e-5)


def test_two_inverse_transport_matches_telescoped_away_from_singularity():
    """``transport_score_two_inverse`` (the reference's literal H(s')H(s)^-1
    evaluation, online_update_bfgs.py:170-181, kept for bit-level A/B) must
    agree with the production telescoped form wherever the two-inverse
    product is well-conditioned, including with a low-rank part."""
    sigma, sigma_next = 4.0, 3.0
    d = 8
    rng = np.random.default_rng(7)
    # eigenvalues well away from the sigma^2 = 16 crossing
    diag = np.array([1e-3, 1e-2, 0.5, 1.0, 2.0, 64.0, 1e3, 1e4], np.float64)
    x = jnp.asarray(rng.normal(size=d))
    score = jnp.asarray(rng.normal(size=d))

    cov = C.init_state(jnp.asarray(diag), d, capacity=4)
    u = jnp.asarray(rng.normal(size=d) * 0.1)
    cov = lowrank.append_pair(cov, u, 0.5, jnp.asarray(rng.normal(size=d) * 0.1),
                              0.25)
    cov2 = C.time_update(cov, sigma, sigma_next)

    m_tel, s_tel = C.transport_score(cov, cov2, sigma, sigma_next, x, score)
    m_two, s_two = C.transport_score_two_inverse(cov, cov2, sigma, sigma_next,
                                                 x, score)
    np.testing.assert_allclose(np.asarray(s_two), np.asarray(s_tel),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(m_two), np.asarray(m_tel),
                               rtol=1e-8, atol=1e-10)


def test_two_inverse_transport_loses_digits_at_crossing():
    """With prior eigenvalues near the H(s) singularity p = sigma^2 AND a
    low-rank part touching those rows (the situation every space update
    creates with the real dct prior), the two-inverse product loses digits
    through the near-singular Woodbury inner solves while the telescoped
    form stays exact — the measured root cause of the 256px real-prior A/B
    state divergence (docs/diag_space_divergence.json)."""
    sigma, sigma_next = 4.0, 3.0
    d = 6
    rng = np.random.default_rng(3)
    diag = np.array([16.0 * (1 + 1e-7), 16.0 * (1 - 3e-7), 1e-2, 1.0,
                     1e2, 1e4], np.float64)
    u = np.zeros(d)
    u[0], u[1], u[2] = 1.0, 0.5, 0.1
    v = np.zeros(d)
    v[1], v[0], v[3] = 1.0, -0.3, 0.2
    cov = C.init_state(jnp.asarray(diag), d, capacity=4)
    cov = lowrank.append_pair(cov, jnp.asarray(u), 0.37, jnp.asarray(v), 0.21)
    x = jnp.asarray(np.linspace(-1, 1, d))
    score = jnp.asarray(rng.normal(size=d))

    # dense f64 oracle via the telescoped closed form
    a = 1.0 / sigma_next**2 - 1.0 / sigma**2
    Sig = np.diag(diag) + 0.37 * np.outer(u, u) + 0.21 * np.outer(v, v)
    want = (sigma**2 / sigma_next**2) * np.linalg.solve(
        np.eye(d) + a * Sig, np.asarray(score))

    cov2 = C.time_update(cov, sigma, sigma_next)
    _, s_tel = C.transport_score(cov, cov2, sigma, sigma_next, x, score)
    _, s_two = C.transport_score_two_inverse(cov, cov2, sigma, sigma_next,
                                             x, score)
    scale = np.abs(want).max()
    err_tel = np.abs(np.asarray(s_tel) - want).max() / scale
    err_two = np.abs(np.asarray(s_two) - want).max() / scale
    assert err_tel < 1e-13
    assert err_two > 1e3 * max(err_tel, 1e-16)


def test_mechanism_transport_formula_knob():
    """FreeHunch(transport_formula=...) selects the transport implementation
    inside x0_mean_update (guards against the knob silently not being wired)."""
    from unittest import mock

    from free_hunch_tpu.guidance.mechanisms import FreeHunch
    from free_hunch_tpu.operators import get_operator

    res = 8
    mask = np.ones((1, 3, res, res), np.float32)
    op = get_operator(name="inpainting", sigma_s=0.05, mask=mask,
                      in_shape=(1, 3, res, res))

    def denoise(x, s):
        return 0.5 * x, jnp.zeros_like(x)

    calls = {"telescoped": 0, "two_inverse": 0}
    real_tel, real_two = C.transport_score, C.transport_score_two_inverse

    def spy_tel(*a, **k):
        calls["telescoped"] += 1
        return real_tel(*a, **k)

    def spy_two(*a, **k):
        calls["two_inverse"] += 1
        return real_two(*a, **k)

    y = jnp.zeros((1, 3, res, res))
    for formula in ("telescoped", "two_inverse"):
        mech = FreeHunch(forward_operator=op, cond_scaling=1.0,
                         clip_x0_mean=False, image_base_covariance="identity",
                         init_denoiser_variance=1.0, init_noise_variance=4.0,
                         data_dim=3 * res * res, cov_capacity=4,
                         solver_type="customcuda", max_rtol=1.0,
                         transport_formula=formula)
        state = mech.init_state(1, (3, res, res))
        with mock.patch.object(C, "transport_score", spy_tel), \
                mock.patch.object(C, "transport_score_two_inverse", spy_two):
            x = jnp.ones((1, 3, res, res))
            # two calls: step 0 (no transport), then a sigma change (transport)
            _, state = mech.x0_mean_update(denoise, x, y, 2.0, state)
            _, state = mech.x0_mean_update(denoise, x * 1.01, y, 1.5, state)
        assert calls[formula] >= 1, formula
        other = "two_inverse" if formula == "telescoped" else "telescoped"
        assert calls[other] == 0, (formula, calls)
        calls = {"telescoped": 0, "two_inverse": 0}
