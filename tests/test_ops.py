"""DCT, FFT-operator helpers, and CG solver tests."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.fft

import free_hunch_tpu.ops.cg as cg_mod
from free_hunch_tpu.ops import dct as dct_mod
from free_hunch_tpu.ops import fftops


def test_dct2d_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16))
    got = dct_mod.dct_2d(jnp.asarray(x))
    want = scipy.fft.dctn(x, axes=(-2, -1), norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    back = dct_mod.idct_2d(got)
    np.testing.assert_allclose(back, x, rtol=1e-10, atol=1e-12)


def test_dct_is_orthonormal():
    c = np.asarray(dct_mod.dct_matrix(32, jnp.float64))
    np.testing.assert_allclose(c @ c.T, np.eye(32), atol=1e-12)


def test_p2o_and_fft_conv_match_circular_convolution():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 1, 16, 16))
    k = np.zeros((1, 1, 5, 5))
    k[0, 0] = rng.normal(size=(5, 5))
    FB = fftops.p2o(jnp.asarray(k, jnp.complex64), (16, 16))
    y = fftops.fft_conv(jnp.asarray(x, jnp.float32), FB)
    # oracle: scipy circular convolution with centered kernel
    from scipy import ndimage
    want = ndimage.convolve(x[0, 0], k[0, 0], mode="wrap")
    np.testing.assert_allclose(np.asarray(y)[0, 0], want, rtol=1e-4, atol=1e-5)


def test_up_down_sample_adjoint():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8)))
    y = jnp.asarray(rng.normal(size=(1, 3, 16, 16)))
    # <up(x), y> == <x, down(y)>
    lhs = jnp.sum(fftops.upsample(x, 2) * y)
    rhs = jnp.sum(x * fftops.downsample(y, 2))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_splits_blocks():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    b = fftops.splits(x, 2)
    assert b.shape == (1, 1, 2, 2, 4)
    # block 0 must be the top-left strided samples of chunking semantics
    np.testing.assert_allclose(np.asarray(b).sum(), np.asarray(x).sum())


def test_cg_batch_solves_spd_systems():
    rng = np.random.default_rng(3)
    n, batch = 24, 3
    A = rng.normal(size=(batch, n, n))
    A = A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(batch, n))
    Aj = jnp.asarray(A)
    mv = lambda v: jnp.einsum("bij,bj->bi", Aj, v)
    x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=1e-10, maxiter=200)
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=1e-6, atol=1e-8)
    assert bool(info.optimal.all())


def test_cg_respects_per_sample_rtol():
    rng = np.random.default_rng(4)
    n = 16
    A = rng.normal(size=(2, n, n))
    A = A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(2, n))
    Aj = jnp.asarray(A)
    mv = lambda v: jnp.einsum("bij,bj->bi", Aj, v)
    rtol = jnp.asarray([1e-1, 1e-12])
    x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=rtol, maxiter=500)
    res = np.linalg.norm(np.einsum("bij,bj->bi", A, np.asarray(x)) - b, axis=-1)
    bn = np.linalg.norm(b, axis=-1)
    assert res[0] <= 1e-1 * bn[0]
    assert res[1] <= 1e-10 * bn[1]


def test_cg_shaped_wrapper_and_jit():
    rng = np.random.default_rng(5)
    x_true = rng.normal(size=(2, 3, 4))
    mask = (rng.uniform(size=(2, 3, 4)) > 0.3).astype(np.float64)
    mv = lambda v: mask * v + 0.1 * v  # SPD diagonal operator on shaped input
    b = np.asarray(mv(jnp.asarray(x_true)))
    f = jax.jit(lambda bb: cg_mod.cg(mv, bb, rtol=1e-12, maxiter=100)[0])
    x = f(jnp.asarray(b))
    np.testing.assert_allclose(x, x_true, rtol=1e-8)


def test_cg_solve_differentiable():
    rng = np.random.default_rng(6)
    n = 8
    A = rng.normal(size=(n, n))
    A = A @ A.T + n * np.eye(n)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.normal(size=n))

    def loss(bb):
        x = cg_mod.cg_solve(lambda v: Aj @ v, bb, rtol=1e-12, maxiter=200)
        return jnp.sum(x**2)

    g = jax.grad(loss)(b)
    x = np.linalg.solve(A, np.asarray(b))
    want = 2 * np.linalg.solve(A, x)  # d/db ||A^-1 b||^2 = 2 A^-T A^-1 b
    np.testing.assert_allclose(g, want, rtol=1e-6, atol=1e-9)


def test_cg_breakdown_takes_no_step():
    """pAp breakdown (zero curvature along p) must freeze the row WITHOUT
    committing the near-breakdown alpha ~ rz/tiny step first — the reference
    torch CG breaks out before applying the update (cg.py:250-259). With
    track_best=False the LAST iterate is returned, so a poisoned step would
    be user-visible."""
    b = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)))
    mv = lambda v: jnp.zeros_like(v)  # A = 0: pap = 0 on the first iteration
    x, info = cg_mod.cg_batch(mv, b, rtol=1e-10, maxiter=50, track_best=False)
    np.testing.assert_array_equal(np.asarray(x), 0.0)  # stayed at x0
    assert np.isfinite(np.asarray(x)).all()
    # the frozen rows never reached the tolerance -> not optimal
    assert not bool(np.asarray(info.optimal).any())
    # residual_norm reports the RETURNED (last) iterate's true residual ||b||
    np.testing.assert_allclose(np.asarray(info.residual_norm),
                               np.linalg.norm(b, axis=-1), rtol=1e-12)


def test_cg_breakdown_is_relative_not_absolute():
    """A tiny-but-healthy SPD system (all curvature below the reference's
    absolute 1e-16 cutoff) must still be solved: the breakdown test is
    relative to ||p||^2, not an absolute pap threshold."""
    rng = np.random.default_rng(1)
    n = 6
    A = rng.normal(size=(n, n))
    A = (A @ A.T + n * np.eye(n)) * 1e-24  # pap ~ 1e-24 * ||p||^2 scale
    b = rng.normal(size=(1, n)) * 1e-12
    Aj = jnp.asarray(A)
    mv = lambda v: v @ Aj.T
    x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=1e-8, maxiter=100)
    want = np.linalg.solve(A, b[0])
    np.testing.assert_allclose(np.asarray(x[0]), want, rtol=1e-5)
    assert bool(info.optimal.all())


def test_cg_optimal_means_returned_iterate_converged():
    """'optimal' must report whether the returned iterate actually reached the
    rtol/atol stop — maxiter/stall exits report False, and residual_norm is
    the returned iterate's true ||Ax - b|| for both track_best settings."""
    rng = np.random.default_rng(2)
    n = 32
    # ill-conditioned SPD system: 1 iteration cannot converge to rtol=1e-10
    A = rng.normal(size=(1, n, n))
    A = A @ np.transpose(A, (0, 2, 1)) + 1e-3 * np.eye(n)
    b = rng.normal(size=(1, n))
    Aj = jnp.asarray(A)
    mv = lambda v: jnp.einsum("bij,bj->bi", Aj, v)
    for track_best in (True, False):
        x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=1e-10, maxiter=1,
                                  track_best=track_best)
        true_res = np.linalg.norm(
            np.einsum("bij,bj->bi", A, np.asarray(x)) - b, axis=-1)
        np.testing.assert_allclose(np.asarray(info.residual_norm), true_res,
                                   rtol=1e-10)
        assert not bool(np.asarray(info.optimal)[0]), track_best
    # and a converged solve still reports optimal=True
    x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=1e-10, maxiter=500)
    assert bool(np.asarray(info.optimal)[0])


def test_cg_stall_detector_only_engages_in_converging_regime():
    """CG's 2-norm residual is non-monotone: on an ill-conditioned system it
    can plateau for dozens of iterations ABOVE any useful accuracy before
    dropping (observed on SR systems with the network's per-pixel variance).
    The stall counter must not freeze the solve there — only a plateau below
    ``stall_engage * ||b||`` is treated as the numerical floor."""
    rng = np.random.default_rng(6)
    n = 2048
    # log-spaced spectrum, kappa=1e4: the 2-norm residual stays within 0.1%
    # of its running best for ~68 consecutive iterations while still at
    # ~||b||, then converges past rtol=1e-3 (measured plateau profile)
    d = jnp.asarray(np.logspace(-4, 0, n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    mv = lambda v: v * d[None, :]
    x, info = cg_mod.cg_batch(mv, b, rtol=1e-3, maxiter=2000, stall_iters=25)
    assert bool(np.asarray(info.optimal)[0]), float(info.residual_norm[0])
    rel = float(info.residual_norm[0]) / float(jnp.linalg.norm(b))
    assert rel <= 1e-3
    # an always-engaged counter without the floor check (legacy behaviour)
    # freezes on the plateau with a garbage iterate — guards that the engage
    # threshold matters; with the floor check on, even an always-engaged
    # counter recognises the plateau and recovers (next test)
    x2, info2 = cg_mod.cg_batch(mv, b, rtol=1e-3, maxiter=2000,
                                stall_iters=25, stall_engage=np.inf,
                                stall_floor_check=False)
    assert not bool(np.asarray(info2.optimal)[0])
    assert float(info2.residual_norm[0]) / float(jnp.linalg.norm(b)) > 0.5


def test_cg_stall_floor_check_rescues_ill_conditioned_solves():
    """Conditioning-aware stall policy (VERDICT r4 #2): on a system with
    kappa >> 2.5e5 CG's real convergence rate drops below 0.1%/iteration
    and its 2-norm residual plateaus for O(sqrt(kappa)) stretches; the
    legacy unconditional freeze then returns a far-from-converged iterate
    (measured as a 1.97 dB PSNR gap on the near-singular motion-blur PSF at
    default knobs). The floor check (one extra matvec per counter firing)
    must recognise the plateau as NOT a floor and keep iterating to the
    requested tolerance, while the legacy policy demonstrably truncates on
    the same system."""
    rng = np.random.default_rng(11)
    n = 4096
    # motion-blur-like spectrum: near-singular tail (the PSF spectrum's
    # minimum ~ sigma_s^2 -> 0), kappa ~ 1e7. f64, like the reference A/B
    # harness runs our solver (in f32 such a system is floor-limited anyway
    # and the floor detection is what matters — next test)
    d = jnp.asarray(np.logspace(-7, 0, n))
    b = jnp.asarray(rng.standard_normal((2, n)))
    mv = lambda v: v * d[None, :]
    rtol = 3e-3
    x, info = cg_mod.cg_batch(mv, b, rtol=rtol, maxiter=20000, stall_iters=25)
    assert bool(np.asarray(info.optimal).all()), (
        f"adaptive stall froze early: rel residual "
        f"{np.asarray(info.residual_norm) / np.asarray(jnp.linalg.norm(b, axis=-1))}")
    # the legacy fixed threshold truncates the same solve (documents WHY the
    # adaptive policy exists; if this ever starts converging the adaptive
    # machinery may be removable)
    x2, info2 = cg_mod.cg_batch(mv, b, rtol=rtol, maxiter=20000,
                                stall_iters=25, stall_floor_check=False)
    assert not bool(np.asarray(info2.optimal).all())


def test_cg_adaptive_stall_still_freezes_at_the_f32_floor():
    """The adaptive threshold must not lose the floor detection that
    motivated stall_iters: request an rtol below the f32-achievable floor
    and verify the solve exits LONG before maxiter with full accuracy."""
    rng = np.random.default_rng(12)
    n = 512
    A = rng.normal(size=(1, n, n)).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) / n + 0.1 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal((1, n)).astype(np.float32)
    Aj = jnp.asarray(A)
    mv = lambda v: jnp.einsum("bij,bj->bi", Aj, v).astype(jnp.float32)
    # rtol=1e-12 is unreachable in f32; the floor is ~1e-6..1e-7
    x, info = cg_mod.cg_batch(mv, jnp.asarray(b), rtol=1e-12, maxiter=5000,
                              stall_iters=25)
    assert int(info.niter) < 1000, int(info.niter)
    rel = float(info.residual_norm[0]) / float(np.linalg.norm(b))
    assert rel < 1e-4, rel
