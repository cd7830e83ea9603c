"""SVD operator library: parity vs the reference torch implementation
(imported as an oracle) and internal consistency (pinv round trips, Lambda as
a basis-independent map)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.append("/root/reference")  # append: repo-root modules must win name collisions

from free_hunch_tpu.operators import svd as S  # noqa: E402

torch = pytest.importorskip("torch")
from ddnm_functions import svd_operators as ref  # noqa: E402

DIM = 16
B = 2


def _x(seed=0, n=3 * DIM * DIM):
    return np.random.default_rng(seed).normal(size=(B, n)).astype(np.float32)


def test_inpainting_parity():
    rng = np.random.default_rng(1)
    missing = np.sort(rng.choice(3 * DIM * DIM, 200, replace=False))
    mine = S.Inpainting(3, DIM, missing)
    theirs = ref.Inpainting(3, DIM, torch.from_numpy(missing).long(), "cpu")
    x = _x(2)
    xt = torch.from_numpy(x)

    # A_with_zeros, At(A(.)), A_pinv(A(.)) are layout-independent maps
    np.testing.assert_allclose(np.asarray(mine.A_with_zeros(jnp.asarray(x))),
                               theirs.A_with_zeros(xt).numpy(), atol=1e-5)
    got = mine.A_pinv(mine.A(jnp.asarray(x)))
    want = theirs.A_pinv(theirs.A(xt)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # Lambda / Lambda_noise operate on x-space vectors directly
    eps = _x(3)
    args = (0.8, 0.1, 0.3, 0.85)
    np.testing.assert_allclose(
        np.asarray(mine.Lambda(jnp.asarray(x), *args)),
        theirs.Lambda(xt, *args).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mine.Lambda_noise(jnp.asarray(x), *args, jnp.asarray(eps))),
        theirs.Lambda_noise(xt, *args, torch.from_numpy(eps)).numpy(), atol=1e-5)


def test_super_resolution_parity():
    mine = S.SuperResolution(3, DIM, 4)
    theirs = ref.SuperResolution(3, DIM, 4, "cpu")
    x = _x(4)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(np.asarray(mine.A(jnp.asarray(x))),
                               theirs.A(xt).numpy(), atol=1e-5)
    y = np.random.default_rng(5).normal(size=(B, 3 * (DIM // 4) ** 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mine.At(jnp.asarray(y))),
                               theirs.At(torch.from_numpy(y)).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mine.A_pinv(jnp.asarray(y))),
                               theirs.A_pinv(torch.from_numpy(y)).numpy(), atol=1e-5)
    args = (0.9, 0.1, 0.05, 0.85)
    np.testing.assert_allclose(
        np.asarray(mine.Lambda(jnp.asarray(x), *args)),
        theirs.Lambda(xt, *args).numpy(), atol=1e-5)
    eps = _x(6)
    np.testing.assert_allclose(
        np.asarray(mine.Lambda_noise(jnp.asarray(x), *args, jnp.asarray(eps))),
        theirs.Lambda_noise(xt, *args, torch.from_numpy(eps)).numpy(), atol=1e-5)


def test_colorization_parity():
    mine = S.Colorization(DIM)
    theirs = ref.Colorization(DIM, "cpu")
    x = _x(7)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(np.asarray(mine.A(jnp.asarray(x))),
                               theirs.A(xt).numpy(), atol=1e-5)
    y = np.random.default_rng(8).normal(size=(B, DIM * DIM)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mine.A_pinv(jnp.asarray(y))),
                               theirs.A_pinv(torch.from_numpy(y)).numpy(), atol=1e-5)


def test_deblurring_is_true_separable_convolution():
    """A(x) must equal A1 @ X @ A1^T per channel (the upstream class tiles
    singulars across the interleaved layout, breaking this — see module doc)."""
    rng = np.random.default_rng(9)
    kernel = rng.uniform(0.1, 1.0, size=5)
    mine = S.Deblurring(kernel, 3, DIM, ZERO=0.0)
    k1 = kernel / kernel.sum()
    A1 = S._conv1d_matrix(k1, DIM)
    x = _x(10)
    want = np.einsum("ij,bcjk,lk->bcil", A1,
                     x.reshape(B, 3, DIM, DIM), A1).reshape(B, -1)
    got = np.asarray(mine.A(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deblurring_pinv_and_lambda_consistency():
    rng = np.random.default_rng(11)
    kernel = rng.uniform(0.1, 1.0, size=5)
    op = S.Deblurring(kernel, 3, DIM, ZERO=3e-2)
    x = _x(12)
    ax = op.A(jnp.asarray(x))
    # range-space projection property: A pinv A = A (within threshold rank)
    np.testing.assert_allclose(np.asarray(op.A(op.A_pinv(ax))), np.asarray(ax),
                               atol=1e-4)
    # Lambda with sigma_y=0 is identity
    np.testing.assert_allclose(
        np.asarray(op.Lambda(jnp.asarray(x), 0.5, 0.0, 0.3, 0.85)), x, atol=1e-5)

    # Lambda as a map matches the torch oracle (basis-independent). The
    # oracle takes a 2-D kernel and extracts its center row; feed both
    # implementations the same 2-D kernel.
    k2d = np.tile(kernel, (5, 1))
    theirs = ref.Deblurring(torch.from_numpy(k2d).float(), 3, DIM, "cpu")
    op = S.Deblurring(k2d, 3, DIM, ZERO=3e-2)
    args = (0.9, 0.1, 0.02, 0.85)
    got = np.asarray(op.Lambda(jnp.asarray(x), *args))
    want = theirs.Lambda(torch.from_numpy(x), *args).numpy()
    # torch-f32 vs numpy-f64 SVDs split near-degenerate singular clusters
    # slightly differently; the map agrees to ~5e-3 absolute
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_walsh_hadamard_roundtrip_and_cs():
    v = jnp.asarray(np.random.default_rng(13).normal(size=(2, 64)), jnp.float32)
    w = S.fwht(v)
    np.testing.assert_allclose(np.asarray(S.fwht(w)) / 64.0, np.asarray(v),
                               atol=1e-5)
    perm = np.random.default_rng(14).permutation(DIM * DIM)
    op = S.WalshHadamardCS(3, DIM, ratio=4, perm=perm)
    x = _x(15)
    # V is orthogonal: Vt(V(x)) = x
    np.testing.assert_allclose(np.asarray(op.Vt(op.V(jnp.asarray(x)))), x, atol=1e-4)
    # vs the torch oracle
    theirs = ref.WalshHadamardCS(3, DIM, 4, torch.from_numpy(perm).long(), "cpu")
    np.testing.assert_allclose(np.asarray(op.A(jnp.asarray(x))),
                               theirs.A(torch.from_numpy(x)).numpy(), atol=1e-4)


def test_general_a_and_cs_consistency():
    rng = np.random.default_rng(16)
    A = rng.normal(size=(10, 24))
    op = S.GeneralA(A)
    x = rng.normal(size=(B, 24)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.A(jnp.asarray(x))), x @ A.T,
                               rtol=1e-4, atol=1e-4)
    cs = S.CS(3, 32, ratio=0.25)
    xi = rng.normal(size=(B, 3 * 32 * 32)).astype(np.float32)
    # V orthogonal round trip
    np.testing.assert_allclose(np.asarray(cs.Vt(cs.V(jnp.asarray(xi)))), xi,
                               atol=1e-4)


def test_srconv_consistency():
    rng = np.random.default_rng(17)
    kernel = rng.uniform(0.1, 1.0, size=5)
    kernel = kernel / kernel.sum()
    op = S.SRConv(kernel, 3, DIM, stride=2)
    x = _x(18)
    ax = op.A(jnp.asarray(x))
    assert ax.shape == (B, 3 * (DIM // 2) ** 2)
    np.testing.assert_allclose(np.asarray(op.A(op.A_pinv(ax))), np.asarray(ax),
                               atol=1e-4)
    # V is orthogonal on the FULL space — V used to drop the identity copy of
    # the coordinates beyond the permutation, zeroing them in V(Vt(x))
    np.testing.assert_allclose(np.asarray(op.V(op.Vt(jnp.asarray(x)))), x,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(op.Vt(op.V(jnp.asarray(x)))), x,
                               atol=1e-4)


def test_deblurring2d_consistency():
    rng = np.random.default_rng(19)
    k1 = rng.uniform(0.1, 1.0, size=5)
    k2 = rng.uniform(0.1, 1.0, size=5)
    op = S.Deblurring2D(k1 / k1.sum(), k2 / k2.sum(), 3, DIM, ZERO=0.0)
    x = _x(20)
    A1 = S._conv1d_matrix(k1 / k1.sum(), DIM)
    A2 = S._conv1d_matrix(k2 / k2.sum(), DIM)
    want = np.einsum("ij,bcjk,lk->bcil", A1, x.reshape(B, 3, DIM, DIM),
                     A2).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(op.A(jnp.asarray(x))), want, atol=1e-3)


def test_batched_inpainting_per_image_masks():
    """Per-image masks in ONE operator (used by the DDNM evaluator: fresh
    mask per image, shared across its seed replicas — the single-mask
    construction used to stamp batch_keys[0]'s mask on the whole batch)."""
    opt = {"mask_type": "random", "image_size": DIM,
           "mask_prob_range": (0.3, 0.5)}
    keys = [jax.random.PRNGKey(1), jax.random.PRNGKey(2)]
    op = S.create_inpainting_operator(3, DIM, opt, mask_key=keys, repeats=2)
    n = 3 * DIM * DIM
    ones = jnp.ones((4, n), jnp.float32)
    kept = np.asarray(op.A_with_zeros(ones))  # 1 on kept pixels, 0 on missing
    # seed replicas share the image's mask; different images differ
    np.testing.assert_array_equal(kept[0], kept[1])
    np.testing.assert_array_equal(kept[2], kept[3])
    assert np.abs(kept[0] - kept[2]).max() > 0
    # each row matches the single-mask operator built from the same key
    for row, key in [(0, keys[0]), (2, keys[1])]:
        single = S.create_inpainting_operator(3, DIM, opt, mask_key=key)
        np.testing.assert_array_equal(kept[row],
                                      np.asarray(single.A_with_zeros(ones[:1]))[0])
    # per-row V orthogonality + A == mask pick
    x = np.random.default_rng(30).normal(size=(4, n)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.Vt(op.V(jnp.asarray(x)))), x,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(op.V(op.Vt(jnp.asarray(x)))), x,
                               atol=1e-5)
