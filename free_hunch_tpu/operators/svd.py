"""SVD-factorised measurement operators (the DDNM+ A_functions library).

Parity: reference ``ddnm_functions/svd_operators.py:9-1310`` — the
``A_functions`` interface (V/Vt/U/Ut/singulars/add_zeros with derived
A/At/A_pinv/A_pinv_eta/Lambda/Lambda_noise) and its implementations:
Denoising:558, Inpainting:440 (+create_inpainting_operator:333),
SuperResolution:595, Colorization:743, Deblurring:1050 (separable 1-D conv
matrix SVD with Kronecker singular values and the 3e-2 threshold),
Deblurring2D:1239, SRConv:967, GeneralA:183, CS:111, WalshHadamardCS:221.

TPU redesign:

* all factor matrices are computed once at setup with numpy float64 SVDs and
  held as device constants; every V/Vt/U/Ut is a batched matmul (two
  (dim x dim) GEMMs for the separable operators — MXU native) or a gather,
* the DDNM+ spectral shrinkage (Lambda) and noise split (Lambda_noise),
  duplicated per class upstream, are one shared helper over padded singular
  values (`_ddnm_factors`); sigma_t may be a traced scalar, so the reference's
  Python masking becomes `where` arithmetic,
* channel layout: per-pixel channels are interleaved by Vt (as upstream);
  singular values are repeat_interleaved to match. (Upstream `Deblurring`
  tiles instead of interleaving — internally consistent but it makes A() not
  the actual per-channel blur; we use the correct interleave, as upstream's
  own SRConv does.)

Vectors are (batch, N) flattened, matching the reference calling convention.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


class AFunctions:
    """Interface of an SVD-factorised linear operator A = U diag(s) V^T."""

    channels: int = 3

    def V(self, vec):
        raise NotImplementedError

    def Vt(self, vec):
        raise NotImplementedError

    def U(self, vec):
        raise NotImplementedError

    def Ut(self, vec):
        raise NotImplementedError

    def singulars(self):
        raise NotImplementedError

    def add_zeros(self, vec):
        """Pad a small-space vector with zeros up to the big space."""
        raise NotImplementedError

    # -- derived maps (reference :52-101) --------------------------------------

    def A(self, vec):
        s = self.singulars()
        temp = self.Vt(vec)
        return self.U(s * temp[:, :s.shape[-1]])

    def A_with_zeros(self, vec):
        return self.V(self.add_zeros(self.A(vec)))

    def At(self, vec):
        s = self.singulars()
        temp = self.Ut(vec)
        return self.V(self.add_zeros(s * temp[:, :s.shape[-1]]))

    def A_pinv(self, vec):
        s = self.singulars()
        factors = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        temp = self.Ut(vec)
        temp = temp.at[:, :s.shape[-1]].multiply(factors)
        return self.V(self.add_zeros(temp))

    def A_pinv_eta(self, vec, eta):
        s = self.singulars()
        factors = s / (s * s + eta)
        temp = self.Ut(vec)
        temp = temp.at[:, :s.shape[-1]].multiply(factors)
        return self.V(self.add_zeros(temp))

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        raise NotImplementedError

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        raise NotImplementedError


def _ddnm_factors(singulars_padded: jnp.ndarray, a, sigma_y, sigma_t, eta):
    """Shared DDNM+ spectral coefficients (the per-class blocks at reference
    :477-503, :651-686, :785-852, :1161-1236 are all this computation).

    Returns (lambda_t, d1_t, d2_t) over the padded singular-value vector:
      lambda_t — null/range-space shrinkage of the pseudo-inverse correction,
      d1_t/d2_t — the split of the ancestral noise between the predicted
      epsilon direction and fresh noise.
    Safe under tracing (sigma_t may be a jax scalar).
    """
    s = singulars_padded
    inv_s = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    ones = jnp.ones_like(s)
    lambda_t = ones
    d1_t = ones * sigma_t * eta
    d2_t = ones * sigma_t * np.sqrt(max(1 - eta**2, 0.0))

    if sigma_y == 0:
        return lambda_t, d1_t, d2_t

    below = (sigma_t < a * sigma_y * inv_s).astype(s.dtype)      # noisier obs
    above = (sigma_t > a * sigma_y * inv_s).astype(s.dtype)
    zero = (s == 0).astype(s.dtype)

    lambda_t = (lambda_t * (1 - below)
                + below * (s * sigma_t * np.sqrt(max(1 - eta**2, 0.0)) / a / sigma_y))

    d1_t = d1_t * (1 - below) + below * sigma_t * eta
    d2_t = d2_t * (1 - below)
    d1_t = (d1_t * (1 - above)
            + jnp.sqrt(jnp.clip(above * (sigma_t**2 - a**2 * sigma_y**2 * inv_s**2),
                                min=0.0)))
    d2_t = d2_t * (1 - above)
    d1_t = d1_t * (1 - zero) + zero * sigma_t * eta
    d2_t = d2_t * (1 - zero) + zero * sigma_t * np.sqrt(max(1 - eta**2, 0.0))
    return lambda_t, d1_t, d2_t


def _pad_singulars(s: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.zeros((n,), s.dtype).at[: s.shape[0]].set(s)


# ---------------------------------------------------------------------------
# Denoising (identity)
# ---------------------------------------------------------------------------

class Denoising(AFunctions):
    """(reference :558-592)"""

    def __init__(self, channels, img_dim):
        self.channels = channels
        self.img_dim = img_dim
        self._singulars = jnp.ones(channels * img_dim**2, jnp.float32)

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Vt = V
    U = V
    Ut = V
    add_zeros = V

    def singulars(self):
        return self._singulars

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        lam, _, _ = _ddnm_factors(self._singulars[:1], a, sigma_y, sigma_t, eta)
        return vec * lam[0]

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        _, d1, d2 = _ddnm_factors(self._singulars[:1], a, sigma_y, sigma_t, eta)
        return vec * d1[0] + epsilon * d2[0]


# ---------------------------------------------------------------------------
# Inpainting
# ---------------------------------------------------------------------------

class Inpainting(AFunctions):
    """Pixel subset measurement; V is the kept/missing permutation
    (reference :440-555).

    TPU note: the reference stores `len(kept)` singular values, which makes
    the operator's shapes depend on the mask density. Here the singular-value
    vector has full length n with zeros on the masked coordinates (the padded
    SVD of the same A), so all shapes are static: masks of any density share
    one compiled sampler, and the operator is a jit-traversable pytree."""

    def __init__(self, channels, img_dim, missing_indices):
        """``missing_indices``: one index array for a mask shared by the whole
        batch (reference semantics, batch 1), or a LIST of per-row index
        arrays for per-image masks — rows must align with the batch rows of
        every vector passed in. Per-row masks keep all shapes static (the
        padded-singulars trick), so both layouts share one compilation."""
        self.channels = channels
        self.img_dim = img_dim
        n = channels * img_dim**2
        self._n = n

        def one(missing):
            missing = np.asarray(missing, np.int64)
            kept = np.setdiff1d(np.arange(n), missing)
            perm = np.concatenate([kept, missing])
            svals = np.zeros(n, np.float32)
            svals[: kept.shape[0]] = 1.0
            return perm, np.argsort(perm), svals

        if isinstance(missing_indices, (list, tuple)):
            perms, invs, svs = zip(*(one(m) for m in missing_indices))
            self._perm = jnp.asarray(np.stack(perms))
            self._inv_perm = jnp.asarray(np.stack(invs))
            self._singulars = jnp.asarray(np.stack(svs))
        else:
            perm, inv, svals = one(missing_indices)
            self._perm = jnp.asarray(perm)
            self._inv_perm = jnp.asarray(inv)
            self._singulars = jnp.asarray(svals)

    @staticmethod
    def _gather(vec, idx):
        if idx.ndim == 1:
            return vec[:, idx]
        return jnp.take_along_axis(vec, idx, axis=1)

    # channel-last pixel ordering helpers (reference reshape/permute pattern)
    def _to_pixel_last(self, vec):
        return (vec.reshape(vec.shape[0], self.channels, -1)
                .transpose(0, 2, 1).reshape(vec.shape[0], -1))

    def _from_pixel_last(self, vec):
        return (vec.reshape(vec.shape[0], -1, self.channels)
                .transpose(0, 2, 1).reshape(vec.shape[0], -1))

    def V(self, vec):
        temp = vec.reshape(vec.shape[0], -1)
        out = self._gather(temp, self._inv_perm)
        return self._from_pixel_last(out)

    def Vt(self, vec):
        temp = self._to_pixel_last(vec)
        return self._gather(temp, self._perm)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)

    @staticmethod
    def _bcast(x):
        return x if x.ndim == 2 else x[None, :]

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        out = self.Vt(vec)
        lam, _, _ = _ddnm_factors(self._singulars, a, sigma_y, sigma_t, eta)
        return self.V(out * self._bcast(lam))

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        out_v = self.Vt(vec)
        out_e = self.Vt(epsilon)
        _, d1, d2 = _ddnm_factors(self._singulars, a, sigma_y, sigma_t, eta)
        return self.V(out_v * self._bcast(d1)) + self.V(out_e * self._bcast(d2))


def create_inpainting_operator(channels, img_dim, mask_opt, mask_key=None,
                               repeats=1):
    """Build Inpainting from a mask generator draw (reference :333-364).
    Box masks are centered like the DDNM MaskGenerator variant (:429-431).

    ``mask_key``: one PRNG key (shared mask, reference batch-1 semantics) or
    a list of keys — one fresh mask per key, each repeated ``repeats`` times
    (seed replicas of an image share its mask), yielding a batched operator
    whose rows align with an (images*repeats) batch."""
    from free_hunch_tpu.operators import masks as mask_mod
    opt = dict(mask_opt)
    opt.setdefault("image_size", img_dim)
    if mask_key is None:
        mask_key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if isinstance(mask_key, (list, tuple)):
        missing = []
        for k in mask_key:
            m = np.asarray(mask_mod.generate_mask(k, opt, channels))[0]
            missing += [np.where(m.reshape(-1) == 0)[0]] * repeats
        return Inpainting(channels, img_dim, missing)
    mask = np.asarray(mask_mod.generate_mask(mask_key, opt, channels))[0]
    missing = np.where(mask.reshape(-1) == 0)[0]
    return Inpainting(channels, img_dim, missing)


# ---------------------------------------------------------------------------
# Super-resolution (block average)
# ---------------------------------------------------------------------------

class SuperResolution(AFunctions):
    """ratio x ratio patch averaging; per-patch SVD of the 1 x r^2 averaging
    row (reference :595-739)."""

    def __init__(self, channels, img_dim, ratio):
        assert img_dim % ratio == 0
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        self.y_dim = img_dim // ratio
        A = np.full((1, ratio**2), 1.0 / ratio**2)
        U, s, Vt = np.linalg.svd(A, full_matrices=True)
        self.U_small = jnp.asarray(U, jnp.float32)          # (1, 1)
        self.singulars_small = jnp.asarray(s, jnp.float32)  # (1,)
        self.V_small = jnp.asarray(Vt.T, jnp.float32)       # (r^2, r^2)

    def _patches_to_img(self, patches):
        """(B, C, y^2, r^2) -> (B, C*D^2) image layout."""
        b = patches.shape[0]
        p = patches.reshape(b, self.channels, self.y_dim, self.y_dim,
                            self.ratio, self.ratio)
        p = p.transpose(0, 1, 2, 4, 3, 5)
        return p.reshape(b, self.channels * self.img_dim**2)

    def _img_to_patches(self, vec):
        b = vec.shape[0]
        img = vec.reshape(b, self.channels, self.img_dim, self.img_dim)
        p = img.reshape(b, self.channels, self.y_dim, self.ratio,
                        self.y_dim, self.ratio)
        p = p.transpose(0, 1, 2, 4, 3, 5)
        return p.reshape(b, self.channels, self.y_dim**2, self.ratio**2)

    def V(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, -1)
        r2 = self.ratio**2
        n_dc = self.channels * self.y_dim**2
        patches = jnp.zeros((b, self.channels, self.y_dim**2, r2), vec.dtype)
        patches = patches.at[:, :, :, 0].set(
            temp[:, :n_dc].reshape(b, self.channels, -1))
        # reference strided reordering of the non-DC coefficients (:611-612)
        for idx in range(r2 - 1):
            patches = patches.at[:, :, :, idx + 1].set(
                temp[:, (n_dc + idx)::r2 - 1].reshape(b, self.channels, -1))
        patches = jnp.einsum("ij,bcpj->bcpi", self.V_small, patches)
        return self._patches_to_img(patches)

    def Vt(self, vec):
        b = vec.shape[0]
        r2 = self.ratio**2
        n_dc = self.channels * self.y_dim**2
        patches = self._img_to_patches(vec)
        patches = jnp.einsum("ji,bcpj->bcpi", self.V_small, patches)
        recon = jnp.zeros((b, self.channels * self.img_dim**2), vec.dtype)
        recon = recon.at[:, :n_dc].set(patches[:, :, :, 0].reshape(b, -1))
        for idx in range(r2 - 1):
            recon = recon.at[:, (n_dc + idx)::r2 - 1].set(
                patches[:, :, :, idx + 1].reshape(b, -1))
        return recon

    def U(self, vec):
        return self.U_small[0, 0] * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self.singulars_small, self.channels * self.y_dim**2)

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], v.shape[1] * self.ratio**2), v.dtype)
        return out.at[:, :v.shape[1]].set(v)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        patches = self._img_to_patches(vec)
        patches = jnp.einsum("ji,bcpj->bcpi", self.V_small, patches)
        lam, _, _ = _ddnm_factors(_pad_singulars(self.singulars_small, self.ratio**2),
                                  a, sigma_y, sigma_t, eta)
        patches = patches * lam[None, None, None, :]
        patches = jnp.einsum("ij,bcpj->bcpi", self.V_small, patches)
        return self._patches_to_img(patches)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        pv = self._img_to_patches(vec)
        pe = self._img_to_patches(epsilon)
        _, d1, d2 = _ddnm_factors(_pad_singulars(self.singulars_small, self.ratio**2),
                                  a, sigma_y, sigma_t, eta)
        pv = jnp.einsum("ij,bcpj->bcpi", self.V_small, pv * d1[None, None, None, :])
        pe = jnp.einsum("ij,bcpj->bcpi", self.V_small, pe * d2[None, None, None, :])
        return self._patches_to_img(pv) + self._patches_to_img(pe)


# ---------------------------------------------------------------------------
# Colorization
# ---------------------------------------------------------------------------

class Colorization(AFunctions):
    """Per-pixel channel average (reference :743-852)."""

    def __init__(self, img_dim):
        self.channels = 3
        self.img_dim = img_dim
        A = np.asarray([[0.3333, 0.3334, 0.3333]])
        U, s, Vt = np.linalg.svd(A, full_matrices=True)
        self.U_small = jnp.asarray(U, jnp.float32)
        self.singulars_small = jnp.asarray(s, jnp.float32)
        self.V_small = jnp.asarray(Vt.T, jnp.float32)

    def _needles(self, vec):
        return (vec.reshape(vec.shape[0], self.channels, -1)
                .transpose(0, 2, 1))  # (B, D^2, C)

    def _unneedle(self, needles):
        return needles.transpose(0, 2, 1).reshape(needles.shape[0], -1)

    def V(self, vec):
        n = self._needles(vec)
        return self._unneedle(jnp.einsum("ij,bpj->bpi", self.V_small, n))

    def Vt(self, vec):
        n = self._needles(vec)
        return self._unneedle(jnp.einsum("ji,bpj->bpi", self.V_small, n))

    def U(self, vec):
        return self.U_small[0, 0] * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self.singulars_small, self.img_dim**2)

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], self.channels * self.img_dim**2), v.dtype)
        return out.at[:, :self.img_dim**2].set(v)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        n = self._needles(vec)
        n = jnp.einsum("ji,bpj->bpi", self.V_small, n)
        lam, _, _ = _ddnm_factors(_pad_singulars(self.singulars_small, self.channels),
                                  a, sigma_y, sigma_t, eta)
        n = n * lam[None, None, :]
        n = jnp.einsum("ij,bpj->bpi", self.V_small, n)
        return self._unneedle(n)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        nv, ne = self._needles(vec), self._needles(epsilon)
        _, d1, d2 = _ddnm_factors(_pad_singulars(self.singulars_small, self.channels),
                                  a, sigma_y, sigma_t, eta)
        nv = jnp.einsum("ij,bpj->bpi", self.V_small, nv * d1[None, None, :])
        ne = jnp.einsum("ij,bpj->bpi", self.V_small, ne * d2[None, None, :])
        return self._unneedle(nv) + self._unneedle(ne)


# ---------------------------------------------------------------------------
# Deblurring (separable 1-D convolution matrix SVD)
# ---------------------------------------------------------------------------

def _conv1d_matrix(kernel1d: np.ndarray, img_dim: int) -> np.ndarray:
    """Banded 1-D convolution matrix with the reference's (asymmetric)
    support [i - k//2, i + k//2) and zero boundary (reference :1072-1076)."""
    k = kernel1d.shape[0]
    A = np.zeros((img_dim, img_dim))
    for off in range(-(k // 2), k // 2):
        diag = kernel1d[off + k // 2]
        idx = np.arange(max(0, -off), min(img_dim, img_dim - off))
        A[idx, idx + off] = diag
    return A


class Deblurring(AFunctions):
    """Separable blur A = (A1 ⊗ A1) per channel via the Kronecker SVD
    (reference :1050-1236): SVD of the 1-D conv matrix, Kronecker singular
    values sorted descending with the 3e-2 hard threshold; Lambda uses the
    unthresholded singulars."""

    def __init__(self, kernel, channels, img_dim, ZERO=3e-2,
                 use_ddnm_kernel_params=False):
        self.channels = channels
        self.img_dim = img_dim
        kernel = np.asarray(kernel, np.float64)
        if kernel.ndim == 2:
            # center row of the 2-D kernel, renormalised (reference :1063)
            kernel = kernel[kernel.shape[0] // 2]
        kernel = kernel / kernel.sum()
        if use_ddnm_kernel_params:
            sigma = 10.0
            x = np.asarray([-2, -1, 0, 1, 2], np.float64)
            kernel = np.exp(-0.5 * (x / sigma) ** 2)
            kernel = kernel / kernel.sum()

        A1 = _conv1d_matrix(kernel, img_dim)
        U, s, Vt = np.linalg.svd(A1, full_matrices=True)
        self.U_small = jnp.asarray(U, jnp.float32)
        self.V_small = jnp.asarray(Vt.T, jnp.float32)
        s_orig = s.copy()
        s = np.where(s < ZERO, 0.0, s)
        big = np.outer(s, s).reshape(-1)
        big_orig = np.outer(s_orig, s_orig).reshape(-1)
        perm = np.argsort(-big, kind="stable")
        self._perm = jnp.asarray(perm)
        self._inv_perm = jnp.asarray(np.argsort(perm))
        self._singulars = jnp.asarray(big[perm], jnp.float32)
        self._singulars_orig = jnp.asarray(big_orig[perm], jnp.float32)

    def _two_sided(self, M_left, M_right, img_flat):
        """(B, C*D^2) image -> M_left @ img @ M_right per channel."""
        b = img_flat.shape[0]
        img = img_flat.reshape(b * self.channels, self.img_dim, self.img_dim)
        out = jnp.einsum("ij,njk,kl->nil", M_left, img, M_right)
        return out.reshape(b, -1)

    def V(self, vec):
        b = vec.shape[0]
        # invert the singular-value permutation, channels pixel-last
        temp = vec.reshape(b, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        temp = temp.transpose(0, 2, 1).reshape(b, -1)
        return self._two_sided(self.V_small, self.V_small.T, temp)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.V_small.T, self.V_small, vec.reshape(b, -1))
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        temp = temp.transpose(0, 2, 1).reshape(b, -1)
        return self._two_sided(self.U_small, self.U_small.T, temp)

    def Ut(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.U_small.T, self.U_small, vec.reshape(b, -1))
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        # per-pixel channel-interleaved layout (upstream tiles here; see
        # module docstring)
        return jnp.repeat(self._singulars, self.channels)

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        b = vec.shape[0]
        temp = self._two_sided(self.V_small.T, self.V_small, vec.reshape(b, -1))
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm].transpose(0, 2, 1)
        lam, _, _ = _ddnm_factors(self._singulars_orig, a, sigma_y, sigma_t, eta)
        temp = temp * lam[None, :, None]
        out = jnp.zeros((b, self.img_dim**2, self.channels), vec.dtype)
        out = out.at[:, self._perm, :].set(temp)
        out = out.transpose(0, 2, 1).reshape(b, -1)
        return self._two_sided(self.V_small, self.V_small.T, out)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        b = vec.shape[0]
        _, d1, d2 = _ddnm_factors(self._singulars_orig, a, sigma_y, sigma_t, eta)

        def half(x, d):
            t = x.reshape(b, self.channels, -1)[:, :, self._perm].transpose(0, 2, 1)
            t = t * d[None, :, None]
            o = jnp.zeros((b, self.img_dim**2, self.channels), x.dtype)
            o = o.at[:, self._perm, :].set(t)
            o = o.transpose(0, 2, 1).reshape(b, -1)
            return self._two_sided(self.V_small, self.V_small.T, o)

        return half(vec, d1) + half(epsilon, d2)


class Deblurring2D(AFunctions):
    """Anisotropic separable blur with distinct row/column kernels
    (reference :1239-1309)."""

    def __init__(self, kernel1, kernel2, channels, img_dim, ZERO=3e-2):
        self.channels = channels
        self.img_dim = img_dim
        A1 = _conv1d_matrix(np.asarray(kernel1, np.float64), img_dim)
        A2 = _conv1d_matrix(np.asarray(kernel2, np.float64), img_dim)
        U1, s1, V1t = np.linalg.svd(A1, full_matrices=True)
        U2, s2, V2t = np.linalg.svd(A2, full_matrices=True)
        s1 = np.where(s1 < ZERO, 0.0, s1)
        s2 = np.where(s2 < ZERO, 0.0, s2)
        self.U_small1, self.V_small1 = jnp.asarray(U1, jnp.float32), jnp.asarray(V1t.T, jnp.float32)
        self.U_small2, self.V_small2 = jnp.asarray(U2, jnp.float32), jnp.asarray(V2t.T, jnp.float32)
        big = np.outer(s1, s2).reshape(-1)
        perm = np.argsort(-big, kind="stable")
        self._perm = jnp.asarray(perm)
        self._inv_perm = jnp.asarray(np.argsort(perm))
        self._singulars = jnp.asarray(big[perm], jnp.float32)

    def _two_sided(self, M_left, M_right, img_flat):
        b = img_flat.shape[0]
        img = img_flat.reshape(b * self.channels, self.img_dim, self.img_dim)
        out = jnp.einsum("ij,njk,kl->nil", M_left, img, M_right)
        return out.reshape(b, -1)

    def V(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        temp = temp.transpose(0, 2, 1).reshape(b, -1)
        return self._two_sided(self.V_small1, self.V_small2.T, temp)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.V_small1.T, self.V_small2, vec.reshape(b, -1))
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, self.img_dim**2, self.channels)[:, self._inv_perm, :]
        temp = temp.transpose(0, 2, 1).reshape(b, -1)
        return self._two_sided(self.U_small1, self.U_small2.T, temp)

    def Ut(self, vec):
        b = vec.shape[0]
        temp = self._two_sided(self.U_small1.T, self.U_small2, vec.reshape(b, -1))
        temp = temp.reshape(b, self.channels, -1)[:, :, self._perm]
        return temp.transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        return jnp.repeat(self._singulars, self.channels)

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)


# ---------------------------------------------------------------------------
# SRConv (arbitrary-kernel strided SR)
# ---------------------------------------------------------------------------

class SRConv(AFunctions):
    """Stride-sampled 1-D conv matrix with reflective padding (reference
    :967-1047), Kronecker singulars and the Appendix-D.5 permutation."""

    def __init__(self, kernel, channels, img_dim, stride=1, ZERO=3e-2):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = stride
        small = img_dim // stride
        self.small_dim = small
        kernel = np.asarray(kernel, np.float64)
        k = kernel.shape[0]
        A = np.zeros((small, img_dim))
        for i in range(stride // 2, img_dim + stride // 2, stride):
            for j in range(i - k // 2, i + k // 2):
                je = j
                if je < 0:
                    je = -je - 1
                if je >= img_dim:
                    je = (img_dim - 1) - (je - img_dim)
                A[i // stride, je] += kernel[j - i + k // 2]
        U, s, Vt = np.linalg.svd(A, full_matrices=True)
        s = np.where(s < ZERO, 0.0, s)
        self.U_small = jnp.asarray(U, jnp.float32)          # (small, small)
        self.V_small = jnp.asarray(Vt.T, jnp.float32)       # (D, D)
        self.singulars_small = jnp.asarray(s, jnp.float32)  # (small,)
        big = np.outer(s, s).reshape(-1)
        self._singulars = jnp.asarray(big, jnp.float32)
        perm = np.asarray([img_dim * i + j for i in range(small) for j in range(small)]
                          + [img_dim * i + j for i in range(small)
                             for j in range(small, img_dim)], np.int64)
        self._perm = jnp.asarray(perm)

    def _mat_by_img(self, M, v, dim):
        b = v.shape[0]
        img = v.reshape(b * self.channels, dim, dim)
        return jnp.einsum("ij,njk->nik", M, img).reshape(b, self.channels,
                                                         M.shape[0], dim)

    def _img_by_mat(self, v, M, dim):
        b = v.shape[0]
        img = v.reshape(b * self.channels, dim, dim)
        return jnp.einsum("njk,kl->njl", img, M).reshape(b, self.channels,
                                                         dim, M.shape[1])

    def V(self, vec):
        b = vec.shape[0]
        x = vec.reshape(b, self.img_dim**2, self.channels)
        temp = jnp.zeros_like(x)
        np_len = self._perm.shape[0]
        temp = temp.at[:, self._perm, :].set(x[:, :np_len, :])
        # identity copy of the coordinates beyond the permutation (reference
        # svd_operators.py SRConv.V `temp[:, len(perm):] = vec[:, len(perm):]`)
        # — without it V is rank-deficient instead of orthogonal and
        # V(Vt(x)) zeroes (img_dim - small_dim) * img_dim coords per channel
        temp = temp.at[:, np_len:, :].set(x[:, np_len:, :])
        temp = temp.transpose(0, 2, 1)
        out = self._mat_by_img(self.V_small, temp.reshape(b, -1), self.img_dim)
        out = self._img_by_mat(out, self.V_small.T, self.img_dim)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        temp = self._mat_by_img(self.V_small.T, vec.reshape(b, -1), self.img_dim)
        temp = self._img_by_mat(temp, self.V_small, self.img_dim)
        temp = temp.reshape(b, self.channels, -1)
        temp = temp.at[:, :, :self._perm.shape[0]].set(temp[:, :, self._perm])
        return temp.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, self.small_dim**2, self.channels).transpose(0, 2, 1)
        out = self._mat_by_img(self.U_small, temp.reshape(b, -1), self.small_dim)
        out = self._img_by_mat(out, self.U_small.T, self.small_dim)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        temp = self._mat_by_img(self.U_small.T, vec.reshape(b, -1), self.small_dim)
        temp = self._img_by_mat(temp, self.U_small, self.small_dim)
        return temp.reshape(b, self.channels, -1).transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        return jnp.repeat(self._singulars[: self.small_dim**2], self.channels)

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], v.shape[1] * self.ratio**2), v.dtype)
        return out.at[:, :v.shape[1]].set(v)


# ---------------------------------------------------------------------------
# GeneralA (dense SVD), CS (block random projections), Walsh-Hadamard CS
# ---------------------------------------------------------------------------

class GeneralA(AFunctions):
    """Dense matrix via full SVD (reference :183-218)."""

    def __init__(self, A, ZERO=1e-3):
        A = np.asarray(A, np.float64)
        U, s, Vt = np.linalg.svd(A, full_matrices=True)
        s = np.where(s < ZERO, 0.0, s)
        self._Uj = jnp.asarray(U, jnp.float32)
        self._Vj = jnp.asarray(Vt.T, jnp.float32)
        self._singulars = jnp.asarray(s, jnp.float32)

    def _mv(self, M, vec):
        return jnp.einsum("ij,bj->bi", M, vec.reshape(vec.shape[0], -1))

    def V(self, vec):
        return self._mv(self._Vj, vec)

    def Vt(self, vec):
        return self._mv(self._Vj.T, vec)

    def U(self, vec):
        return self._mv(self._Uj, vec)

    def Ut(self, vec):
        return self._mv(self._Uj.T, vec)

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], self._Vj.shape[0]), v.dtype)
        return out.at[:, : self._Uj.shape[0]].set(v)


class CS(AFunctions):
    """Block-wise compressive sensing: random orthogonal projection per 32x32
    patch keeping a `ratio` fraction of coefficients (reference :111-181)."""

    def __init__(self, channels, img_dim, ratio, rng_seed=0):
        self.channels = channels
        self.img_dim = img_dim
        self.patch = 32
        self.y_dim = img_dim // self.patch
        rng = np.random.default_rng(rng_seed)
        A = rng.normal(size=(self.patch**2, self.patch**2))
        _, _, Vt = np.linalg.svd(A, full_matrices=True)
        self.V_small = jnp.asarray(Vt.T, jnp.float32)
        self.cs_size = int(self.patch**2 * ratio)
        self._singulars = jnp.ones(channels * self.y_dim**2 * self.cs_size, jnp.float32)

    def _img_to_patches(self, vec):
        b = vec.shape[0]
        img = vec.reshape(b, self.channels, self.img_dim, self.img_dim)
        p = img.reshape(b, self.channels, self.y_dim, self.patch,
                        self.y_dim, self.patch)
        p = p.transpose(0, 1, 2, 4, 3, 5)
        return p.reshape(b, self.channels * self.y_dim**2, self.patch**2)

    def _patches_to_img(self, patches):
        b = patches.shape[0]
        p = patches.reshape(b, self.channels, self.y_dim, self.y_dim,
                            self.patch, self.patch)
        p = p.transpose(0, 1, 2, 4, 3, 5)
        return p.reshape(b, self.channels * self.img_dim**2)

    def V(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, -1)
        npatch = self.channels * self.y_dim**2
        kept = temp[:, : npatch * self.cs_size].reshape(b, npatch, self.cs_size)
        rest = temp[:, npatch * self.cs_size:].reshape(b, npatch, -1)
        patches = jnp.concatenate([kept, rest], axis=-1)
        patches = jnp.einsum("ij,bpj->bpi", self.V_small, patches)
        return self._patches_to_img(patches)

    def Vt(self, vec):
        b = vec.shape[0]
        patches = self._img_to_patches(vec)
        patches = jnp.einsum("ji,bpj->bpi", self.V_small, patches)
        kept = patches[:, :, : self.cs_size].reshape(b, -1)
        rest = patches[:, :, self.cs_size:].reshape(b, -1)
        return jnp.concatenate([kept, rest], axis=-1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], self.channels * self.img_dim**2), v.dtype)
        return out.at[:, : v.shape[1]].set(v)


def fwht(a: jnp.ndarray) -> jnp.ndarray:
    """Fast Walsh-Hadamard transform over the last axis of a (m, n) array
    (self-inverse up to scale; the reference :222-232 normalises by
    img_dim = sqrt(n))."""
    m, n = a.shape
    h = 1
    while h < n:
        blk = a.reshape(m, n // (2 * h), 2, h)
        a = jnp.concatenate([blk[:, :, 0, :] + blk[:, :, 1, :],
                             blk[:, :, 0, :] - blk[:, :, 1, :]], axis=-1)
        a = a.reshape(m, n)
        h *= 2
    return a


class WalshHadamardCS(AFunctions):
    """Compressive sensing in the Walsh-Hadamard basis with a random
    coefficient permutation (reference :221-330)."""

    def __init__(self, channels, img_dim, ratio, perm):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        self.perm = jnp.asarray(np.asarray(perm, np.int64))
        self._inv_perm = jnp.asarray(np.argsort(np.asarray(perm)))
        self._singulars = jnp.ones(channels * img_dim**2 // ratio, jnp.float32)

    def _fwht(self, x):
        b = x.shape[0]
        a = x.reshape(b, self.channels, self.img_dim**2)
        out = fwht(a.reshape(b * self.channels, -1)) / self.img_dim
        return out.reshape(b, self.channels, self.img_dim**2)

    def V(self, vec):
        b = vec.shape[0]
        x = vec.reshape(b, -1, self.channels).transpose(0, 2, 1)
        temp = jnp.zeros((b, self.channels, self.img_dim**2), vec.dtype)
        temp = temp.at[:, :, self.perm].set(x)
        return self._fwht(temp).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        t = self._fwht(vec.reshape(b, self.channels, self.img_dim, self.img_dim)
                       .reshape(b, self.channels, -1))
        return t[:, :, self.perm].transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._singulars

    def add_zeros(self, vec):
        v = vec.reshape(vec.shape[0], -1)
        out = jnp.zeros((vec.shape[0], self.channels * self.img_dim**2), v.dtype)
        return out.at[:, : v.shape[1]].set(v)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        b = vec.shape[0]
        temp = self.Vt(vec)
        n = self.channels * self.img_dim**2
        lam, _, _ = _ddnm_factors(_pad_singulars(self._singulars, n),
                                  a, sigma_y, sigma_t, eta)
        return self.V(temp * lam[None, :])

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        b = vec.shape[0]
        n = self.channels * self.img_dim**2

        def reorder(x):
            t = x.reshape(b, self.channels, self.img_dim**2)[:, :, self.perm]
            return t.transpose(0, 2, 1).reshape(b, -1)

        _, d1, d2 = _ddnm_factors(_pad_singulars(self._singulars, n),
                                  a, sigma_y, sigma_t, eta)
        return self.V(reorder(vec) * d1[None, :]) + self.V(reorder(epsilon) * d2[None, :])


# ---------------------------------------------------------------------------
# pytree registration: device arrays as leaves so jitted samplers can take
# these operators as arguments (fresh per-image masks without retracing).
# ---------------------------------------------------------------------------

from free_hunch_tpu.operators.linear import register_operator_pytree  # noqa: E402

register_operator_pytree(Denoising, ("_singulars",))
register_operator_pytree(Inpainting, ("_perm", "_inv_perm", "_singulars"))
register_operator_pytree(SuperResolution, ("U_small", "singulars_small", "V_small"))
register_operator_pytree(Colorization, ("U_small", "singulars_small", "V_small"))
register_operator_pytree(Deblurring, ("U_small", "V_small", "_perm", "_inv_perm",
                                      "_singulars", "_singulars_orig"))
register_operator_pytree(Deblurring2D, ("U_small1", "V_small1", "U_small2",
                                        "V_small2", "_perm", "_inv_perm",
                                        "_singulars"))
register_operator_pytree(SRConv, ("U_small", "V_small", "singulars_small",
                                  "_singulars", "_perm"))
register_operator_pytree(GeneralA, ("_Uj", "_Vj", "_singulars"))
register_operator_pytree(CS, ("V_small", "_singulars"))
register_operator_pytree(WalshHadamardCS, ("perm", "_inv_perm", "_singulars"))
