"""Online denoiser-covariance estimation (the Free Hunch core) on TPU.

Parity: ``conditioning_utils/online_update_bfgs.py`` (CovarianceHessianBFGS
:7-337, CovarianceHessianBFGSDCT :339-374, dense reference math
``update_covariance:377`` / ``update_bfgs:414``).

Design notes (TPU-first):

* The state is ONE fixed-shape ``LowRank`` pytree: the denoiser covariance
  Sigma_0 in the chosen orthogonal basis. The reference maintains eight
  mutually-redundant objects (cov/inv/hessian/inv-hessian, each diag+U+V, plus
  CUDA mirrors); under the Gaussian-family consistency
  ``H = (Sigma_0 - sigma^2 I) / sigma^4`` all of them are *derivable* from
  Sigma_0 and sigma, and the derivations are two k x k Woodbury solves plus
  (d, K) matmuls — noise on the MXU next to a 0.25-TFLOP UNet forward. We
  verified the consistency is preserved by both update rules (see
  tests/test_covariance.py which checks against the reference's dense math).
* Time update ("sigma changed"): Sigma^-1 shifts by (1/s'^2 - 1/s^2) I; the
  transported score is H' H^-1 score and the transported denoiser mean is
  x + s'^2 score' (reference :153-192).
* Space update ("x changed", BFGS): appends the rank-2 update
  ``- (Sv)(Sv)^T / (dx^T S dx) + gamma de de^T`` as two columns with signed
  inner weights — no complex sqrt needed (reference :247-312).
* Everything is per-sample and pure; batching is ``jax.vmap`` over a leading
  axis (the reference asserts batch_size==1, :161,:255).

All functions operate on *flattened* (d,) vectors in the transform basis.
The basis itself (identity / DCT) is applied by the conditioning mechanism.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from free_hunch_tpu.ops import lowrank
from free_hunch_tpu.ops.lowrank import LowRank


class CovParams(NamedTuple):
    """Static hyper-parameters of the covariance model."""
    project_to_diagonal: bool = False
    # skip BFGS pairs with non-positive secant curvature (standard BFGS rule;
    # keeps Sigma_0 PSD). The reference appends unconditionally (:261-284) —
    # disable for bit-level A/B against it.
    curvature_guard: bool = True
    # Secant-novelty floor (active only with curvature_guard; 0 disables):
    # skip the pair when ||de - Sigma dx|| <= tau * max(||de||, ||Sigma dx||),
    # i.e. the state already satisfies the secant equation. The exact BFGS
    # update is then ZERO — appending it only stores a near-cancelling
    # +/- rank-1 pair with O(1/(dx^T Sigma dx)) inner weights whose f32
    # round-off random-walks the state. Measured on the linear-Gaussian
    # oracle: at 80 Heun steps the sigma in (5,10) pairs are all
    # no-information (the time-updated state is already exact there) and
    # without this guard the run diverges (max|x| 6 -> 480); see
    # tests/test_linear_gaussian_oracle.py and design.md §8.
    secant_novelty_min: float = 0.02


def init_state(init_denoiser_variance: jnp.ndarray, data_dim: int, capacity: int,
               dtype=None) -> LowRank:
    """Fresh covariance state: Sigma_0 = diag(init_denoiser_variance).

    ``init_denoiser_variance`` is a scalar (identity basis) or a (d,) vector
    (DCT basis loaded from dct_variance); reference :12-37. The state dtype
    follows the input unless ``dtype`` is given explicitly.
    """
    v = jnp.asarray(init_denoiser_variance)
    if dtype is None:
        dtype = v.dtype if jnp.issubdtype(v.dtype, jnp.floating) else jnp.float32
    diag = jnp.broadcast_to(v.astype(dtype), (data_dim,)).copy()
    return lowrank.init(diag, capacity)


def hessian(cov: LowRank, sigma) -> LowRank:
    """H = (Sigma_0 - sigma^2 I) / sigma^4 (reference :29,:294)."""
    return lowrank.affine(cov, 1.0 / sigma**4, -1.0 / sigma**2)


def cov_matvec(cov: LowRank, v: jnp.ndarray) -> jnp.ndarray:
    """Sigma_0 @ v (reference ``denoiser_cov_vector_dot`` :194-204)."""
    return lowrank.matvec(cov, v)


def inv_cov_matvec(cov: LowRank, v: jnp.ndarray) -> jnp.ndarray:
    return lowrank.matvec(lowrank.inverse(cov), v)


def hessian_matvec(cov: LowRank, sigma, v: jnp.ndarray) -> jnp.ndarray:
    return lowrank.matvec(hessian(cov, sigma), v)


def inv_hessian_matvec(cov: LowRank, sigma, v: jnp.ndarray) -> jnp.ndarray:
    return lowrank.matvec(lowrank.inverse(hessian(cov, sigma)), v)


def time_update(cov: LowRank, sigma, sigma_next) -> LowRank:
    """Move Sigma_0 from noise level sigma to sigma_next.

    Sigma^-1(s') = Sigma^-1(s) + (s'^-2 - s^-2) I  (reference :166-168).
    """
    inv = lowrank.inverse(cov)
    inv = lowrank.shift_diag(inv, 1.0 / sigma_next**2 - 1.0 / sigma**2)
    return lowrank.inverse(inv)


def transport_score(cov: LowRank, cov_next: LowRank, sigma, sigma_next,
                    x: jnp.ndarray, score: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic transport of (denoiser mean, score) to the new noise level.

    score' = H(s') H(s)^-1 score;  mean' = x + s'^2 score'
    (reference :170-181).

    Stability redesign: the reference evaluates the product as two separate
    near-singular operators — H(s) = (Sigma - s^2 I)/s^4 crosses ZERO on any
    eigen-direction whose prior variance equals s^2 (guaranteed to happen
    along the schedule with the dct_diagonal prior, whose eigenvalues span
    ~8 orders of magnitude), so H^-1 blows up and the product is computed as
    inf * 0; complex128 merely hides this (online_update_bfgs.py:153-192).
    In Sigma's eigenbasis the composition telescopes exactly:

        (s^4/s'^4) (p' - s'^2)/(p - s^2) = (s^2/s'^2) / (1 + a p),
        a = 1/s'^2 - 1/s^2,   p' = 1/(1/p + a)

    — the (p - s^2) singularity cancels algebraically. So

        H(s') H(s)^-1 = (s^2/s'^2) (I + a Sigma)^-1,

    which for s' < s is SPD with eigenvalues in (0, 1]: perfectly
    conditioned, f32-safe, and evaluated with one Woodbury inverse of the
    low-rank form. ``cov_next`` is retained in the signature for parity with
    the two-state call sites but is not needed.
    """
    del cov_next
    a = 1.0 / sigma_next**2 - 1.0 / sigma**2
    op = lowrank.inverse(lowrank.affine(cov, a, 1.0))  # (I + a Sigma)^-1
    score_next = (sigma**2 / sigma_next**2) * lowrank.matvec(op, score)
    mean_next = x + sigma_next**2 * score_next
    return mean_next, score_next


def transport_score_two_inverse(cov: LowRank, cov_next: LowRank, sigma,
                                sigma_next, x: jnp.ndarray, score: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-identical two-inverse transport (A/B fidelity mode).

    Computes score' = H(s') H(s)^-1 score literally the reference's way
    (online_update_bfgs.py:170-181): H^-1 via Woodbury on the low-rank form,
    H^-1(s') = H^-1(s) - (s'^2 - s^2) I, then one more Woodbury inverse.
    Algebraically equal to :func:`transport_score`'s telescoped SPD form, but
    numerically it evaluates the product through two near-singular operators
    — H(s) crosses zero along any eigendirection whose variance equals s^2 —
    and loses ~5 digits with the real dct prior
    (docs/diag_space_divergence.json: 2.7e-5 vs the scalar-exact oracle,
    where the telescoped form sits at 1.3e-6 = the f32-DCT floor).

    Kept ONLY so the reference A/B can match the reference's rounding
    behaviour (seed differences then collapse to f64-vs-c128 rounding instead
    of formula conditioning); production uses the telescoped form.
    """
    del cov_next
    ih = lowrank.inverse(hessian(cov, sigma))
    ih_next = lowrank.shift_diag(ih, -(sigma_next**2 - sigma**2))
    h_next = lowrank.inverse(ih_next)
    score_next = lowrank.matvec(h_next, lowrank.matvec(ih, score))
    mean_next = x + sigma_next**2 * score_next
    return mean_next, score_next


def space_update(cov: LowRank, sigma, x: jnp.ndarray, x_next: jnp.ndarray,
                 mean_at_x: jnp.ndarray, mean_at_x_next: jnp.ndarray,
                 params: CovParams = CovParams()) -> LowRank:
    """BFGS rank-2 update of Sigma_0 after observing the denoiser at two points
    with the same sigma (reference :250-312).

    Sigma <- Sigma - (S dx)(S dx)^T / (dx^T S dx) + de de^T / (dx^T de),
    with de = sigma^2 (D(x') - D(x)), dx = x' - x.
    """
    dtype = x.dtype
    dx = x_next - x
    de = sigma**2 * (mean_at_x_next - mean_at_x)
    sv = lowrank.matvec(cov, dx)
    tiny = jnp.finfo(dtype).tiny
    dxsv = jnp.sum(dx * sv)
    dxde = jnp.sum(dx * de)
    if params.curvature_guard:
        # Curvature guard (robustness addition over the reference, which
        # appends unconditionally :261-284): the BFGS update is only applied
        # when the secant curvature dx.de and the current quadratic form
        # dx.S.dx are positive; otherwise the pair is noise-dominated and
        # would make Sigma_0 indefinite. Skipping such pairs is the standard
        # BFGS rule.
        valid = jnp.logical_and(dxde > tiny, dxsv > tiny)
        if params.secant_novelty_min > 0:
            # no-information pairs (state already satisfies the secant):
            # the exact update is zero — appending it only injects round-off
            res2 = jnp.sum((de - sv) ** 2)
            floor2 = params.secant_novelty_min ** 2 * jnp.maximum(
                jnp.sum(de * de), jnp.sum(sv * sv))
            valid = jnp.logical_and(valid, res2 > floor2)
    else:
        # reference behaviour: append regardless of sign (only exact zeros
        # are skipped — they would divide to inf)
        valid = jnp.logical_and(jnp.abs(dxde) > tiny, jnp.abs(dxsv) > tiny)
    c_neg = jnp.where(valid, -1.0 / jnp.where(valid, dxsv, 1.0), 0.0)
    gamma = jnp.where(valid, 1.0 / jnp.where(valid, dxde, 1.0), 0.0)
    if params.project_to_diagonal:
        # Reference :274-277: fold the rank-2 update into the diagonal.
        new_diag = cov.diag + gamma * de * de + c_neg * sv * sv
        return cov._replace(diag=new_diag)
    return jax.lax.cond(
        valid,
        lambda c: lowrank.append_pair(c, sv, c_neg, de, gamma),
        lambda c: c, cov)


# ---------------------------------------------------------------------------
# Dense reference implementations (used by the equivalence tests; mirrors the
# semantics of the reference's update_covariance:377 / update_bfgs:414).
# ---------------------------------------------------------------------------

def dense_time_update(cov, inv_cov, hess, inv_hess, score, x, sigma, sigma_next):
    d = cov.shape[-1]
    eye = jnp.eye(d, dtype=cov.dtype)
    new_inv_cov = inv_cov + (sigma_next**-2 - sigma**-2) * eye
    new_cov = jnp.linalg.inv(new_inv_cov)
    new_inv_hess = inv_hess - (sigma_next**2 - sigma**2) * eye
    new_hess = jnp.linalg.inv(new_inv_hess)
    new_score = new_hess @ (inv_hess @ score)
    new_mean = x + sigma_next**2 * new_score
    return new_cov, new_inv_cov, new_hess, new_inv_hess, new_score, new_mean


def dense_space_update(cov, inv_cov, sigma, x, dx, mean_at_x, mean_at_x_next):
    d = cov.shape[-1]
    eye = jnp.eye(d, dtype=cov.dtype)
    de = sigma**2 * (mean_at_x_next - mean_at_x)
    gamma = 1.0 / (dx @ de)
    new_cov = (cov - jnp.outer(cov @ dx, dx @ cov) / (dx @ cov @ dx)
               + jnp.outer(de, de) * gamma)
    new_inv_cov = ((eye - jnp.outer(dx, de) * gamma) @ inv_cov
                   @ (eye - jnp.outer(de, dx) * gamma) + jnp.outer(dx, dx) * gamma)
    new_hess = (new_cov / sigma**2 - eye) / sigma**2
    new_inv_hess = jnp.linalg.inv(new_hess + 1e-10 * eye)
    return new_cov, new_inv_cov, new_hess, new_inv_hess
