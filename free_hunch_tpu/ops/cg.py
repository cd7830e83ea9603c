"""Batched preconditioned conjugate gradients as a masked ``lax.while_loop``.

Parity: reference ``conditioning_utils/cg.py`` (``cg_batch:5``, ``cg:118``,
autograd ``CG:294``). TPU redesign:

* one ``while_loop`` drives the whole batch; converged samples are frozen with
  ``where`` masks instead of exiting (data-dependent exit per sample is not
  expressible under jit, and freezing costs nothing on the VPU),
* the matvec is a user closure over arbitrarily-shaped states — internally
  everything is flattened to (batch, n),
* ``cg_solve`` wraps the loop in ``lax.custom_linear_solve`` so the solve
  differentiates implicitly (CG is its own adjoint for symmetric A), replacing
  the reference's ``torch.autograd.Function``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax


class CGInfo(NamedTuple):
    niter: jnp.ndarray          # () int32 — iterations actually run
    residual_norm: jnp.ndarray  # (batch,) ||Ax - b|| of the RETURNED iterate
    #                             (best-tracked, or the last iterate's when
    #                             track_best=False)
    optimal: jnp.ndarray        # (batch,) bool — returned iterate reached the
    #                             rtol/atol stop (stall/breakdown-frozen rows
    #                             report False)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cg_batch(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
             precond: Optional[Callable] = None, rtol=1e-3, atol=0.0,
             maxiter: int = 1000, stall_iters: int = 25, min_iter: int = 0,
             track_best: bool = True, stall_engage: float = 0.5,
             stall_floor_check: bool = True):
    """Solve A x = b per batch row with CG.

    matvec: (batch, n) -> (batch, n), must apply a symmetric PSD A per row.
    rtol/atol: scalars or (batch,) arrays; row i stops when
      ||r_i|| <= max(rtol_i * ||b_i||, atol_i).

    Stagnation detection: a row also stops after ``stall_iters`` consecutive
    iterations without residual improvement. The reference rtol schedule asks
    for up to 1e-14 at small sigma (conditioning_mechanisms.py:307-323) —
    unreachable in f32, where the reference torch CG burns its full
    maxiter=5000 budget at the numerical floor; detecting the floor keeps the
    same final accuracy at a fraction of the iterations. The counter only
    engages once the row's best residual has dropped below
    ``stall_engage * ||b||``: CG's 2-norm residual is NON-monotone (only the
    A-norm error is), and on ill-conditioned systems it can plateau or grow
    for dozens of iterations while the solve is still in its pre-convergence
    phase — freezing there would return a garbage iterate (observed on
    super-resolution systems with the network's per-pixel x0 variance,
    dynamic range ~1e8). A plateau below the engage threshold is the f32
    floor; a plateau above it means "keep iterating".

    stall_floor_check (default True): when the stall counter fires, PROVE
    the floor before freezing. On ill-conditioned systems (the motion-blur
    PSF spectrum is near-singular, sigma_s -> 0) CG's real convergence rate
    drops below the 0.1%/iteration the fixed threshold expects, and its
    non-monotone 2-norm residual plateaus for O(sqrt(kappa)) iterations
    while the A-norm error still falls — an unconditional freeze there
    returns a far-from-converged iterate (measured as a 1.97 dB PSNR gap on
    motion blur at default knobs,
    docs/ab_reference_64_motion_blur_covgrad_*.json; the reference torch CG,
    cg.py:118-292, never truncates and converges). The check costs ONE extra
    matvec per firing (>= stall_iters iterations apart, <= 1/25 = 4%
    overhead): compute the TRUE residual b - Ax and freeze only if
    (a) it is at the dtype's rounding floor, true <= 10*eps*(||Ax|| + ||b||)
        — no further progress is representable; or
    (b) it has decoupled from the recurrence residual, |true - rec| >
        0.5*true — the classical attainable-accuracy limit: once
        accumulated rounding dominates the recurrence, further iterations
        no longer reduce the true residual (Greenbaum).
    Otherwise the plateau is CG doing its job slowly: the counter resets
    and the solve continues (to the rtol stop or maxiter — the reference's
    own worst-case behaviour, minus the floor iterations it burns).

    min_iter: run at least this many iterations even for rows whose initial
    residual already satisfies the tolerance. The reference torch CG
    (cg.py:118-292) has NO pre-loop convergence check — it always performs
    one update before testing — which is observable whenever rtol is loose
    (the schedule gives rtol=1.0 at sigma_max); min_iter=1 reproduces that.

    Returns (x, CGInfo) where x is the BEST-residual iterate, not the last:
    on an indefinite system (the estimated covariance can transiently lose
    PSD-ness) CG residuals diverge, and the reference returns whatever the
    last iterate was; tracking the best costs one extra buffer and strictly
    dominates (identical to last-iterate whenever CG converges monotonically).

    track_best=False returns the LAST iterate per row instead (each row's x
    at the moment it froze) — the reference's exact semantics, needed for
    bit-level A/B at loose rtol where residuals are non-monotone and the
    best-vs-last choice picks different iterates from the same CG path.
    """
    dtype = b.dtype
    batch = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda v: v
    rtol = jnp.broadcast_to(jnp.asarray(rtol, dtype), (batch,))
    atol = jnp.broadcast_to(jnp.asarray(atol, dtype), (batch,))

    b_norm = jnp.sqrt(_dot(b, b))
    stop = jnp.maximum(rtol * b_norm, atol)

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = _dot(r0, z0)
    res0 = jnp.sqrt(_dot(r0, r0))

    def cond(state):
        x, r, p, rz, i, active, best, stall, bx = state
        return jnp.logical_and(
            i < maxiter, jnp.logical_or(jnp.any(active), i < min_iter))

    def body(state):
        x, r, p, rz, i, active, best, stall, bx = state
        # forced rows participate in the update even though their residual
        # already satisfies the tolerance (reference has no pre-loop check)
        act = jnp.logical_or(active, i < min_iter)
        ap = matvec(p)
        pap = _dot(p, ap)
        # p^T A p breakdown rows take NO step this iteration (alpha=0) before
        # freezing below — the reference torch CG breaks out BEFORE applying
        # the update (cg.py:250-259); committing a near-breakdown alpha ~
        # rz/1e-20 first would poison the last iterate track_best=False
        # returns. The test is fully SCALE-INVARIANT (in both p and A):
        # pap <= eps·||p||·||Ap|| flags directions where p and Ap are
        # numerically orthogonal (for a healthy SPD system the cosine is
        # >= 1/kappa, so this only trips past kappa ~ 1e16 — where CG cannot
        # progress anyway). The reference's absolute 1e-16 would falsely trip
        # on our unit-scale f32/f64 solves converging to tight rtol
        # (pap ~ lambda·||r||² -> 0), and a ||p||²-relative test would
        # falsely trip on well-conditioned systems of tiny absolute scale.
        breakdown = pap <= 1e-16 * jnp.sqrt(_dot(p, p) * _dot(ap, ap))
        alpha = jnp.where(breakdown, 0.0,
                          rz / jnp.maximum(pap, jnp.finfo(dtype).tiny))
        m = act[:, None].astype(dtype)
        x = x + m * alpha[:, None] * p
        r = r - m * alpha[:, None] * ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, jnp.finfo(dtype).tiny)
        p = jnp.where(act[:, None], z + beta[:, None] * p, p)
        res = jnp.sqrt(_dot(r, r))
        improved = res < 0.999 * best
        # during forced iterations the current iterate is taken
        # unconditionally (the reference returns its first iterate even when
        # the residual worsened); best-tracking engages after min_iter
        forced = i < min_iter
        take = jnp.logical_or(forced,
                              jnp.logical_and(res < best, jnp.isfinite(res)))
        bx = jnp.where(take[:, None], x, bx)
        best = jnp.where(forced, res, jnp.minimum(best, res))
        # stall counts only in the converging regime (see docstring) — a
        # no-improvement streak while best >= stall_engage*||b|| is CG's
        # normal pre-convergence residual oscillation, not a floor
        engaged = best < stall_engage * b_norm
        stall = jnp.where(jnp.logical_and(~improved, engaged), stall + 1, 0)
        stall_hit = stall >= stall_iters
        if stall_floor_check:
            # prove the floor before freezing (see docstring): one extra
            # matvec, run only when some active row's counter fired
            eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

            def run_check(_):
                ax = matvec(x)
                true_r = b - ax
                true_res = jnp.sqrt(_dot(true_r, true_r))
                ax_norm = jnp.sqrt(_dot(ax, ax))
                at_floor = true_res <= 10.0 * eps * (ax_norm + b_norm)
                decoupled = jnp.abs(true_res - res) > 0.5 * true_res
                return jnp.logical_or(at_floor, decoupled)

            need = jnp.any(jnp.logical_and(stall_hit, act))
            floor = lax.cond(need, run_check,
                             lambda _: jnp.ones((batch,), bool), None)
            # window hit but NOT at a provable floor: a plateau, keep going
            stall = jnp.where(jnp.logical_and(stall_hit, ~floor), 0, stall)
            frozen = jnp.logical_and(stall_hit, floor)
        else:
            frozen = stall_hit
        active = jnp.logical_and(act, res > stop)
        active = jnp.logical_and(active, jnp.logical_not(frozen))
        # freeze rows whose residual went non-finite (breakdown guard)
        active = jnp.logical_and(active, jnp.isfinite(res))
        # p^T A p breakdown: CG cannot progress on this row (the reference
        # torch CG breaks out on its version of this test, cg.py:250-251)
        active = jnp.logical_and(active, jnp.logical_not(breakdown))
        return x, r, p, rz_new, i + 1, active, best, stall, bx

    active0 = res0 > stop
    stall0 = jnp.zeros((batch,), jnp.int32)
    x, r, p, rz, niter, active, best, stall, bx = lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32), active0,
                     res0, stall0, x0))
    # residual of the RETURNED iterate: best-tracked for bx, the final
    # ||r|| for the last iterate (they differ when residuals are non-monotone)
    ret_res = best if track_best else jnp.sqrt(_dot(r, r))
    # 'optimal' means the returned iterate actually reached the tolerance —
    # rows frozen by stall detection / pap breakdown / non-finite residuals
    # are NOT converged (the reference sets optimal=False on those exits too)
    return (bx if track_best else x), CGInfo(
        niter=niter, residual_norm=ret_res, optimal=ret_res <= stop)


def cg(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
       precond: Optional[Callable] = None, rtol=1e-3, atol=0.0, maxiter: int = 1000):
    """Single-system CG on an arbitrarily-shaped b; matvec keeps b's shape."""
    shape = b.shape
    flat_mv = lambda v: matvec(v.reshape((1,) + shape)[0]).reshape(1, -1)
    x, info = cg_batch(flat_mv, b.reshape(1, -1), x0=None if x0 is None else x0.reshape(1, -1),
                       precond=None if precond is None else
                       (lambda v: precond(v.reshape((1,) + shape)[0]).reshape(1, -1)),
                       rtol=rtol, atol=atol, maxiter=maxiter)
    return x.reshape(shape), info


def cg_solve(matvec: Callable, b: jnp.ndarray, rtol=1e-5, maxiter: int = 1000) -> jnp.ndarray:
    """Differentiable symmetric solve: gradients flow via a transposed CG solve
    (``lax.custom_linear_solve(symmetric=True)``)."""
    def solve(mv, rhs):
        x, _ = cg(mv, rhs, rtol=rtol, maxiter=maxiter)
        return x

    return lax.custom_linear_solve(matvec, b, solve=solve, symmetric=True)
