"""Conditioning mechanisms: x0_mean <- x0_mean + sigma^2 * grad log p(y | x_t).

Parity: reference ``conditioning_utils/conditioning_mechanisms.py`` — the
factory ``choose_conditioning_mechanism:16`` and the eight mechanisms
DPS:52, PengConvert:65, PengAnalytic:87, TMPD:112, PiGDM:134,
PiGDM_Videodiff_schedule:154, DiffPIR:173, BFGSOnlineUpdate:190 (the paper's
``online_covariance``).

TPU redesign:

* every mechanism is a pure function of (denoise_fn, x_t, y, sigma, state):
  jittable, vmappable, usable inside a ``lax.scan`` sampler step. The
  reference's Python history lists (``self.sigmas/xs/denoiser_means``,
  :216-292) become an explicit fixed-shape ``FreeHunchState`` carry,
* guidance gradients are ``jax.vjp`` pullbacks through the denoiser — one
  forward + one cotangent application (the reference re-runs autograd.grad),
* all data-dependent branching (sigma changed? x changed? sigma below the
  analytic-variance threshold?) is ``lax.cond``/``where`` — static config
  flags branch in Python at trace time,
* everything carries a leading batch axis; the covariance state batches via
  ``vmap`` (the reference asserts batch size 1).

The denoiser covariance model operates in an orthogonal basis: identity
('identity') or 2-D DCT with the dataset variance prior ('dct_diagonal' /
'dct_diagonal_noinfo'), reference ``online_update_bfgs.py:339-374``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.guidance import covariance as cov_mod
from free_hunch_tpu.guidance.solvers import RTOL_F32_FLOOR, choose_solver
from free_hunch_tpu.operators import assets
from free_hunch_tpu.ops.dct import dct_2d, idct_2d
from free_hunch_tpu.ops.lowrank import LowRank


def choose_conditioning_mechanism(name: str):
    table = {
        "dps": DPS,
        "pigdm": PiGDM,
        "pigdm_videodiff_schedule": PiGDMVideodiffSchedule,
        "online_covariance": FreeHunch,
        "peng_convert": PengConvert,
        "peng_analytic": PengAnalytic,
        "tmpd": TMPD,
        "diffpir": DiffPIR,
    }
    if name == "ddnm":
        raise ValueError("ddnm runs through the dedicated DDNM+ sampler "
                         "(free_hunch_tpu.samplers.ddnm), not a conditioning mechanism")
    if name not in table:
        raise ValueError(f"Unknown conditioning mechanism: {name}")
    return table[name]


class EmptyState(NamedTuple):
    """Carry for stateless mechanisms. ``cg_niter``/``cg_resnorm``/
    ``cg_optfrac`` record the most recent guidance solve's iteration count,
    mean final residual and converged-row fraction (the reference computes
    but discards its torch-CG info dict, cg.py:116)."""
    step: jnp.ndarray       # () int32
    cg_niter: jnp.ndarray   # () int32 — iterations of the last mat solve
    cg_resnorm: jnp.ndarray  # () f32 — batch-mean final residual norm
    cg_optfrac: jnp.ndarray  # () f32 — fraction of rows converged to rtol


def _empty_state() -> EmptyState:
    return EmptyState(step=jnp.asarray(0, jnp.int32),
                      cg_niter=jnp.asarray(0, jnp.int32),
                      cg_resnorm=jnp.asarray(0.0, jnp.float32),
                      cg_optfrac=jnp.asarray(1.0, jnp.float32))


def _record_cg(state, info):
    """Stamp a solve's CGInfo onto the mechanism state."""
    return state._replace(cg_niter=jnp.asarray(info.niter, jnp.int32),
                          cg_resnorm=jnp.mean(info.residual_norm)
                          .astype(jnp.float32),
                          cg_optfrac=jnp.mean(info.optimal.astype(jnp.float32)))


@dataclasses.dataclass(frozen=True)
class ConditioningMechanism:
    """Base: clips the updated x0_mean to [-1, 1] when configured
    (reference ConditioningMechanism:38-50)."""
    cond_scaling: float
    forward_operator: object
    clip_x0_mean: bool = False
    pigdm_posthoc_scaling: bool = False
    max_rtol: float = 1.0
    use_rtol_func: bool = False
    cg_maxiter: Optional[int] = None

    def init_state(self, batch: int, img_shape: Tuple[int, ...]):
        return _empty_state()

    def __call__(self, denoise: Callable, x_t, y, sigma, state):
        x0_new, state = self.x0_mean_update(denoise, x_t, y, sigma, state)
        if self.clip_x0_mean:
            x0_new = jnp.clip(x0_new, -1.0, 1.0)
        return x0_new, state

    def _bump(self, state):
        return state._replace(step=state.step + 1)

    def _solve_and_guide(self, x0, pullback, y, sigma, state, theta0_var,
                         scale=None, **solver_kw):
        """Shared stateless-mechanism tail (reference :83,:108,:130,:149):
        solve ``(A C A^T + sigma_s^2 I) u = y - A x0`` for ``mat = A^T u``,
        pull the guidance gradient back through the denoiser, apply
        ``x0 + grad * scale * sigma^2``, and record the solve on the state."""
        mat, info = choose_solver(self.forward_operator, y, x0,
                                  theta0_var=theta0_var, method="scipy",
                                  max_rtol=self.max_rtol,
                                  maxiter=self.cg_maxiter, return_info=True,
                                  **solver_kw)
        grad = pullback(jax.lax.stop_gradient(mat))
        s = self.cond_scaling if scale is None else scale
        return x0 + grad * s * sigma**2, _record_cg(self._bump(state), info)


def _denoise_with_vjp(denoise, x_t, sigma):
    """One forward through the denoiser; returns (x0_mean, x0_var, pullback)
    where pullback(ct) = d(ct . x0_mean)/d x_t. Replaces the reference's
    ``torch.autograd.grad((mat * x_0_mean).sum(), x_t)`` pattern. The variance
    output rides along as vjp aux so it is not differentiated."""
    x0, pullback, x0_var = jax.vjp(lambda x: denoise(x, sigma), x_t, has_aux=True)
    return x0, x0_var, (lambda ct: pullback(ct)[0])


@dataclasses.dataclass(frozen=True)
class DPS(ConditioningMechanism):
    """Diffusion posterior sampling: likelihood gradient of ||y - A x0(x_t)||
    (reference DPS:52-63). cond_scaling = zeta."""

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        def norm_fn(x):
            x0, _ = denoise(x, sigma)
            diff = y - self.forward_operator.forward(x0, noiseless=True)
            # per-sample norms summed: batch samples stay independent
            norms = jnp.sqrt(jnp.sum(diff.reshape(diff.shape[0], -1) ** 2, axis=-1))
            return jnp.sum(norms), x0

        (_, x0), g = jax.value_and_grad(norm_fn, has_aux=True)(x_t)
        x0_new = x0 - self.cond_scaling * g * sigma**2
        return x0_new, self._bump(state)


@dataclasses.dataclass(frozen=True)
class PiGDM(ConditioningMechanism):
    """Pseudo-inverse guided diffusion with MLE variance sigma^2/(1+sigma^2)
    (reference PiGDM:134-152)."""

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, _, pullback = _denoise_with_vjp(denoise, x_t, sigma)
        x0_var = sigma**2 / (1 + sigma**2)
        scale = (x0_var if self.pigdm_posthoc_scaling else 1.0) * self.cond_scaling
        return self._solve_and_guide(x0, pullback, y, sigma, state, x0_var,
                                     scale=scale)


@dataclasses.dataclass(frozen=True)
class PiGDMVideodiffSchedule(ConditioningMechanism):
    """PiGDM with the videodiff variance schedule x0_var = sigma^2
    (reference :154-171)."""

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, _, pullback = _denoise_with_vjp(denoise, x_t, sigma)
        return self._solve_and_guide(x0, pullback, y, sigma, state, sigma**2)


@dataclasses.dataclass(frozen=True)
class PengConvert(ConditioningMechanism):
    """Peng et al. 'convert' posterior covariance: the network's learned
    per-pixel x0 variance below the MLE threshold, sigma^2/(1+sigma^2) above
    (reference PengConvert:65-85)."""
    mle_sigma_thres: float = 0.2

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, x0_var, pullback = _denoise_with_vjp(denoise, x_t, sigma)
        mle_var = sigma**2 / (1 + sigma**2)
        var = jnp.where(sigma < self.mle_sigma_thres, x0_var,
                        jnp.broadcast_to(mle_var, x0_var.shape))
        return self._solve_and_guide(x0, pullback, y, sigma, state, var)


@dataclasses.dataclass(frozen=True)
class PengAnalytic(ConditioningMechanism):
    """Peng et al. 'analytic': per-sigma average reconstruction MSE from the
    bundled recon_mse table below the threshold (reference PengAnalytic:87-110)."""
    mle_sigma_thres: float = 0.2
    dataset: str = "imagenet"

    def _table(self):
        t = assets.recon_mse(self.dataset)
        return jnp.asarray(t["sigmas"], jnp.float32), jnp.asarray(t["mse_list"], jnp.float32)

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, _, pullback = _denoise_with_vjp(denoise, x_t, sigma)
        sigmas, mses = self._table()
        idx = jnp.argmin(jnp.abs(sigmas - sigma))
        var = jnp.where(sigma < self.mle_sigma_thres, mses[idx],
                        sigma**2 / (1 + sigma**2))
        return self._solve_and_guide(x0, pullback, y, sigma, state, var)


@dataclasses.dataclass(frozen=True)
class TMPD(ConditioningMechanism):
    """Tweedie moment-projected diffusion: per-pixel variance from the row
    sums of the denoiser Jacobian, sigma^2 * d(sum x0)/dx_t
    (reference TMPD:112-132). One vjp serves both the variance probe and the
    guidance gradient (the reference runs the network twice)."""

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, _, pullback = _denoise_with_vjp(denoise, x_t, sigma)
        x0_var = pullback(jnp.ones_like(x0)) * sigma**2
        return self._solve_and_guide(x0, pullback, y, sigma, state,
                                     jax.lax.stop_gradient(x0_var),
                                     sigma_t=sigma, use_rtol_func=True)


@dataclasses.dataclass(frozen=True)
class DiffPIR(ConditioningMechanism):
    """Plug-and-play data proximal step: x0 + var * mat with var = sigma^2/lambda
    (reference DiffPIR:173-186). No gradient through the network."""
    diffpir_lambda: float = 10.0

    def x0_mean_update(self, denoise, x_t, y, sigma, state):
        x0, _ = denoise(x_t, sigma)
        x0_var = sigma**2 / self.diffpir_lambda
        mat, info = choose_solver(self.forward_operator, y, x0, theta0_var=x0_var,
                                  method="scipy", max_rtol=self.max_rtol,
                                  maxiter=self.cg_maxiter, return_info=True)
        return x0 + mat * x0_var, _record_cg(self._bump(state), info)


# ---------------------------------------------------------------------------
# Free Hunch (the paper's contribution)
# ---------------------------------------------------------------------------

class FreeHunchState(NamedTuple):
    """Scan carry for the online covariance mechanism. ``cov`` leaves have a
    leading batch axis; prev_* mirror the reference's history lists (:216-218)
    truncated to the single step they actually consult (:241-263). ``prev_u``
    carries the previous stage's measurement-space CG solution for
    cg_warm_start='prev' (dead zeros in the reference-semantics 'b' mode)."""
    cov: LowRank
    prev_sigma: jnp.ndarray   # () f32
    prev_x: jnp.ndarray       # (B, C, H, W)
    prev_mean: jnp.ndarray    # (B, C, H, W)
    prev_u: jnp.ndarray       # (B, *measurement_shape)
    step: jnp.ndarray         # () int32
    cg_niter: jnp.ndarray     # () int32 — iterations of the last mat solve
    cg_resnorm: jnp.ndarray   # () f32 — batch-mean final residual norm
    cg_optfrac: jnp.ndarray   # () f32 — fraction of rows converged to rtol


@dataclasses.dataclass(frozen=True)
class FreeHunch(ConditioningMechanism):
    """Online denoiser-covariance guidance (reference BFGSOnlineUpdate:190-294).

    Per call: (optional) time update of the covariance to the new sigma with
    analytic transport of the previous denoiser mean, (optional, gated) BFGS
    space update from the pair of denoiser evaluations, then the tailored CG
    solve against Sigma_0 and a vjp pullback of `mat` through the UNet, with
    the large-gradient fallback replacing the vjp by Sigma_0 mat / sigma^2.
    """
    image_base_covariance: str = "identity"   # identity | dct_diagonal | dct_diagonal_noinfo
    init_denoiser_variance: float = 1.0
    init_noise_variance: float = 1.0          # sigma(t_0)^2
    data_dim: int = 0
    cov_capacity: int = 128
    max_vector_count: int = 100000
    project_to_diagonal: bool = False
    do_space_updates: bool = True
    use_analytical_score_time_update: bool = True
    space_step_update_threshold: float = 10.0
    space_step_update_lower_threshold: float = 1.0
    denoiser_mean_error_threshold: float = 0.2
    use_analytic_var_at_end: bool = False
    mle_sigma_thres: float = 0.2
    solver_type: str = "customcuda"
    data_dir: Optional[str] = None
    dataset: str = "imagenet"
    # Fourier/Jacobi-diagonal CG preconditioning (an improvement the
    # reference lacks). At convergence the solution is unchanged; iterates at
    # loose rtol (large sigma) differ — disable for bit-level reference A/B.
    cg_precondition: bool = True
    # consecutive non-improving CG iterations before a row is frozen at its
    # best iterate (the reference has no stall detection and burns maxiter
    # at the f32-unreachable rtol floor); raise for bit-level reference A/B
    cg_stall_iters: int = 25
    # return the best-residual CG iterate (robustness improvement; strictly
    # dominates when residuals diverge). The reference returns the LAST
    # iterate — at loose rtol on an ill-conditioned system the two pick
    # different points of the same CG path; disable for bit-level A/B.
    cg_track_best: bool = True
    # skip BFGS pairs with non-positive secant curvature (standard BFGS rule,
    # keeps Sigma_0 PSD; the reference appends unconditionally) — disable for
    # bit-level reference A/B
    bfgs_curvature_guard: bool = True
    # skip BFGS pairs the state already explains (||de - Sigma dx|| below
    # this fraction of the secant magnitude): the exact update is zero and
    # appending only stores a near-cancelling +/- pair whose round-off
    # random-walks the state (diverges at fine step counts — measured on the
    # linear-Gaussian oracle, design.md §8). Active only with the curvature
    # guard; 0 disables (reference A/B).
    bfgs_secant_novelty_min: float = 0.02
    # Elementwise bound on the guidance update sigma^2 * grad (robustness
    # knob): a near-singular estimated covariance can make one CG solve blow
    # up a single chain; bounding the per-call update keeps that chain sane
    # without affecting well-behaved ones. None = reference behaviour.
    guidance_update_bound: Optional[float] = None
    # Bound on the analytically-transported denoiser mean (robustness knob):
    # the transport H' H^-1 can blow up when the estimated Sigma_0 approaches
    # sigma^2 I (H singular). A real image denoiser clamps its outputs to
    # [-1, 1], so bounding the transported surrogate to the same range is
    # consistent; the reference leaves it unbounded (a clip at :245 is
    # commented out upstream). None = reference behaviour.
    transport_mean_bound: Optional[float] = None
    # Precision of the covariance algebra + CG solve (the denoiser itself
    # always runs in its own dtype and its guidance vjp stays f32, matching
    # the reference's torch.Tensor() downcast of `mat`). 'float64' requires
    # jax_enable_x64 and mirrors the reference's complex128-on-CPU state
    # (online_update_bfgs.py:12) for precision-control A/B runs; None = f32.
    algebra_dtype: Optional[str] = None
    # Floor for the sigma-adaptive CG rtol schedule. The f32 default stops
    # solves at the f32-achievable residual; f64 A/B runs can lower it.
    rtol_floor: float = RTOL_F32_FLOOR
    # CG coordinate system for the deblur family: 'pixel' = original space;
    # 'fourier' runs the identical CG path in weighted rfft2 coordinates —
    # one FFT round-trip per iteration instead of six
    # (solvers.deblur_mat_cg_fourier). 'auto' (default) picks by backend:
    # fourier on CPU (measured 13% faster/iter), pixel on TPU, where XLA's
    # rfft lowering makes the fourier iteration 1.78x MORE expensive
    # (docs/bench/cg_coords_bench.json).
    cg_coords: str = "auto"
    # CG starting point. 'b' = the reference torch CG's x0 = rhs warm start
    # (cg.py:143), required for bit-level reference A/B. 'prev' recycles the
    # previous guidance stage's CG solution as the start: consecutive ODE
    # stages solve nearby systems (Sigma_0 and x0_mean move smoothly in
    # sigma), so the previous u is already close — measurably fewer
    # iterations for the same solutions (identical wherever CG converges;
    # loose-rtol iterates at large sigma differ, the same documented class
    # as cg_precondition). The first stage falls back to 'b'.
    cg_warm_start: str = "b"
    # Analytic-transport formula: 'telescoped' (production — the exact SPD
    # (I + a Sigma)^-1 form, oracle-verified 20x closer to the true value
    # with the real dct prior) or 'two_inverse' (the reference's literal
    # H(s') H(s)^-1 evaluation, kept for bit-level reference A/B where the
    # comparison must share the reference's rounding behaviour).
    transport_formula: str = "telescoped"
    # Guidance-gradient operator. 'vjp' (reference default) computes
    # sigma^2 * J^T mat via an autograd pullback through the denoiser — a
    # second ~2.57x-FLOP pass whose HLO temps dominate HBM (9.1G at batch 8).
    # 'covariance' uses the paper's own estimate instead: Sigma_0 mat /
    # sigma^2 — the reference carries this exact expression as a
    # commented-out primary alternative (conditioning_mechanisms.py:283) and
    # as its large-update fallback (:285-288). By Tweedie Sigma_0 =
    # sigma^2 * J, so the two agree exactly when the covariance estimate is
    # exact (it is, for Gaussian data under time updates); no pullback is
    # traced, so the vjp FLOPs and residual memory disappear entirely.
    # 'hybrid' runs the vjp only when sigma < guidance_vjp_below and the
    # covariance product elsewhere: the forward still produces the pullback
    # closure (residuals are forward byproducts) but the transpose pass
    # executes inside a lax.cond, so its time is paid only on the low-sigma
    # fraction of the schedule (GMM measurement: the covariance product is
    # vjp-grade outside the regime where the posterior is multimodal at
    # scale sigma — see design.md §8). hybrid REQUIRES a rematerialised
    # (jax.checkpoint) denoiser on real models: the pullback residuals cross
    # the cond boundary, and without remat that is every forward activation
    # (measured 44G HBM at 256px batch 8 vs 9.3G for plain vjp).
    guidance_gradient: str = "vjp"
    guidance_vjp_below: float = 1.0
    # (data_axis, model_axis) mesh-axis names for sharding the covariance
    # state inside the guided step: diag/U shard their d dimension over
    # ``model_axis`` (the >256px scaling path — the (d, K) factors outgrow
    # one chip's HBM share), the batch dimension over ``data_axis``. GSPMD
    # partitions the U^T v / U @ (M inner) matmuls and inserts the K-length
    # psum over ICI (parallel/sharded_cov.py documents the decomposition).
    # None = unconstrained (single-chip or pure-DP; XLA's default placement).
    cov_partition: Optional[Tuple[Optional[str], Optional[str]]] = None

    @property
    def _adt(self):
        if self.algebra_dtype and jnp.dtype(self.algebra_dtype) == jnp.float64 \
                and not jax.config.jax_enable_x64:
            # without x64, astype(float64) silently produces f32 — a
            # precision-control A/B would then measure f32 while claiming f64
            raise ValueError("algebra_dtype='float64' requires "
                             "jax.config.update('jax_enable_x64', True)")
        return jnp.dtype(self.algebra_dtype) if self.algebra_dtype else jnp.float32

    # -- basis --------------------------------------------------------------

    def _to_basis(self, x):
        """(B, C, H, W) pixel -> (B, d) transform coordinates."""
        if self.image_base_covariance.startswith("dct"):
            x = dct_2d(x)
        return x.reshape(x.shape[0], -1)

    def _from_basis(self, v, img_shape):
        v = v.reshape((-1,) + tuple(img_shape))
        if self.image_base_covariance.startswith("dct"):
            v = idct_2d(v)
        return v

    def _init_diag(self, img_shape) -> jnp.ndarray:
        d = int(np.prod(img_shape))
        if self.image_base_covariance == "dct_diagonal":
            if self.data_dir:
                dv = assets.load_dct_variance_from_dir(self.data_dir)
            else:
                dv = assets.dct_variance(self.dataset)
            return jnp.asarray(dv, self._adt).reshape(-1)[:d]
        if self.image_base_covariance in ("dct_diagonal_noinfo", "identity"):
            return jnp.full((d,), float(self.init_denoiser_variance), self._adt)
        raise ValueError(f"unknown image_base_covariance "
                         f"{self.image_base_covariance!r} (pca_dct_diagonal was dead "
                         f"code upstream — see SURVEY.md §7.4)")

    def init_state(self, batch: int, img_shape: Tuple[int, ...]) -> FreeHunchState:
        d = int(np.prod(img_shape))
        diag = self._init_diag(img_shape)
        cov1 = cov_mod.init_state(diag, d, self.cov_capacity)
        cov = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), cov1)
        zeros = jnp.zeros((batch,) + tuple(img_shape), self._adt)
        # measurement-space shape for the recycled CG solution (abstract
        # trace only — no device compute; SR solves on the low-res grid)
        u_shape = jax.eval_shape(
            lambda z: self.forward_operator.forward(z, noiseless=True),
            jax.ShapeDtypeStruct((batch,) + tuple(img_shape), jnp.float32)).shape
        return FreeHunchState(cov=cov, prev_sigma=jnp.asarray(0.0, self._adt),
                              prev_x=zeros, prev_mean=zeros,
                              prev_u=jnp.zeros(u_shape, self._adt),
                              step=jnp.asarray(0, jnp.int32),
                              cg_niter=jnp.asarray(0, jnp.int32),
                              cg_resnorm=jnp.asarray(0.0, jnp.float32),
                              cg_optfrac=jnp.asarray(1.0, jnp.float32))

    # -- covariance ops batched over samples ---------------------------------

    def _constrain_cov(self, cov: LowRank) -> LowRank:
        """Pin the covariance state's sharding (no-op without cov_partition).

        Applied to the scan-carry state at entry and to the updated state at
        exit of each guidance call, so GSPMD keeps diag/U distributed over the
        model axis through time/space updates and the CG matvecs instead of
        gathering them onto one device. Requires an ambient mesh whose axis
        names match ``cov_partition`` (enter ``with mesh:`` around the jit).
        """
        if self.cov_partition is None:
            return cov
        from jax.sharding import PartitionSpec as P
        da, ma = self.cov_partition
        c = jax.lax.with_sharding_constraint
        return LowRank(
            diag=c(cov.diag, P(da, ma)),
            Ut=c(cov.Ut, P(da, None, ma)),
            M=c(cov.M, P(da, None, None)),
            k=c(cov.k, P(da)) if cov.k.ndim else cov.k)

    def _cov_matvec_basis(self, cov, v_basis):
        return jax.vmap(cov_mod.cov_matvec)(cov, v_basis)

    def cov_matvec_pixel(self, cov, v):
        """Sigma_0 @ v for pixel-space (B,C,H,W) v — the CG solver callback
        (reference denoiser_cov_vector_dot via DCT wrapper :370-374)."""
        shape = v.shape[1:]
        vb = self._to_basis(v)
        return self._from_basis(self._cov_matvec_basis(cov, vb), shape)

    # -- the guidance update --------------------------------------------------

    def x0_mean_update(self, denoise, x_t, y, sigma, state: FreeHunchState):
        if self.guidance_gradient not in ("vjp", "covariance", "hybrid"):
            raise ValueError(f"unknown guidance_gradient "
                             f"{self.guidance_gradient!r} "
                             f"(vjp | covariance | hybrid)")
        img_shape = x_t.shape[1:]
        state = state._replace(cov=self._constrain_cov(state.cov))
        # the denoiser and its guidance vjp always run in f32; only the
        # covariance algebra + CG solve use algebra_dtype (the reference
        # likewise runs the torch net in f32 and the state in complex128,
        # downcasting `mat` via torch.Tensor() before the autograd pullback)
        x_net = x_t.astype(jnp.float32)
        sigma_net = jnp.asarray(sigma, jnp.float32)
        if self.guidance_gradient == "covariance":
            # plain forward: no pullback is traced, so neither the vjp FLOPs
            # nor its residual memory exist in the compiled graph
            x0, _ = denoise(x_net, sigma_net)
            pullback = None
        else:
            # vjp and hybrid: the pullback closure rides out of the forward
            # (residuals are forward byproducts); hybrid EXECUTES it only
            # inside the lax.cond at step (5), so the transpose pass runs
            # on the low-sigma steps alone
            x0, _, pullback = _denoise_with_vjp(denoise, x_net, sigma_net)
        adt = self._adt
        sigma = jnp.asarray(sigma, adt)
        x_t = x_t.astype(adt)
        y = y.astype(adt)
        x0_a = x0.astype(adt)

        has_prev = state.step > 0
        sigma_changed = jnp.logical_and(has_prev, sigma != state.prev_sigma)
        x_changed = jnp.logical_and(
            has_prev, jnp.logical_not(jnp.all(jnp.abs(x_t - state.prev_x) < 1e-12)))

        prev_x_b = self._to_basis(state.prev_x)
        prev_mean_b = self._to_basis(state.prev_mean)

        if self.do_space_updates:
            # (1) time update + analytic transport of the previous mean
            transport_fn = (cov_mod.transport_score_two_inverse
                            if self.transport_formula == "two_inverse"
                            else cov_mod.transport_score)

            def do_time(_):
                score_prev = (prev_mean_b - prev_x_b) / state.prev_sigma**2
                cov2 = jax.vmap(cov_mod.time_update, in_axes=(0, None, None))(
                    state.cov, state.prev_sigma, sigma)
                mean_t, _ = jax.vmap(transport_fn,
                                     in_axes=(0, 0, None, None, 0, 0))(
                    state.cov, cov2, state.prev_sigma, sigma, prev_x_b, score_prev)
                if self.transport_mean_bound is not None:
                    b = float(self.transport_mean_bound)
                    mean_img = self._from_basis(mean_t, img_shape)
                    mean_t = self._to_basis(jnp.clip(mean_img, -b, b))
                return cov2, mean_t

            def no_time(_):
                return state.cov, prev_mean_b

            cov, prev_mean_at_sigma_b = jax.lax.cond(sigma_changed, do_time, no_time, None)

            # (2) optional extra network evaluation at (prev_x, sigma)
            if not self.use_analytical_score_time_update:
                def re_eval(_):
                    m, _v = denoise(state.prev_x.astype(jnp.float32), sigma_net)
                    return self._to_basis(m.astype(adt))
                prev_mean_at_sigma_b = jax.lax.cond(
                    x_changed, re_eval, lambda _: prev_mean_at_sigma_b, None)

            # (3) gated BFGS space update (reference :250-257)
            in_window = jnp.logical_and(sigma > self.space_step_update_lower_threshold,
                                        sigma < self.space_step_update_threshold)
            do_space = jnp.logical_and(x_changed, in_window)

            def space(cov_in):
                params = cov_mod.CovParams(
                    project_to_diagonal=self.project_to_diagonal,
                    curvature_guard=self.bfgs_curvature_guard,
                    secant_novelty_min=self.bfgs_secant_novelty_min)
                return jax.vmap(cov_mod.space_update,
                                in_axes=(0, None, 0, 0, 0, 0, None))(
                    cov_in, sigma, prev_x_b, self._to_basis(x_t),
                    prev_mean_at_sigma_b, self._to_basis(x0_a), params)

            cov = jax.lax.cond(do_space, space, lambda c: c, cov)
        else:
            # covariance-only time update (reference :261-263)
            def do_time_cov(_):
                return jax.vmap(cov_mod.time_update, in_axes=(0, None, None))(
                    state.cov, state.prev_sigma, sigma)
            cov = jax.lax.cond(sigma_changed, do_time_cov, lambda _: state.cov, None)

        # (4) solve (A Sigma_0 A^T + sigma_s^2 I) u = y - A x0;  mat = A^T u
        cov_mv = lambda v: self.cov_matvec_pixel(cov, v)
        # mean eigenvalue of Sigma_0 per sample (trace/d) -> CG preconditioner
        d_dim = cov.diag.shape[-1]
        lr_trace = jax.vmap(lambda c: jnp.sum(c.M * (c.Ut @ c.Ut.T)))(cov)
        cov_vbar = (jnp.sum(cov.diag, axis=-1) + lr_trace) / d_dim
        # DCT bases: the state's diagonal is a per-frequency variance —
        # feed it to the spectral preconditioner (the scalar mean is off by
        # orders of magnitude across the dct prior's spectrum). The exact
        # diagonal including the active BFGS columns (diag + diag(U M U^T),
        # 2Kd flops) tightens the model once space updates start landing.
        from free_hunch_tpu.ops import lowrank as _lr
        cov_dct_diag = (jax.vmap(_lr.diag_of)(cov)
                        if self.image_base_covariance.startswith("dct")
                        else None)

        if self.cg_warm_start not in ("b", "prev"):
            raise ValueError(f"cg_warm_start must be 'b' or 'prev', got "
                             f"{self.cg_warm_start!r}")
        recycle_u = self.cg_warm_start == "prev"
        recycle_kw = (dict(u_init=state.prev_u.astype(adt),
                           u_init_valid=state.step > 0, return_u=True)
                      if recycle_u else {})

        def cov_mat(_):
            return choose_solver(self.forward_operator, y, x0_a, cov_mv=cov_mv,
                                 method=self.solver_type, max_rtol=self.max_rtol,
                                 sigma_t=sigma, use_rtol_func=self.use_rtol_func,
                                 maxiter=self.cg_maxiter,
                                 cov_trace_mean=cov_vbar, return_info=True,
                                 precondition=self.cg_precondition,
                                 stall_iters=self.cg_stall_iters,
                                 cov_dct_diag=cov_dct_diag,
                                 rtol_floor=self.rtol_floor,
                                 track_best=self.cg_track_best,
                                 cg_coords=self.cg_coords, **recycle_kw)

        if self.use_analytic_var_at_end:
            # low-sigma analytic-variance override (reference :273-278); only
            # one of the two CG solves runs per step thanks to lax.cond
            table = assets.recon_mse(self.dataset)
            sigmas_t = jnp.asarray(table["sigmas"], jnp.float32)
            mses_t = jnp.asarray(table["mse_list"], jnp.float32)
            var = mses_t[jnp.argmin(jnp.abs(sigmas_t - sigma))]
            analytic_case = sigma < self.mle_sigma_thres

            def analytic_mat(_):
                # forward the mechanism's CG knobs (precondition/stall/
                # track_best/rtol_floor): defaults here would silently
                # re-enable behaviours that reference-exact configs disable
                return choose_solver(
                    self.forward_operator, y, x0_a,
                    theta0_var=jnp.broadcast_to(var, x0.shape).astype(adt),
                    method="scipy", max_rtol=self.max_rtol,
                    sigma_t=sigma, use_rtol_func=self.use_rtol_func,
                    maxiter=self.cg_maxiter, return_info=True,
                    precondition=self.cg_precondition,
                    stall_iters=self.cg_stall_iters,
                    rtol_floor=self.rtol_floor,
                    track_best=self.cg_track_best, **recycle_kw)

            solved = jax.lax.cond(analytic_case, analytic_mat, cov_mat, None)
        else:
            analytic_case = jnp.asarray(False)
            solved = cov_mat(None)
        if recycle_u:
            mat, cg_info, u_next = solved
        else:
            mat, cg_info = solved
            u_next = state.prev_u

        # (5) guidance gradient: vjp of mat through the UNet, with the
        # large-update fallback Sigma_0 mat / sigma^2 (reference :280-288).
        # mat is downcast to f32 for the pullback exactly as the reference's
        # torch.Tensor() conversion does before autograd.grad. In
        # guidance_gradient='covariance' mode the Sigma_0 product IS the
        # gradient (reference's commented-out alternative :283).
        mat_sg = jax.lax.stop_gradient(mat)
        fallback = (self.cov_matvec_pixel(cov, mat_sg) / sigma**2).astype(jnp.float32)
        if self.use_analytic_var_at_end:
            # in the low-sigma analytic regime mat was solved against var*I,
            # so the matching covariance product is var*mat/sigma^2 — EVERY
            # non-vjp gradient path below must use this form there (a plain
            # Sigma_0 product would be off by ~Sigma_0/var on those steps)
            analytic_grad = (var * mat_sg / sigma**2).astype(jnp.float32)
            fallback = jnp.where(analytic_case, analytic_grad, fallback)
        if self.guidance_gradient == "covariance":
            grad = fallback
        elif self.guidance_gradient == "hybrid":
            def guarded_pullback(m32):
                # same large-update fallback as the vjp branch (reference
                # :285-288) — without it a blown-up CG solution below the
                # threshold would pass the isfinite guard and corrupt the chain
                g = pullback(m32)
                s = jnp.std((g * sigma_net**2).reshape(g.shape[0], -1), axis=-1)
                fb = jnp.logical_and(jnp.logical_not(analytic_case),
                                     s > self.denoiser_mean_error_threshold)
                return jnp.where(fb[:, None, None, None], fallback, g)
            grad = jax.lax.cond(sigma_net < self.guidance_vjp_below,
                                guarded_pullback, lambda m32: fallback,
                                mat_sg.astype(jnp.float32))
        else:
            grad = pullback(mat_sg.astype(jnp.float32))
            upd_std = jnp.std((grad * sigma_net**2).reshape(grad.shape[0], -1), axis=-1)
            use_fb = jnp.logical_and(jnp.logical_not(analytic_case),
                                     upd_std > self.denoiser_mean_error_threshold)
            grad = jnp.where(use_fb[:, None, None, None], fallback, grad)
        update = grad * self.cond_scaling * sigma_net**2
        if self.guidance_update_bound is not None:
            gb = float(self.guidance_update_bound)
            update = jnp.clip(update, -gb, gb)
        # graceful degradation: a chain whose covariance solve diverged falls
        # back to the unguided denoiser mean instead of propagating non-finite
        # values through the remaining steps
        update = jnp.where(jnp.isfinite(update), update, 0.0)
        x0_new = x0 + update

        # sanitize the recycled solution: a non-finite CG iterate stored into
        # prev_u would poison EVERY later solve's starting point (x0=NaN never
        # recovers, unlike the per-step graceful degradation above) — zeroed
        # entries simply fall back to a cold start contribution
        u_next = jnp.where(jnp.isfinite(u_next), u_next, 0.0)
        new_state = _record_cg(FreeHunchState(
            cov=self._constrain_cov(cov), prev_sigma=sigma, prev_x=x_t,
            prev_mean=x0_a, prev_u=u_next.astype(self._adt),
            step=state.step + 1,
            cg_niter=state.cg_niter, cg_resnorm=state.cg_resnorm,
            cg_optfrac=state.cg_optfrac), cg_info)
        return x0_new, new_state
