"""EDM Heun/Euler probability-flow ODE sampler with guided conditioning.

Parity: reference ``generate_conditional.py:38-201`` (conditional_sampler +
get_sigma_steps): 5 discretizations (vp / ve / iddpm / edm / ddpm_linear),
3 sigma(t) schedules (vp / ve / linear), vp/none scaling, S_churn noise
injection, 2nd-order Heun correction, and one conditioning-mechanism call per
ODE stage. The reference's first-stage derivative uses the simplified
d = (x - D(x)) / sigma (a VE/linear-schedule specialisation, noted "forget
about other than VE for now" upstream); we reproduce that exactly, with the
full schedule coefficients on the corrector stage as upstream does.

TPU redesign: every time/schedule quantity (t grid, churn std, scale ratios,
corrector coefficients) is precomputed on the host in float64 and fed to ONE
``lax.scan`` as per-step arrays, so the jitted graph contains only tensor
work: churn noise, two denoiser+guidance evaluations, and the ODE update.
The conditioning-mechanism state (e.g. the Free Hunch covariance) is part of
the scan carry. The whole sampler jits once per shape and runs for the whole
batch (reference: Python loop per step, batch size 1).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _vp_sigma(beta_d, beta_min):
    return lambda t: np.sqrt(np.expm1(0.5 * beta_d * t**2 + beta_min * t))


def _vp_sigma_deriv(beta_d, beta_min, sigma):
    return lambda t: 0.5 * (beta_min + beta_d * t) * (sigma(t) + 1 / sigma(t))


def _vp_sigma_inv(beta_d, beta_min):
    return lambda s: (np.sqrt(beta_min**2 + 2 * beta_d * np.log(s**2 + 1)) - beta_min) / beta_d


def get_sigma_steps(discretization: str, num_steps: int, sigma_min: float,
                    sigma_max: float, *, vp_beta_d=19.9, vp_beta_min=0.1, rho=7.0,
                    M=1000, C_1=0.001, C_2=0.008, epsilon_s=1e-3) -> np.ndarray:
    """The 5 time-step discretizations (reference get_sigma_steps:172-201)."""
    idx = np.arange(num_steps, dtype=np.float64)
    if discretization == "vp":
        t = 1 + idx / (num_steps - 1) * (epsilon_s - 1)
        return _vp_sigma(vp_beta_d, vp_beta_min)(t)
    if discretization == "ve":
        t = sigma_max**2 * ((sigma_min**2 / sigma_max**2) ** (idx / (num_steps - 1)))
        return np.sqrt(t)
    if discretization == "iddpm":
        u = np.zeros(M + 1)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / M / (C_2 + 1)) ** 2
        for j in range(M, 0, -1):
            u[j - 1] = np.sqrt((u[j] ** 2 + 1) / max(alpha_bar(j - 1) / alpha_bar(j), C_1) - 1)
        uf = u[(u >= sigma_min) & (u <= sigma_max)]
        return uf[np.round((len(uf) - 1) / (num_steps - 1) * idx).astype(int)]
    if discretization == "ddpm_linear":
        betas = np.linspace(0.0001, 0.02, M)
        alpha_bar = np.cumprod(1 - betas)[::-1]
        u = np.sqrt((1 - alpha_bar) / alpha_bar)
        uf = u[(u >= sigma_min) & (u <= sigma_max)]
        return uf[np.round((len(uf) - 1) / (num_steps - 1) * idx).astype(int)]
    assert discretization == "edm", discretization
    return (sigma_max ** (1 / rho)
            + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho


class _Schedule(NamedTuple):
    sigma: Callable
    sigma_deriv: Callable
    sigma_inv: Callable
    s: Callable
    s_deriv: Callable


def _build_schedule(schedule: str, scaling: str, vp_beta_d, vp_beta_min) -> _Schedule:
    if schedule == "vp":
        sigma = _vp_sigma(vp_beta_d, vp_beta_min)
        sigma_deriv = _vp_sigma_deriv(vp_beta_d, vp_beta_min, sigma)
        sigma_inv = _vp_sigma_inv(vp_beta_d, vp_beta_min)
    elif schedule == "ve":
        sigma = lambda t: np.sqrt(t)
        sigma_deriv = lambda t: 0.5 / np.sqrt(t)
        sigma_inv = lambda s: s**2
    else:
        assert schedule == "linear", schedule
        sigma = lambda t: t
        sigma_deriv = lambda t: 1.0
        sigma_inv = lambda s: s
    if scaling == "vp":
        s_fn = lambda t: 1 / np.sqrt(1 + sigma(t) ** 2)
        s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * (s_fn(t) ** 3)
    else:
        assert scaling == "none", scaling
        s_fn = lambda t: 1.0
        s_deriv = lambda t: 0.0
    return _Schedule(sigma, sigma_deriv, sigma_inv, s_fn, s_deriv)


def prepare_schedule(
    *, round_sigma: Callable, net_sigma_min: float, net_sigma_max: float,
    num_steps: int = 18, sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None, rho: float = 7.0,
    solver: str = "heun", discretization: str = "edm", schedule: str = "linear",
    scaling: str = "none", epsilon_s: float = 1e-3, C_1: float = 0.001,
    C_2: float = 0.008, M: int = 1000, alpha: float = 1.0,
    S_churn: float = 0.0, S_min: float = 0.0, S_max: float = float("inf"),
    S_noise: float = 1.0,
):
    """Host-side schedule precomputation. Returns (xs, sigma0_scaled) where
    ``xs`` is the per-step array dict consumed by ``sample_scan`` and
    ``sigma0_scaled`` = sigma(t_0) * s(t_0) scales the initial noise. Compute
    once per config; the result is reused by every batch (one compilation for
    the whole run)."""
    assert solver in ("euler", "heun")
    assert discretization in ("vp", "ve", "iddpm", "edm", "ddpm_linear")

    # --- host-side schedule setup (all float64 numpy) -----------------------
    vp_def = _vp_sigma(19.9, 0.1)
    if sigma_min is None:
        sigma_min = {"vp": vp_def(epsilon_s), "ve": 0.02, "iddpm": 0.002,
                     "edm": 0.002, "ddpm_linear": 0.002}[discretization]
    if sigma_max is None:
        sigma_max = {"vp": vp_def(1.0), "ve": 100.0, "iddpm": 81.0,
                     "edm": 80.0, "ddpm_linear": 81.0}[discretization]
    sigma_min = max(sigma_min, net_sigma_min)
    sigma_max = min(sigma_max, net_sigma_max)

    vp_beta_d = 2 * (np.log(sigma_min**2 + 1) / epsilon_s
                     - np.log(sigma_max**2 + 1)) / (epsilon_s - 1)
    vp_beta_min = np.log(sigma_max**2 + 1) - 0.5 * vp_beta_d
    sch = _build_schedule(schedule, scaling, vp_beta_d, vp_beta_min)

    sigma_steps = get_sigma_steps(discretization, num_steps, sigma_min, sigma_max,
                                  vp_beta_d=vp_beta_d, vp_beta_min=vp_beta_min,
                                  rho=rho, M=M, C_1=C_1, C_2=C_2, epsilon_s=epsilon_s)
    snapped = np.asarray(round_sigma(sigma_steps), np.float64)
    t_steps = np.concatenate([sch.sigma_inv(snapped), [0.0]])

    # per-step host arrays
    t_hat = np.empty(num_steps)
    churn_std = np.empty(num_steps)
    scale_ratio = np.empty(num_steps)
    for i in range(num_steps):
        t_cur = t_steps[i]
        gamma = (min(S_churn / num_steps, np.sqrt(2) - 1)
                 if S_min <= sch.sigma(t_cur) <= S_max else 0.0)
        th = sch.sigma_inv(np.asarray(round_sigma(sch.sigma(t_cur)
                                                  + gamma * sch.sigma(t_cur)), np.float64))
        t_hat[i] = th
        churn_std[i] = (np.sqrt(max(sch.sigma(th)**2 - sch.sigma(t_cur)**2, 0.0))
                        * sch.s(th) * S_noise)
        scale_ratio[i] = sch.s(th) / sch.s(t_cur)
    t_next = t_steps[1:]
    h = t_next - t_hat
    sigma_hat = np.array([sch.sigma(t) for t in t_hat])
    t_prime = t_hat + alpha * h
    sigma_prime = np.array([sch.sigma(t) for t in t_prime])
    # corrector coefficients (reference :166); zeroed on steps where the Heun
    # branch never runs (the final step has t_prime = 0)
    use_heun = np.array([(solver == "heun") and (i < num_steps - 1)
                         for i in range(num_steps)])
    with np.errstate(divide="ignore", invalid="ignore"):
        c1 = np.array([sch.sigma_deriv(t) / sch.sigma(t) + sch.s_deriv(t) / sch.s(t)
                       for t in t_prime])
        c2 = np.array([sch.sigma_deriv(t) * sch.s(t) / sch.sigma(t) for t in t_prime])
    c1 = np.where(use_heun, np.nan_to_num(c1), 0.0)
    c2 = np.where(use_heun, np.nan_to_num(c2), 0.0)

    # All per-step arrays stay HOST numpy: they become embedded constants at
    # trace time. (Creating them eagerly on device would require a
    # device->host readback at lowering, which remote TPU backends may not
    # support, and would add pointless transfers.)
    xs = dict(
        sigma_hat=np.asarray(sigma_hat, np.float32),
        churn_std=np.asarray(churn_std, np.float32),
        scale_ratio=np.asarray(scale_ratio, np.float32),
        h=np.asarray(h, np.float32),
        sigma_prime=np.asarray(sigma_prime, np.float32),
        c1=np.asarray(c1, np.float32), c2=np.asarray(c2, np.float32),
        use_heun=use_heun,  # host bool array: the step structure is static
    )
    sigma0_scaled = float(sch.sigma(t_steps[0]) * sch.s(t_steps[0]))
    return xs, sigma0_scaled


def required_cov_capacity(xs: dict, lower: float = 1.0, upper: float = 10.0,
                          do_space_updates: bool = True, slack: int = 2) -> int:
    """Exact low-rank capacity the Free Hunch state needs for a schedule.

    The covariance's rank only grows through BFGS space updates (2 columns
    each), and those fire only on guidance calls whose sigma lies strictly
    inside the space-update window (``guidance/mechanisms.py`` ``do_space``
    gate; reference ``online_update_bfgs.py:250-257``). The schedule is host
    data, so the in-window call count — and therefore the exact capacity —
    is static. Rounds 1–2 shipped a worst-case ``4*steps`` default (K=128),
    3.3x the 38 columns this protocol can ever activate; since every CG
    iteration streams the full (d, K) factor from HBM regardless of the
    active count, the oversize was pure memory-bandwidth waste (~2/3 of the
    covariance+CG time at 256px).
    """
    if not do_space_updates:
        return 2  # rank stays 0; minimum shape for the update machinery
    sig = np.concatenate([
        np.asarray(xs["sigma_hat"], np.float64),
        np.asarray(xs["sigma_prime"], np.float64)[np.asarray(xs["use_heun"], bool)],
    ])
    n_window = int(np.sum((sig > lower) & (sig < upper)))
    return max(2 * n_window + slack, 2)


def sample_scan(denoise: Callable, mechanism, noise: jnp.ndarray, y: jnp.ndarray,
                xs: dict, rng_key, *, sigma0_scaled: float, alpha: float = 1.0,
                return_trajectory: bool = False, collect_diagnostics: bool = False):
    """The pure jittable sampling loop: one ``lax.scan`` over the schedule.

    The Heun/Euler step structure is static (host booleans), so the scan body
    contains NO lax.cond between solver orders: identical consecutive steps
    are scanned with one traced body, and trailing steps with a different
    structure (the final Euler step of a Heun run) are peeled out and applied
    inline. This halves the traced graph vs a cond-in-body formulation — the
    guidance mechanism (UNet + vjp + CG) appears once per structure instead
    of twice per step.

    ``collect_diagnostics`` appends a third return value: a dict with
    ``cg_niter`` (num_steps, 2) int32, ``cg_resnorm`` (num_steps, 2) f32 and
    ``cg_optfrac`` (num_steps, 2) f32 — the guidance CG solve's iteration
    count, batch-mean final residual and converged-row fraction per ODE stage
    (column 1 is -1 / 0 / 1 on Euler-only steps). Pair with
    xs['sigma_hat'] / xs['sigma_prime'] for a per-sigma profile.
    """
    use_heun = np.asarray(xs["use_heun"], bool)
    num_steps = use_heun.shape[0]
    step_keys = jax.random.split(rng_key, num_steps)
    gstate0 = mechanism.init_state(noise.shape[0], noise.shape[1:])
    x0_init = noise.astype(jnp.float32) * sigma0_scaled

    def _cg_stats(gstate):
        return (getattr(gstate, "cg_niter", jnp.asarray(0, jnp.int32)),
                getattr(gstate, "cg_resnorm", jnp.asarray(0.0, jnp.float32)),
                getattr(gstate, "cg_optfrac", jnp.asarray(1.0, jnp.float32)))

    def make_body(heun: bool):
        def body(carry, step):
            x, gstate = carry
            eps = jax.random.normal(step["step_key"], x.shape, x.dtype)
            x_hat = step["scale_ratio"] * x + step["churn_std"] * eps

            denoised, gstate = mechanism(denoise, x_hat, y, step["sigma_hat"],
                                         gstate)
            n1, r1, o1 = _cg_stats(gstate)
            d_cur = (x_hat - denoised) / step["sigma_hat"]
            if heun:
                x_prime = x_hat + alpha * step["h"] * d_cur
                denoised2, gstate = mechanism(denoise, x_prime, y,
                                              step["sigma_prime"], gstate)
                n2, r2, o2 = _cg_stats(gstate)
                d_prime = step["c1"] * x_prime - step["c2"] * denoised2
                x_next = x_hat + step["h"] * ((1 - 1 / (2 * alpha)) * d_cur
                                              + 1 / (2 * alpha) * d_prime)
            else:
                n2 = jnp.asarray(-1, jnp.int32)
                r2 = jnp.asarray(0.0, jnp.float32)
                o2 = jnp.asarray(1.0, jnp.float32)
                x_next = x_hat + step["h"] * d_cur
            out = {}
            if return_trajectory:
                out["traj"] = x_next
            if collect_diagnostics:
                out["cg_niter"] = jnp.stack([n1, n2])
                out["cg_resnorm"] = jnp.stack([r1, r2])
                out["cg_optfrac"] = jnp.stack([o1, o2])
            return (x_next, gstate), out

        return body

    # segment the schedule into runs of identical step structure
    arrays = {k: v for k, v in xs.items() if k != "use_heun"}
    arrays["step_key"] = step_keys
    carry = (x0_init, gstate0)
    outs = []
    start = 0
    while start < num_steps:
        end = start
        while end < num_steps and use_heun[end] == use_heun[start]:
            end += 1
        seg = {k: v[start:end] for k, v in arrays.items()}
        body = make_body(bool(use_heun[start]))
        if end - start == 1:  # peeled single step: no scan wrapper needed
            carry, out = body(carry, {k: v[0] for k, v in seg.items()})
            outs.append(jax.tree.map(lambda a: a[None], out))
        else:
            carry, out = jax.lax.scan(body, carry, seg)
            outs.append(out)
        start = end

    x_final = carry[0]
    merged = {k: jnp.concatenate([o[k] for o in outs], axis=0)
              for k in outs[0]} if outs and outs[0] else {}
    traj = merged["traj"] if return_trajectory else [x0_init]
    if collect_diagnostics:
        diag = {k: merged[k] for k in ("cg_niter", "cg_resnorm", "cg_optfrac")}
        return x_final, traj, diag
    return x_final, traj


def conditional_sampler(
    denoise: Callable,              # (x, sigma) -> (x0_mean, x0_var), jit-pure
    noise: jnp.ndarray,             # (B, C, H, W) standard normal
    cond_images: jnp.ndarray,       # (B, C, H, W) clean conditioning images
    operator,                       # measurement operator (A)
    mechanism,                      # conditioning mechanism instance
    *,
    rng_key,                        # key for churn noise + measurement noise
    round_sigma: Callable,          # host-side grid snap (precond.round_sigma)
    net_sigma_min: float, net_sigma_max: float,
    alpha: float = 1.0, return_trajectory: bool = False, jit: bool = True,
    **schedule_kwargs,
):
    """Convenience one-shot wrapper: prepare the schedule, take the
    measurement, run the scan. Returns (x_final, x_all, y)
    (the reference's contract, generate_conditional.py:169). For repeated
    batches, use prepare_schedule + sample_scan under one persistent jit."""
    xs, sigma0_scaled = prepare_schedule(
        round_sigma=round_sigma, net_sigma_min=net_sigma_min,
        net_sigma_max=net_sigma_max, alpha=alpha, **schedule_kwargs)

    # measurement under jit (eager complex-FFT dispatch is unreliable on
    # remote TPU backends)
    y = jax.jit(lambda c, k: operator.forward(c, noiseless=False, key=k))(
        cond_images, jax.random.fold_in(rng_key, 0))

    def run(noise_, y_, key_):
        return sample_scan(denoise, mechanism, noise_, y_, xs, key_,
                           sigma0_scaled=sigma0_scaled, alpha=alpha,
                           return_trajectory=return_trajectory)

    if jit:
        run = jax.jit(run)
    x_final, x_all = run(noise, y, jax.random.fold_in(rng_key, 1))
    return x_final, x_all, y
