"""DDNM+ sampler: DDPM ancestral sampling with SVD null-space projection.

Parity: reference ``ddnm_functions/custom_ddnm_sampling.py`` —
``ddnm_conditional_sampler:10`` (operator dispatch, measurement, interface),
``svd_based_ddnm_plus:74`` (Eq. 12 x0 prediction, Eq. 17 null-space
projection with the Lambda shrinkage, Eq. 51 ancestral step), and the RePaint
time-travel schedule ``get_schedule_jump:138-160``. Like the reference, the
sampler drives the *raw* epsilon-prediction UNet on the DDPM index grid,
bypassing the EDM preconditioner (reference :101, :77).

TPU redesign: the time schedule (including any time-travel segments) is
precomputed on the host; alpha-bar products per step flow into ONE
``lax.scan`` whose body either runs the projection step or the travel
re-noising step under ``lax.cond``. Everything is batched.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from free_hunch_tpu.operators import assets
from free_hunch_tpu.operators import svd as svd_ops


def get_schedule_jump(T_sampling: int, travel_length: int = 1,
                      travel_repeat: int = 1) -> List[int]:
    """RePaint jump schedule (reference :138-160)."""
    jumps = {}
    for j in range(0, T_sampling - travel_length, travel_length):
        jumps[j] = travel_repeat - 1
    t = T_sampling
    ts = []
    while t >= 1:
        t -= 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(travel_length):
                t += 1
                ts.append(t)
    ts.append(-1)
    assert ts[0] > ts[1] and ts[-1] == -1
    return ts


def build_svd_operator(operator_kwargs: dict, img_dim: int, mask_key=None):
    """Operator dispatch for the DDNM path (reference :17-46). Motion blur
    raises NotImplementedError exactly as upstream (:27)."""
    name = operator_kwargs["name"]
    if name == "gaussian_blur":
        kernel = assets.gaussian_blur_kernel()
        return svd_ops.Deblurring(
            kernel, 3, img_dim,
            use_ddnm_kernel_params=bool(operator_kwargs.get("use_ddnm_kernel_params",
                                                            False)))
    if name == "motion_blur":
        raise NotImplementedError("Motion blur not implemented for DDNM")
    if name == "inpainting":
        return svd_ops.create_inpainting_operator(
            3, img_dim, operator_kwargs["mask_opt"], mask_key=mask_key)
    if name == "super_resolution":
        return svd_ops.SuperResolution(3, img_dim,
                                       int(operator_kwargs["scale_factor"]))
    raise ValueError(f"Operator {name} not supported for DDNM")


def ddnm_schedule(num_steps: int, M: int = 1000, beta_start=0.0001, beta_end=0.02,
                  travel_length: int = 1, travel_repeat: int = 1):
    """Host precomputation: per-scan-step (at, at_next, is_forward) arrays.

    alpha-bar uses the zero-prepended beta grid (reference compute_alpha:69-72).
    """
    betas = np.concatenate([[0.0], np.linspace(beta_start, beta_end, M)])
    alpha_bar = np.cumprod(1.0 - betas)  # index t+1 for timestep t
    skip = M // num_steps

    times = get_schedule_jump(num_steps, travel_length, travel_repeat)
    at, at_next, forward = [], [], []
    for i, j in zip(times[:-1], times[1:]):
        ii, jj = i * skip, j * skip
        if jj < 0:
            jj = -1
        at.append(alpha_bar[ii + 1])
        at_next.append(alpha_bar[jj + 1])
        forward.append(jj < ii)
    return (np.asarray(at), np.asarray(at_next),
            np.asarray(forward, bool))


def ddnm_sample(eps_fn: Callable, a_funcs, noise: jnp.ndarray, y: jnp.ndarray,
                *, num_steps: int, sigma_y: float, eta: float = 1.0,
                M: int = 1000, travel_length: int = 1, travel_repeat: int = 1,
                rng_key=None, return_trajectory: bool = False,
                noise_seq=None) -> Tuple[jnp.ndarray, list]:
    """Run DDNM+ from pure noise. eps_fn(x, t_float_batch) -> epsilon (B,C,H,W)
    (raw UNet, variance channel already stripped). y: (B, n) measurement.
    With ``return_trajectory`` the second return value is the (T, B, C, H, W)
    stack of x_t iterates instead of ``[x0_last]``.

    ``noise_seq`` (n_scan_steps, B, C, H, W) overrides the per-step ancestral
    noise draws — the reference calls ``torch.randn_like`` once per schedule
    step in either branch (svd_ddnm.py:84-123); injecting the same sequence
    enables bit-level A/B against the torch sampler on the stochastic paths."""
    b = noise.shape[0]
    img_shape = noise.shape[1:]
    at_h, at_next_h, fwd_h = ddnm_schedule(num_steps, M=M,
                                           travel_length=travel_length,
                                           travel_repeat=travel_repeat)
    n_steps = len(at_h)
    skip = M // num_steps
    times = get_schedule_jump(num_steps, travel_length, travel_repeat)
    t_idx = np.asarray([i * skip for i in times[:-1]], np.float32)

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    xs = dict(
        at=jnp.asarray(at_h, jnp.float32),
        at_next=jnp.asarray(at_next_h, jnp.float32),
        forward=jnp.asarray(fwd_h),
        t=jnp.asarray(t_idx, jnp.float32),
        key=jax.random.split(rng_key, n_steps),
    )
    if noise_seq is not None:
        assert noise_seq.shape[0] == n_steps, (
            f"noise_seq must provide one draw per scan step "
            f"({noise_seq.shape[0]} != {n_steps})")
        xs["eps"] = jnp.asarray(noise_seq, jnp.float32)

    def body(carry, step):
        xt, x0_pred = carry
        at = step["at"]
        at_next = step["at_next"]
        eps = (step["eps"] if "eps" in step
               else jax.random.normal(step["key"], xt.shape, xt.dtype))

        def forward_step(args):
            xt, x0_pred = args
            t_b = jnp.full((b,), step["t"], jnp.float32)
            et = eps_fn(xt, t_b)
            # Eq. 12
            x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
            sigma_t = jnp.sqrt(1 - at_next)
            a = jnp.sqrt(at_next)
            # Eq. 17: null-space corrected x0
            resid = a_funcs.A(x0_t.reshape(b, -1)) - y.reshape(b, -1)
            corr = a_funcs.Lambda(a_funcs.A_pinv(resid).reshape(b, -1),
                                  a, sigma_y, sigma_t, eta)
            x0_hat = x0_t - corr.reshape(x0_t.shape)
            # Eq. 51: ancestral step with the split noise
            noise_term = a_funcs.Lambda_noise(
                eps.reshape(b, -1), a, sigma_y, sigma_t, eta,
                et.reshape(b, -1)).reshape(x0_t.shape)
            return a * x0_hat + noise_term, x0_t

        def travel_step(args):
            xt, x0_pred = args
            xt_next = (jnp.sqrt(at_next) * x0_pred
                       + eps * jnp.sqrt(1 - at_next))
            return xt_next, x0_pred

        # pin both branches to the carry dtype (an eps_fn that promotes to
        # f64 under jax_enable_x64 would otherwise mismatch the travel branch)
        dt = xt.dtype
        xt_next, x0_pred = jax.lax.cond(
            step["forward"],
            lambda a: jax.tree.map(lambda v: v.astype(dt), forward_step(a)),
            travel_step, (xt, x0_pred))
        return (xt_next, x0_pred), (xt_next if return_trajectory else None)

    (x_final, x0_last), traj = jax.lax.scan(body, (noise, jnp.zeros_like(noise)), xs)
    return x_final, (traj if return_trajectory else [x0_last])


def ddnm_conditional_sampler(eps_fn: Callable, noise: jnp.ndarray,
                             cond_images: jnp.ndarray, operator_kwargs: dict,
                             noise_kwargs: dict, *, num_steps: int = 18,
                             eta: float = 1.0, rng_key=None, mask_key=None,
                             travel_length: int = 1, travel_repeat: int = 1,
                             **other):
    """Interface twin of the EDM conditional sampler (reference :10-67):
    builds the SVD operator, takes the measurement y = A x + sigma_y eps,
    runs DDNM+, returns (x, [x0_last], y_for_output). The RePaint time-travel
    schedule knobs (travel_length/travel_repeat) forward to ``ddnm_sample``;
    remaining **other keys are the EDM sampler options the DDNM path ignores
    by design (reference custom_ddnm_sampling.py takes the same superset)."""
    img_dim = noise.shape[-1]
    b = noise.shape[0]
    a_funcs = build_svd_operator(operator_kwargs, img_dim, mask_key=mask_key)
    sigma_y = float(noise_kwargs.get("sigma", 0.0))
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def measure(c, k):
        yy = a_funcs.A(c.reshape(b, -1))
        return yy + sigma_y * jax.random.normal(k, yy.shape, yy.dtype)

    y = jax.jit(measure)(cond_images, jax.random.fold_in(rng_key, 0))
    name = operator_kwargs["name"]
    if name == "inpainting":
        y_for_output = a_funcs.A_with_zeros(
            cond_images.reshape(b, -1)).reshape(cond_images.shape)
    elif name == "super_resolution":
        sf = int(operator_kwargs["scale_factor"])
        y_for_output = y.reshape(b, 3, img_dim // sf, img_dim // sf)
    else:
        y_for_output = y.reshape(cond_images.shape)

    x, x_all = ddnm_sample(eps_fn, a_funcs, noise, y, num_steps=num_steps,
                           sigma_y=sigma_y, eta=eta,
                           travel_length=travel_length,
                           travel_repeat=travel_repeat,
                           rng_key=jax.random.fold_in(rng_key, 1))
    return x, x_all, y_for_output
