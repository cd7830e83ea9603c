"""EDM-style sigma-parameterisation wrappers around the raw UNet.

Parity: reference ``training/openai_preconditioning.py`` — ``iDDPMLinearPrecond:93``
(linear-beta schedule; the paper's default, ``config.yaml:88``) and
``iDDPMPrecond:9`` (cosine schedule; the reference copy is debug-broken —
stray print, hardcoded ``.repeat(2)``, single-value return — fixed here per
SURVEY.md §7.4).

Denoiser contract (consumed by every conditioning mechanism):
    D(x, sigma) -> (x0_mean, x0_var)
with D(x, sigma) = x - sigma * F(c_in x, c_noise) clamped to [-1, 1] and the
learned-sigma channel converted to an x0 posterior variance via Peng et al.
Eq. 22 (reference :186-188).

The wrapper is a pure function over a params pytree, so it jits/vmaps/vjps
freely; ``round_sigma`` is an argmin over the precomputed sigma grid ``u``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_sigma_grid(beta_min: float, beta_max: float, M: int) -> np.ndarray:
    """u[j] = sigma of reversed-index j for the linear-beta DDPM schedule,
    with u[M] = 0 appended as the terminal zero-noise level (reference :116-122)."""
    betas = np.concatenate([[0.0], np.linspace(beta_min, beta_max, M)])
    alpha_bar = np.cumprod(1.0 - betas)[::-1]
    return np.sqrt((1.0 - alpha_bar) / alpha_bar)


def _cosine_sigma_grid(C_1: float, C_2: float, M: int) -> np.ndarray:
    """iDDPM cosine schedule grid (reference :32-35)."""
    def alpha_bar(j):
        return np.sin(0.5 * np.pi * j / M / (C_2 + 1)) ** 2

    u = np.zeros(M + 1)
    for j in range(M, 0, -1):
        u[j - 1] = np.sqrt((u[j] ** 2 + 1) / max(alpha_bar(j - 1) / alpha_bar(j), C_1) - 1)
    return u


def _select_qscales(qscales, params, sigma):
    """Merge the per-stage static activation scales into the apply variables.

    qscales = (sigmas (S,) numpy, table: 'qscales'-collection pytree with
    (S,)-stacked leaves) from ``models/calibrate.calibrate_qscales``. The
    stage is picked by nearest-sigma lookup against the calibration grid
    (the sampler runs one sigma per call — sigma is a broadcast scalar),
    so a schedule close to the calibrated one degrades gracefully instead
    of failing."""
    if qscales is None:
        return params
    sigmas, table = qscales
    idx = jnp.argmin(jnp.abs(jnp.asarray(sigmas, jnp.float32)
                             - sigma.reshape(-1)[0]))
    sel = jax.tree.map(lambda a: jnp.asarray(a)[idx], table)
    return {**params, "qscales": sel}


@dataclasses.dataclass(frozen=True)
class IDDPMLinearPrecond:
    """Linear-beta iDDPM preconditioner. Construct once (precomputes the sigma
    grid and posterior coefficients as numpy), then call
    ``precond.apply(params, x, sigma)``.

    qscales: optional (sigmas, table) static-activation-scale calibration for
    quant='int8_static' models (see ``_select_qscales``)."""
    model: "flax.linen.Module"  # noqa: F821
    img_resolution: int
    img_channels: int
    label_dim: int = 0
    beta_min: float = 0.0001
    beta_max: float = 0.02
    M: int = 1000
    qscales: Optional[tuple] = None

    def __post_init__(self):
        u = _linear_sigma_grid(self.beta_min, self.beta_max, self.M)
        object.__setattr__(self, "_u_np", np.asarray(u, np.float32))
        object.__setattr__(self, "u", np.asarray(u, np.float32))
        object.__setattr__(self, "sigma_min", float(u[self.M - 1]))
        object.__setattr__(self, "sigma_max", float(u[0]))
        # posterior q(x_{t-1} | x_t, x_0) coefficients on the (M+1)-grid,
        # index 0 = the prepended zero-beta level (reference :131-165).
        betas = np.concatenate([[0.0], np.linspace(self.beta_min, self.beta_max, self.M)])
        alphas_cumprod = np.cumprod(1.0 - betas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        with np.errstate(invalid="ignore", divide="ignore"):
            # index 0 (the prepended zero-beta level) is 0/0 and never used
            posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            posterior_mean_coef1 = (betas * np.sqrt(alphas_cumprod_prev)
                                    / (1.0 - alphas_cumprod))
        # host-numpy tables: embedded as constants at trace time
        object.__setattr__(self, "posterior_variance",
                           np.nan_to_num(posterior_variance).astype(np.float32))
        object.__setattr__(self, "posterior_mean_coef1",
                           np.nan_to_num(posterior_mean_coef1).astype(np.float32))

    def round_sigma(self, sigma, return_index: bool = False):
        """Snap sigma to the nearest grid value (reference :203-207).

        numpy/python inputs are handled entirely on the host (the sampler's
        schedule precomputation must not touch the device); traced jax inputs
        use the device grid."""
        if not isinstance(sigma, jax.core.Tracer) and not isinstance(sigma, jax.Array):
            s = np.asarray(sigma, np.float32)
            u = self._u_np
            idx = np.argmin(np.abs(s.reshape(-1)[:, None] - u[None, :]), axis=1)
            return (idx if return_index else u[idx]).reshape(np.shape(sigma))
        sigma = jnp.asarray(sigma, jnp.float32)
        u = jnp.asarray(self.u)
        idx = jnp.argmin(jnp.abs(sigma.reshape(-1)[:, None] - u[None, :]), axis=1)
        if return_index:
            return idx.reshape(jnp.shape(sigma))
        return u[idx].reshape(jnp.shape(sigma))

    def apply(self, params, x: jnp.ndarray, sigma, y: Optional[jnp.ndarray] = None,
              mutable=False):
        """D(x, sigma) -> (x0_mean in [-1,1], x0_var). x: (N, C, H, W) f32.

        mutable: forwarded to ``model.apply`` (calibration capture, e.g.
        ('qstats',)); when truthy, returns ((D_x, x0_var), mutated_vars)."""
        x = x.astype(jnp.float32)
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32).reshape(-1), (x.shape[0],))
        if self.label_dim and y is None:
            # reference default: zero labels when none are given (:170)
            y = jnp.zeros((x.shape[0],), jnp.int32)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        idx = self.round_sigma(sigma, return_index=True)
        c_noise = (self.M - idx).astype(jnp.float32)

        variables = _select_qscales(self.qscales, params, sigma)
        out = self.model.apply(variables, c_in[:, None, None, None] * x,
                               c_noise, y=y,
                               **(dict(mutable=mutable) if mutable else {}))
        mut = None
        if mutable:
            out, mut = out
        F_x = out[:, :self.img_channels]
        v = out[:, self.img_channels:]

        # learned-sigma channel -> x0 posterior variance, Peng et al. Eq. 22.
        t = c_noise.astype(jnp.int32)
        pv = jnp.asarray(self.posterior_variance)[t][:, None, None, None]
        pm1 = jnp.asarray(self.posterior_mean_coef1)[t][:, None, None, None]
        x0_var = jnp.clip((v - pv) / jnp.square(pm1), min=1e-6)

        D_x = x + c_out[:, None, None, None] * F_x.astype(jnp.float32)
        D_x = jnp.clip(D_x, -1.0, 1.0)
        if mutable:
            return (D_x, x0_var), mut
        return D_x, x0_var


@dataclasses.dataclass(frozen=True)
class IDDPMCosinePrecond:
    """Cosine-schedule iDDPM preconditioner (reference iDDPMPrecond:9, with the
    debug defects fixed: correct c_noise indexing, per-batch timesteps, and the
    (D_x, x0_var) 2-tuple contract)."""
    model: "flax.linen.Module"  # noqa: F821
    img_resolution: int
    img_channels: int
    label_dim: int = 0
    C_1: float = 0.001
    C_2: float = 0.008
    M: int = 1000
    qscales: Optional[tuple] = None

    def __post_init__(self):
        u = _cosine_sigma_grid(self.C_1, self.C_2, self.M)
        object.__setattr__(self, "_u_np", np.asarray(u, np.float32))
        object.__setattr__(self, "u", np.asarray(u, np.float32))
        object.__setattr__(self, "sigma_min", float(u[self.M - 1]))
        object.__setattr__(self, "sigma_max", float(u[0]))

    def round_sigma(self, sigma, return_index: bool = False):
        if not isinstance(sigma, jax.core.Tracer) and not isinstance(sigma, jax.Array):
            s = np.asarray(sigma, np.float32)
            idx = np.argmin(np.abs(s.reshape(-1)[:, None] - self._u_np[None, :]), axis=1)
            return (idx if return_index else self._u_np[idx]).reshape(np.shape(sigma))
        sigma = jnp.asarray(sigma, jnp.float32)
        u = jnp.asarray(self.u)
        idx = jnp.argmin(jnp.abs(sigma.reshape(-1)[:, None] - u[None, :]), axis=1)
        if return_index:
            return idx.reshape(jnp.shape(sigma))
        return u[idx].reshape(jnp.shape(sigma))

    def apply(self, params, x: jnp.ndarray, sigma, y: Optional[jnp.ndarray] = None,
              mutable=False):
        x = x.astype(jnp.float32)
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32).reshape(-1), (x.shape[0],))
        if self.label_dim and y is None:
            y = jnp.zeros((x.shape[0],), jnp.int32)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (self.M - 1 - self.round_sigma(sigma, return_index=True)).astype(jnp.float32)
        variables = _select_qscales(self.qscales, params, sigma)
        out = self.model.apply(variables, c_in[:, None, None, None] * x,
                               c_noise, y=y,
                               **(dict(mutable=mutable) if mutable else {}))
        mut = None
        if mutable:
            out, mut = out
        F_x = out[:, :self.img_channels]
        D_x = jnp.clip(x + c_out[:, None, None, None] * F_x.astype(jnp.float32), -1.0, 1.0)
        # no learned-sigma -> posterior-variance mapping on the cosine grid;
        # fall back to the MLE variance sigma^2/(1+sigma^2).
        x0_var = jnp.broadcast_to((sigma**2 / (1 + sigma**2))[:, None, None, None], D_x.shape)
        if mutable:
            return (D_x, x0_var), mut
        return D_x, x0_var
