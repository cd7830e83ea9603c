"""Latent/pixel encoders between storage uint8 and model space.

Parity: reference ``training/encoders.py`` — ``StandardRGBEncoder:62``
(uint8 <-> [-1, 1]) and ``StabilityVAEEncoder:79`` (SD-VAE latents; unused by
the paper pipeline and gated here on the availability of the diffusers VAE).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Encoder:
    def init(self, device=None):
        pass

    def encode(self, x):
        raise NotImplementedError

    def decode(self, z):
        raise NotImplementedError


class StandardRGBEncoder(Encoder):
    """uint8 [0,255] CHW -> float [-1, 1] and back."""

    def encode(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        return x / 127.5 - 1.0

    def decode(self, z) -> jnp.ndarray:
        z = jnp.asarray(z, jnp.float32)
        return jnp.clip(jnp.round((z + 1.0) * 127.5), 0, 255).astype(jnp.uint8)


#: drop a converted SD-VAE params file here (npz of the flattened pytree, via
#: scripts/convert_vae_weights.py) to enable StabilityVAEEncoder with the
#: published sd-vae-ft-mse weights.
import os

def _vae_weights_path() -> str:
    """Resolve the converted SD-VAE weights file: the ``VAE_WEIGHTS`` env var
    (the LPIPS_WEIGHTS/FID_WEIGHTS convention), then the repo-relative
    ``models/`` dir (source checkout), then cwd ``models/`` (the repo-relative
    path points into site-packages' parent for a pip-installed package, where
    no user file can live)."""
    env = os.environ.get("VAE_WEIGHTS")
    if env:
        return env
    repo_rel = os.path.abspath(os.path.join(
        os.path.dirname(__file__), os.pardir, os.pardir,
        "models", "sd_vae_ft_mse.npz"))
    if os.path.exists(repo_rel):
        return repo_rel
    cwd_rel = os.path.abspath(os.path.join("models", "sd_vae_ft_mse.npz"))
    return cwd_rel if os.path.exists(cwd_rel) else repo_rel


VAE_WEIGHTS = _vae_weights_path()


class StabilityVAEEncoder(Encoder):
    """Stable-Diffusion VAE latent encoder on the native flax AutoencoderKL
    (``free_hunch_tpu.models.vae``), semantics matching the reference
    ``training/encoders.py:79-151`` exactly: the VAE consumes pixels/255,
    ``encode_pixels`` returns cat(mean, std) of the latent posterior,
    ``encode_latents`` samples and affine-standardises with
    (raw_mean, raw_std) -> (final_mean, final_std), and ``decode`` inverts
    the affine map then clamps the VAE output to [0,1]*255 uint8.

    The published weights are not obtainable in this environment (zero
    egress); the architecture is oracle-tested against a from-scratch torch
    replica (tests/test_vae.py) and activates automatically when a converted
    weights file lands at ``VAE_WEIGHTS``.
    """

    def __init__(self, vae_name: str = "stabilityai/sd-vae-ft-mse",
                 raw_mean=(5.81, 3.25, 0.12, -2.15),
                 raw_std=(4.17, 4.62, 3.71, 3.28), final_mean=0.0, final_std=0.5,
                 batch_size: int = 8):
        self.vae_name = vae_name
        self.scale = (np.float32(final_std)
                      / np.asarray(raw_std, np.float32)).reshape(1, -1, 1, 1)
        self.bias = (np.float32(final_mean)
                     - np.asarray(raw_mean, np.float32).reshape(1, -1, 1, 1)
                     * self.scale)
        self.batch_size = int(batch_size)
        self._vae = None
        self._params = None

    def init(self, device=None, params=None):
        """``params``: a flax variables dict (tests); otherwise loads the
        converted weights from ``VAE_WEIGHTS``."""
        from free_hunch_tpu.models.vae import AutoencoderKL
        import jax

        if self._vae is not None and (params is None or
                                      params is self._params):
            return
        self._vae = AutoencoderKL()
        if params is not None:
            self._params = params
        else:
            path = os.path.abspath(_vae_weights_path())
            if not os.path.exists(path):
                raise RuntimeError(
                    "StabilityVAEEncoder needs the converted SD-VAE weights "
                    f"({self.vae_name}) at {path}; unobtainable in this "
                    "environment (zero egress) - convert with "
                    "scripts/convert_vae_weights.py")
            from free_hunch_tpu.models.loading import load_params_npz
            self._params = {"params": load_params_npz(path)}
        self._enc = jax.jit(lambda p, x: self._vae.apply(p, x,
                                                         method="encode"))
        self._dec = jax.jit(lambda p, z: self._vae.apply(p, z,
                                                         method="decode"))

    def _batched(self, fn, x):
        outs = [fn(self._params, x[i:i + self.batch_size])
                for i in range(0, x.shape[0], self.batch_size)]
        if not outs:  # empty batch: probe the output structure at size 0
            return fn(self._params, x)
        if isinstance(outs[0], tuple):
            return tuple(jnp.concatenate([o[k] for o in outs])
                         for k in range(len(outs[0])))
        return jnp.concatenate(outs)

    def encode_pixels(self, x) -> jnp.ndarray:
        """raw uint8 pixels -> raw latents cat(mean, std) (reference :103)."""
        assert self._vae is not None, "call init() first"
        x = jnp.asarray(x, jnp.float32) / 255.0
        mean, std = self._batched(self._enc, x)
        return jnp.concatenate([mean, std], axis=1)

    def encode_latents(self, x, key=None) -> jnp.ndarray:
        """raw latents -> final (standardised, sampled) latents (:118).

        With key=None a fresh key is split off an internal stream per call
        (the reference's ``latent_dist.sample()`` draws fresh torch-global
        noise each call; a FIXED default key would reuse the identical noise
        pattern on every keyless encode). Pass an explicit key for
        functional determinism."""
        import jax
        mean, std = jnp.split(jnp.asarray(x, jnp.float32), 2, axis=1)
        if key is None:
            if isinstance(mean, jax.core.Tracer):
                # under jit the split below would execute ONCE at trace time
                # and bake a constant key in — every call would then reuse the
                # identical noise pattern, silently. Fail loudly instead.
                raise ValueError(
                    "StabilityVAEEncoder.encode/encode_latents under jit "
                    "requires an explicit `key` (the internal stream cannot "
                    "advance inside a traced function)")
            if not hasattr(self, "_rng"):
                self._rng = jax.random.PRNGKey(0)
            self._rng, key = jax.random.split(self._rng)
        z = mean + jax.random.normal(key, mean.shape, jnp.float32) * std
        return z * self.scale + self.bias

    def encode(self, x, key=None) -> jnp.ndarray:
        return self.encode_latents(self.encode_pixels(x), key=key)

    def decode(self, z) -> jnp.ndarray:
        assert self._vae is not None, "call init() first"
        raw = (jnp.asarray(z, jnp.float32) - self.bias) / self.scale
        x = self._batched(self._dec, raw)
        return (jnp.clip(x, 0, 1) * 255.0).astype(jnp.uint8)
