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


class StabilityVAEEncoder(Encoder):
    """Stable-Diffusion VAE latent encoder (reference :79-151). Requires the
    `diffusers` VAE weights, which are not bundled; constructing without them
    raises with a clear message (the paper pipeline never uses this encoder)."""

    def __init__(self, vae_name: str = "stabilityai/sd-vae-ft-mse",
                 raw_mean=(5.81, 3.25, 0.12, -2.15),
                 raw_std=(4.17, 4.62, 3.71, 3.28), final_mean=0.0, final_std=0.5,
                 batch_size: int = 8):
        self.vae_name = vae_name
        self.raw_mean = np.asarray(raw_mean, np.float32).reshape(1, -1, 1, 1)
        self.raw_std = np.asarray(raw_std, np.float32).reshape(1, -1, 1, 1)
        self.final_mean = final_mean
        self.final_std = final_std
        self.batch_size = batch_size
        self._vae = None

    def init(self, device=None):
        try:
            from diffusers import AutoencoderKL  # pragma: no cover
            self._vae = AutoencoderKL.from_pretrained(self.vae_name)
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "StabilityVAEEncoder needs the diffusers SD-VAE weights "
                f"({self.vae_name}); unavailable in this environment") from e

    def encode(self, x):  # pragma: no cover - requires VAE weights
        import torch
        assert self._vae is not None, "call init() first"
        xt = torch.from_numpy(np.asarray(x, np.float32)) / 127.5 - 1
        with torch.no_grad():
            z = self._vae.encode(xt).latent_dist.sample()
        z = (z.numpy() - self.raw_mean) / self.raw_std * self.final_std + self.final_mean
        return jnp.asarray(z)

    def decode(self, z):  # pragma: no cover - requires VAE weights
        import torch
        assert self._vae is not None, "call init() first"
        raw = (np.asarray(z, np.float32) - self.final_mean) / self.final_std
        raw = raw * self.raw_std + self.raw_mean
        with torch.no_grad():
            x = self._vae.decode(torch.from_numpy(raw)).sample
        x = ((x.numpy() + 1) * 127.5).clip(0, 255).astype(np.uint8)
        return jnp.asarray(x)
