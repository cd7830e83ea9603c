"""Measurement-noise models (clean / gaussian / poisson).

Parity: reference ``measurement_utils/measurements.py:375-458``. Noise draws
take an explicit jax.random key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__NOISE__ = {}


def register_noise(name: str):
    def wrapper(cls):
        if name in __NOISE__:
            raise NameError(f"noise {name!r} already registered")
        __NOISE__[name] = cls
        return cls
    return wrapper


def get_noise(name: str, **kwargs):
    if name not in __NOISE__:
        raise NameError(f"noise {name!r} is not defined")
    noiser = __NOISE__[name](**kwargs)
    noiser.__name__ = name
    return noiser


class Noise:
    def __call__(self, data, key=None):
        return self.forward(data, key)


@register_noise(name="clean")
class Clean(Noise):
    def __init__(self, **kwargs):
        pass

    def forward(self, data, key=None):
        return data


@register_noise(name="gaussian")
class GaussianNoise(Noise):
    def __init__(self, sigma=0.1, **kwargs):
        self.sigma = sigma

    def forward(self, data, key=None):
        assert key is not None, "gaussian noise needs a jax.random key"
        return data + self.sigma * jax.random.normal(key, data.shape, data.dtype)


@register_noise(name="poisson")
class PoissonNoise(Noise):
    """Shot noise at the given photon rate on [0,1]-scaled uint8 intensities
    (reference :414-435, "stack-overflow version")."""

    def __init__(self, rate=1.0, **kwargs):
        self.rate = rate

    def forward(self, data, key=None):
        assert key is not None, "poisson noise needs a jax.random key"
        lam = jnp.clip((data + 1.0) / 2.0, 0.0, 1.0) * 255.0 * self.rate
        draw = jax.random.poisson(key, lam).astype(data.dtype) / 255.0 / self.rate
        return jnp.clip(draw * 2.0 - 1.0, -1.0, 1.0)
