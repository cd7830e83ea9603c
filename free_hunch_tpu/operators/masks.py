"""Inpainting mask generation (box / random / extreme).

Parity: reference ``measurement_utils/measurements.py:248-320`` (MaskGenerator).
TPU redesign: masks are generated with ``jax.random`` from an explicit key so a
fresh mask per image is reproducible from the sampler seed (the reference draws
from global numpy RNG state). Mask shape is (1, C, H, W) float.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_pixel_mask(key, image_size: int, prob_range, channels: int = 3) -> jnp.ndarray:
    """Drop a uniform-random fraction p ~ U(prob_range) of pixels (shared
    across channels), reference ``_retrieve_random:287``."""
    kp, ks = jax.random.split(key)
    total = image_size * image_size
    prob = jax.random.uniform(kp, (), minval=prob_range[0], maxval=prob_range[1])
    # Exactly floor(total * prob) masked pixels, like np.random.choice without
    # replacement: mask the `n` smallest of `total` random scores.
    scores = jax.random.uniform(ks, (total,))
    n_masked = jnp.floor(total * prob).astype(jnp.int32)
    order = jnp.argsort(scores)
    ranks = jnp.zeros((total,), jnp.int32).at[order].set(jnp.arange(total, dtype=jnp.int32))
    keep = (ranks >= n_masked).astype(jnp.float32)
    mask = keep.reshape(1, 1, image_size, image_size)
    return jnp.broadcast_to(mask, (1, channels, image_size, image_size))


def box_mask(key, image_size: int, len_range, channels: int = 3,
             margin=(16, 16), extreme: bool = False) -> jnp.ndarray:
    """Zero out a random square region (reference ``_random_sq_bbox:301``);
    ``extreme`` inverts the mask (keep only the box)."""
    kh, kw, kt, kl = jax.random.split(key, 4)
    lo, hi = int(len_range[0]), int(len_range[1])
    h = jax.random.randint(kh, (), lo, hi)
    w = jax.random.randint(kw, (), lo, hi)
    t = jax.random.randint(kt, (), margin[0], image_size - margin[0] - h)
    l = jax.random.randint(kl, (), margin[1], image_size - margin[1] - w)
    rows = jnp.arange(image_size)[:, None]
    cols = jnp.arange(image_size)[None, :]
    inside = ((rows >= t) & (rows < t + h) & (cols >= l) & (cols < l + w))
    mask = jnp.where(inside, 0.0, 1.0).astype(jnp.float32)
    if extreme:
        mask = 1.0 - mask
    mask = mask.reshape(1, 1, image_size, image_size)
    return jnp.broadcast_to(mask, (1, channels, image_size, image_size))


def generate_mask(key, mask_opt: dict, channels: int = 3) -> jnp.ndarray:
    """Dispatch on mask_opt['mask_type'] in {'box', 'random', 'extreme'}."""
    mt = mask_opt["mask_type"]
    size = mask_opt.get("image_size", 256)
    if mt == "random":
        return random_pixel_mask(key, size, mask_opt["mask_prob_range"], channels)
    if mt == "box":
        return box_mask(key, size, mask_opt["mask_len_range"], channels,
                        mask_opt.get("margin", (16, 16)))
    if mt == "extreme":
        return box_mask(key, size, mask_opt["mask_len_range"], channels,
                        mask_opt.get("margin", (16, 16)), extreme=True)
    raise ValueError(f"unknown mask_type {mt!r}")
