"""Device mesh + sharding helpers.

Parity intent: the reference's only parallelism is data-parallel evaluation
via torch DistributedSampler + all_reduce (SURVEY.md §2.2). The TPU-native
equivalent: one ``jax.sharding.Mesh``, image batches sharded on a 'data'
axis with ``NamedSharding``, metric reductions as jnp means over globally
sharded arrays (XLA inserts the psum over ICI). A 'model' mesh axis is
reserved for sharding the covariance low-rank factors / UNet channels at
resolutions beyond a single chip.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(mesh_shape: str, n_devices: Optional[int] = None) -> Dict[str, int]:
    """'data:-1' or 'data:4,model:2' -> {'data': N, 'model': 2} with -1
    filled from the device count."""
    n = n_devices if n_devices is not None else len(jax.devices())
    axes: Dict[str, int] = {}
    for part in mesh_shape.split(","):
        name, _, size = part.strip().partition(":")
        axes[name] = int(size) if size else -1
    fixed = int(np.prod([v for v in axes.values() if v > 0])) if axes else 1
    for k, v in axes.items():
        if v == -1:
            axes[k] = max(n // max(fixed, 1), 1)
    return axes


def make_mesh(mesh_shape: str = "data:-1", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    axes = parse_mesh_shape(mesh_shape, len(devices))
    total = int(np.prod(list(axes.values())))
    dev = np.asarray(devices[:total]).reshape(tuple(axes.values()))
    return Mesh(dev, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put every array in `tree` with axis-0 sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def all_reduce_mean(value: jnp.ndarray) -> jnp.ndarray:
    """Mean of a (possibly sharded) per-sample metric array: jnp.mean over a
    globally sharded array compiles to the on-device psum (the jax-native
    replacement for the reference's torch.distributed.all_reduce,
    generate_conditional.py:557-569)."""
    return jnp.mean(value)
