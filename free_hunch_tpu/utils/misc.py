"""Misc infra utilities.

Parity: reference ``torch_utils/misc.py`` (set_random_seed:20, assert_shape:94,
profiled_function:112, InfiniteSampler:123, print_module_summary:241).
"""
from __future__ import annotations

import contextlib
import random
from typing import Iterator, Optional

import jax
import numpy as np


def set_random_seed(seed: int, rank: int = 0) -> jax.Array:
    """Seed host RNGs deterministically per (seed, rank) and return the
    corresponding jax PRNG key (the device-side randomness source)."""
    s = (seed * 2**20 + rank) % (2**31 - 1)
    np.random.seed(s)
    random.seed(s)
    return jax.random.fold_in(jax.random.PRNGKey(seed), rank)


def assert_shape(arr, ref_shape) -> None:
    """Shape assertion with None wildcards (reference :94-110)."""
    if arr.ndim != len(ref_shape):
        raise AssertionError(f"wrong rank: got {arr.ndim}, expected {len(ref_shape)}")
    for i, (got, want) in enumerate(zip(arr.shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(f"wrong size for dim {i}: got {got}, expected {want}")


@contextlib.contextmanager
def profiled_region(name: str):
    """Named profiler span; shows up in jax.profiler traces
    (replaces torch.autograd.profiler.record_function)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def profiled_function(fn):
    def wrapper(*args, **kwargs):
        with profiled_region(fn.__name__):
            return fn(*args, **kwargs)
    wrapper.__name__ = fn.__name__
    return wrapper


class InfiniteSampler:
    """Infinite shuffled index stream sharded across ranks
    (reference InfiniteSampler:123-148)."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0 and 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def print_param_summary(params, max_rows: Optional[int] = 40) -> str:
    """Tabular parameter summary (replaces print_module_summary:241)."""
    import flax.traverse_util as tu
    rows = [("parameter", "shape", "count")]
    flat = tu.flatten_dict(params)
    for k, v in list(flat.items())[:max_rows]:
        rows.append(("/".join(map(str, k)), str(tuple(v.shape)),
                     str(int(np.prod(v.shape)))))
    rows.append(("TOTAL", "", str(count_parameters(params))))
    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    lines = ["  ".join(c.ljust(w) for c, w in zip(r, widths)) for r in rows]
    out = "\n".join(lines)
    print(out)
    return out
