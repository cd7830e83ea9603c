"""Cross-process moment-accumulating training/eval statistics.

Parity: reference ``torch_utils/training_stats.py`` (``report:55``,
``report0:105``, ``Collector:115`` with ``_sync:236`` over all_gather).

TPU redesign: moments accumulate in host numpy; cross-process reduction uses
``jax.experimental.multihost_utils.process_allgather`` (the jax-native
replacement for torch.distributed.all_gather) when more than one process is
present, and is a no-op otherwise.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

_NUM_MOMENTS = 3  # [count, sum, sum of squares]
_counters: Dict[str, np.ndarray] = {}
_rank0_only = False


def init_multiprocessing(rank: int = 0, sync_device=None):
    """(reference :31-53) record whether report0 should be active."""
    global _rank0_only
    _rank0_only = rank != 0


def report(name: str, value) -> None:
    """Accumulate moments of `value` under `name` (reference :55-103)."""
    arr = np.asarray(value, np.float64).ravel()
    if arr.size == 0:
        return
    moments = np.array([arr.size, arr.sum(), np.square(arr).sum()], np.float64)
    _counters[name] = _counters.get(name, np.zeros(_NUM_MOMENTS)) + moments


def report0(name: str, value) -> None:
    """Accumulate only on rank 0 (reference :105-113)."""
    if not _rank0_only:
        report(name, value)


class Collector:
    """Snapshot + query interface over accumulated counters (reference :115-233)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self):
        if not self._keep:
            self._moments.clear()
        for name, m in _sync(self.names()):
            self._moments[name] = m

    def _get(self, name):
        return self._moments.get(name, np.zeros(_NUM_MOMENTS))

    def num(self, name):
        return int(self._get(name)[0])

    def mean(self, name):
        m = self._get(name)
        return float(m[1] / m[0]) if m[0] else float("nan")

    def std(self, name):
        m = self._get(name)
        if m[0] in (0, 1):
            return 0.0 if m[0] else float("nan")
        mean = m[1] / m[0]
        return float(np.sqrt(max(m[2] / m[0] - mean**2, 0)))

    def as_dict(self):
        return {name: dict(num=self.num(name), mean=self.mean(name),
                           std=self.std(name)) for name in self.names()}

    def __getitem__(self, name):
        return self.mean(name)


def _sync(names):
    """Sum counters across processes and reset local accumulation
    (reference _sync:236-283)."""
    if not names:
        return []
    local = np.stack([_counters[n] for n in names])
    try:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            gathered = multihost_utils.process_allgather(local)
            local = np.asarray(gathered).sum(axis=0)
    except Exception:
        pass
    out = []
    for i, n in enumerate(names):
        out.append((n, local[i]))
        _counters[n] = np.zeros(_NUM_MOMENTS)
    return out
