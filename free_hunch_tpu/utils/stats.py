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
            # keep_previous semantics (reference :150-156): a sync that
            # brought no new samples keeps the previous window's stats
            # instead of zeroing them
            if not self._keep or m[0] != 0:
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
    (reference _sync:236-283).

    The name sets may differ across ranks (``report0`` creates counters only
    on rank 0), so the gather first establishes the UNION of requested names
    — a fixed-order stack over rank-local name lists would misalign rows, and
    swallowing that error would silently return rank-divergent sums."""
    try:
        import jax
        world = jax.process_count()
    except ImportError:  # host-only usage without jax
        world = 1
    if world <= 1:
        out = [(n, _counters[n].copy()) for n in names]
        for n in names:
            _counters[n] = np.zeros(_NUM_MOMENTS)
        return out

    import json
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(sorted(names)).encode(), np.uint8)
    ln = np.asarray([payload.size], np.int32)
    lens = np.asarray(multihost_utils.process_allgather(ln)).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: payload.size] = payload
    raw = np.asarray(multihost_utils.process_allgather(padded))
    union = sorted(set().union(*(
        json.loads(bytes(raw[i, : int(lens[i])]).decode())
        for i in range(raw.shape[0]))))
    if not union:
        return []
    local = np.stack([_counters.get(n, np.zeros(_NUM_MOMENTS)) for n in union])
    # f64 moments ride the gather as int32 bytes: process_allgather
    # canonicalizes f64 to f32 when jax_enable_x64 is off (same pitfall and
    # fix as metrics.fid.allgather_merge)
    raw_moments = np.asarray(multihost_utils.process_allgather(
        np.ascontiguousarray(local).view(np.int32)))
    summed = sum(np.ascontiguousarray(raw_moments[i]).view(np.float64)
                 for i in range(raw_moments.shape[0]))
    out = []
    for i, n in enumerate(union):
        out.append((n, summed[i]))
        _counters[n] = np.zeros(_NUM_MOMENTS)
    return out
