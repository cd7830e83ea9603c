"""Profiling / tracing helpers.

Parity: the reference's observability is ad-hoc ``time.time()`` prints around
the three expensive Free Hunch phases and an unused
``torch.autograd.profiler.record_function`` wrapper (SURVEY.md §5). Here:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a full
  TPU trace viewable in TensorBoard/Perfetto,
* ``annotate(name)`` — named span that shows up inside the trace,
* ``PhaseTimer`` — the reference-style per-phase wall-clock accounting, with
  ``block_until_ready`` semantics so jax async dispatch doesn't lie,
* ``device_memory_stats()`` — live HBM usage per device.
"""
from __future__ import annotations

import contextlib
import time
import types
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (works under jit)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock accounting per named phase (reference
    conditioning_mechanisms.py:242-271 prints, aggregated properly)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        """``with timer.phase('solve') as ph: out = f(x); ph.set(out)`` —
        the handle's ``set`` records the value to block on at exit. (A
        ``result=`` argument on entry could never reference the value
        computed INSIDE the block, so it silently measured only async
        dispatch latency; prefer ``measure`` for the common call-and-time
        case.)"""
        handle = types.SimpleNamespace(result=None)
        handle.set = lambda r: setattr(handle, "result", r)
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            if self.sync and handle.result is not None:
                jax.block_until_ready(handle.result)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def measure(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        return out

    def summary(self) -> str:
        lines = [f"{name}: total {self.totals[name]:.3f}s over "
                 f"{self.counts[name]} calls "
                 f"({self.totals[name] / max(self.counts[name], 1) * 1e3:.1f} ms/call)"
                 for name in sorted(self.totals)]
        return "\n".join(lines)


def device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM stats for a device (None on backends without support)."""
    dev = device or jax.devices()[0]
    try:
        return dev.memory_stats()
    except Exception:
        return None
