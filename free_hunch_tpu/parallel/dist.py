"""Multi-process (multi-host) runtime initialisation.

Parity: reference ``torch_utils/distributed.py:19-83`` (env-rendezvous init,
rank/world helpers, print0, should_stop/should_suspend stubs, CheckpointIO).

TPU redesign: ``jax.distributed.initialize()`` joins the jax runtime when the
standard coordinator env vars are present (or when explicitly configured);
single-process runs need no setup. The reference's rank-0-first model-load
barriers are unnecessary — every host loads the checkpoint itself and syncs
once via ``sync_global_devices``.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Join the jax distributed runtime if configured; no-op otherwise.

    CPU multi-process (the no-TPU bring-up / test path, reference gloo
    fallback ``torch_utils/distributed.py:39``): when the platform is cpu the
    gloo cross-process collective backend is selected, and the platform is
    pinned via jax.config — the axon TPU plugin otherwise claims the backend
    even when JAX_PLATFORMS=cpu is set in the environment."""
    global _initialized
    if _initialized:
        return  # idempotent: the CLI initialises before its first rank query,
        # then the Evaluator calls init() again
    env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if env_platforms:
        # honor an explicitly-set JAX_PLATFORMS for single-process runs too:
        # TPU plugins may overwrite jax_platforms at import (e.g. to
        # "axon,cpu"), silently ignoring the env var — so `JAX_PLATFORMS=cpu
        # python generate_conditional.py ...` would run on the TPU
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass  # backend already initialised; use whatever is in place
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", 0) or 0)
    if addr and nproc > 1:
        pid = process_id if process_id is not None else \
            int(os.environ.get("JAX_PROCESS_INDEX", os.environ.get("RANK", 0)))
        if env_platforms == "cpu":
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
    _initialized = True


_initialized = False


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def print0(*args, **kwargs) -> None:
    if get_rank() == 0:
        print(*args, **kwargs)


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (replaces torch.distributed.barrier)."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def should_stop() -> bool:
    """Cluster-preemption hook (reference :59-63 — always False upstream).
    Honours a SIGTERM-style sentinel file when configured."""
    sentinel = os.environ.get("FREE_HUNCH_STOP_FILE")
    return bool(sentinel and os.path.exists(sentinel))


def should_suspend() -> bool:
    sentinel = os.environ.get("FREE_HUNCH_SUSPEND_FILE")
    return bool(sentinel and os.path.exists(sentinel))


class CheckpointIO:
    """Save/load/load_latest of named state bundles (reference :85-139).
    States are pytrees/pickled objects; rank 0 writes, all ranks read."""

    def __init__(self, **objects: Any):
        self._objects = dict(objects)

    def save(self, path: str, verbose: bool = True) -> None:
        if get_rank() == 0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            state = {}
            for name, obj in self._objects.items():
                state[name] = obj.state_dict() if hasattr(obj, "state_dict") else obj
            with open(path, "wb") as f:
                pickle.dump(state, f)
            if verbose:
                print0(f"saved checkpoint {path}")
        barrier("ckpt_save")

    def load(self, path: str, verbose: bool = True) -> dict:
        with open(path, "rb") as f:
            state = pickle.load(f)
        for name, obj in self._objects.items():
            if name in state and hasattr(obj, "load_state_dict"):
                obj.load_state_dict(state[name])
        if verbose:
            print0(f"loaded checkpoint {path}")
        return state

    def load_latest(self, run_dir: str, pattern: str = "*.pkl",
                    verbose: bool = True) -> Optional[str]:
        import glob
        files = sorted(glob.glob(os.path.join(run_dir, pattern)))
        if not files:
            return None
        self.load(files[-1], verbose=verbose)
        return files[-1]
