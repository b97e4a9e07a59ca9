"""Wall-clock timing context manager.

Parity target: reference svox2/svox2/utils.py:611-632 `Timing` (CUDA
events) — here a device-synchronizing timer: it blocks on all live jax
arrays implicitly by synchronizing the default backend before reading the
clock on both edges.
"""
from __future__ import annotations

import time


class Timing:
    """with Timing("name"): ...  -> prints elapsed ms (device-synced)."""

    def __init__(self, name: str = "", *, sync: bool = True, silent: bool = False):
        self.name = name
        self.sync = sync
        self.silent = silent
        self.elapsed_ms = None

    def _sync(self):
        if not self.sync:
            return
        try:
            import jax

            jax.effects_barrier()
        except Exception:
            pass

    def __enter__(self):
        self._sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sync()
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1000.0
        if not self.silent:
            print(f"{self.name}: {self.elapsed_ms:.3f} ms")
        return False
