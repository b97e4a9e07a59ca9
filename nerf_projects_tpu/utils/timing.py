"""Wall-clock timing context manager.

Parity target: reference svox2/svox2/utils.py:611-632 `Timing` (CUDA
events) — here a device-synchronizing timer: it blocks on all live jax
arrays implicitly by synchronizing the default backend before reading the
clock on both edges.
"""
from __future__ import annotations

import contextlib
import os
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


@contextlib.contextmanager
def profiler_trace(trace_dir: str | None, *, host_tracer_level: int = 2):
    """Capture a jax profiler trace (XLA/TPU kernel timeline) into
    `trace_dir` for the enclosed block — the TPU equivalent of the
    reference's nvprof/pyprof capture (svox2/test/prof.py:1-40) and
    CUDA-event timers. View with TensorBoard's profile plugin or
    xprof. No-op when `trace_dir` is falsy, so trainers can thread a
    CLI flag straight through.
    """
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    try:
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = host_tracer_level
        ctx = jax.profiler.trace(trace_dir, profiler_options=opts)
    except (AttributeError, TypeError):  # older jax: no ProfileOptions
        ctx = jax.profiler.trace(trace_dir)
    with ctx:
        yield
