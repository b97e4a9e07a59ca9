"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pins jax_platforms to the single-chip TPU
tunnel; tests override it to CPU (XLA_FLAGS must be set before the first
backend init) so shardings/collectives are exercised on 8 host devices —
the multi-device test story the reference lacks (SURVEY.md §4).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module. Two full-suite
    runs segfaulted inside XLA:CPU backend_compile_and_load late in the
    session (tests/test_train.py, which passes in isolation) — an
    in-process-accumulation trigger; bounding the live executable count
    is cheap insurance at the cost of cross-module recompiles."""
    yield
    jax.clear_caches()
