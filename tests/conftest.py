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
