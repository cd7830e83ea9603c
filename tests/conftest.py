"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding logic is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4d). float64 is enabled
so dense-vs-factored equivalence tests can use a high-precision oracle; the
library itself is dtype-clean (f32 in production).

Note: installed pytest plugins may import jax before this conftest runs, so
the platform is forced via ``jax.config`` (effective until first backend use),
not only via environment variables.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
