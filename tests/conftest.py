"""Test config: force an 8-device virtual CPU mesh.

Mirrors the reference's CPU CI lane (SURVEY.md §4): distributed coverage
is multi-device single-host; sharding tests run on virtual CPU devices.

The container's sitecustomize registers an 'axon' TPU backend and forces
jax_platforms before conftest runs, so we override the jax config (not
just env vars) before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests require the virtual CPU mesh; got " + jax.devices()[0].platform
)
