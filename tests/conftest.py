"""Test config: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's CPU CI lane (SURVEY.md §4): distributed coverage
is multi-device single-host; sharding tests run on virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
