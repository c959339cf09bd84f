"""Test harness: run JAX on CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on emulated host devices per SURVEY.md
section 4's test plan; set before any jax import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
