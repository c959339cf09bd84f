"""Test harness: run JAX on CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on emulated host devices per SURVEY.md
section 4's test plan. The session environment pins JAX to the tunneled
TPU ('axon' platform) in a way that ignores JAX_PLATFORMS, so the
override goes through jax.config before any backend is initialized.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from gnss_sdr_tpu.utils.host import tune_host_allocator  # noqa: E402

tune_host_allocator()
