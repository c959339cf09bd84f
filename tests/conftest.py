"""Test harness: run JAX on CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on emulated host devices per SURVEY.md
section 4's test plan. The session environment pins JAX to the tunneled
TPU ('axon' platform) in a way that ignores JAX_PLATFORMS, so the
override goes through jax.config before any backend is initialized.
"""
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from gnss_sdr_tpu.utils.host import tune_host_allocator  # noqa: E402

tune_host_allocator()


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """The full suite runs ~300 tests' worth of XLA:CPU compiles in one
    process; past ~250 the LLVM backend intermittently SIGABRTs inside
    backend_compile_and_load (observed at varying test positions, not
    OOM — 125 GB free). Dropping the compiled-executable caches at
    module boundaries bounds the accumulated compiler state; modules
    recompile their own graphs anyway."""
    yield
    jax.clear_caches()
