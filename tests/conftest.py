"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4); multi-device logic was
only exercised on real clusters. Here every test runs on
``--xla_force_host_platform_device_count=8`` CPU devices so sharding code is
exercised in CI without TPU hardware.

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform and overrides the JAX_PLATFORMS env var, so CPU must be selected
via jax.config *after* import, before first backend use.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# XLA:CPU's default matmul precision truncates to bf16 (error ~7e-2 on unit
# normals); numeric parity tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
