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

import pytest  # noqa: E402


def _patch_tiny_dit(mp: "pytest.MonkeyPatch") -> None:
    from maskdit_tpu.models import dit

    mp.setitem(
        dit.DIT_CONFIGS, "DiT-S/2",
        dict(depth=2, hidden_size=64, patch_size=2, num_heads=4),
    )
    mp.setattr(dit, "DECODER_HIDDEN_SIZE", 64)
    mp.setattr(dit, "DECODER_DEPTH", 2)
    mp.setattr(dit, "DECODER_NUM_HEADS", 4)


@pytest.fixture
def tiny_dit(monkeypatch):
    """Shrink 'DiT-S/2' (and the reference-fixed decoder) to toy dims.

    Wiring/sharding tests exercise code paths, not capacity: DiT-S/2's
    real 12x384 encoder + 8x512 decoder cost minutes of XLA:CPU compile
    per jit on this 1-core box (VERDICT r3 weak #7). Patching the
    registry entry and the decoder constants (reference maskdit.py:
    310-312) keeps every consumer — bench.py, __graft_entry__.dryrun,
    the sharded train step, the generate/AOT CLIs — on identical code
    with ~10x less compile. Oracle/parity tests do NOT use this fixture.
    """
    _patch_tiny_dit(monkeypatch)


@pytest.fixture(scope="module")
def tiny_dit_module():
    """Module-scoped tiny_dit for module-scoped model fixtures."""
    mp = pytest.MonkeyPatch()
    _patch_tiny_dit(mp)
    yield
    mp.undo()
