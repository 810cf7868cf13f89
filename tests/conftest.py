"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; the driver separately dry-runs the multi-chip path.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin pins jax_platforms to "axon" in sitecustomize, so the
# JAX_PLATFORMS env var alone is not enough — force the config before any
# backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
# The 7 reference ISF test scenes are vendored into the repo (hermetic CI);
# fall back to the reference checkout if the vendored copy is ever pruned.
VENDORED_SCENES = Path(__file__).parent / "scenes"
SCENES = VENDORED_SCENES if (VENDORED_SCENES / "cube").exists() \
    else REFERENCE / "tests" / "scenes"


@pytest.fixture(scope="session")
def reference_scenes():
    if not SCENES.exists():
        pytest.skip("reference test scenes not available")
    return SCENES


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full 152-test suite accumulates hundreds of XLA:CPU executables;
    round 5 hit a deterministic SEGFAULT inside backend_compile at
    test_trwalk::test_kernel_walk_matches_xla_walk when run after the
    whole suite (the same test passes standalone and after any ~80-test
    subset) — an XLA CPU compiler resource exhaustion, not a test bug.
    Clearing caches per module keeps the compiler's live state bounded."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
