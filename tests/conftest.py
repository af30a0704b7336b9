"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This mirrors "multi-node without a cluster": sharding/collective code paths
are exercised on 8 virtual CPU devices (cf. SURVEY.md §4 implication (c)).

Note: the axon TPU plugin in this image overrides the JAX_PLATFORMS
environment variable, so the platform must be forced via jax.config before
any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# VR_TEST_TPU=1 keeps the real backend (for the TPU-only parity tests in
# tests/test_pallas_fof.py); default is the virtual 8-device CPU mesh.
if os.environ.get("VR_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The 1-core CPU suite accumulates hundreds of XLA:CPU executables
    across ~120 tests; jaxlib's compiler has been observed to segfault
    late in the run under that load (reproducible at the same test in
    three full-suite runs, while the same test passes standalone).
    Modules barely share shapes, so the recompile cost is ~zero.
    """
    yield
    import jax

    jax.clear_caches()
