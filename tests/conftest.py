"""Test harness: CPU backend with 8 virtual devices and x64 enabled.

Tests run on the JAX CPU backend so CI needs no TPU (SURVEY.md §4); the same
tests re-run on TPU by unsetting JAX_PLATFORMS. The 8 virtual devices let the
sharding/ensemble tests exercise a real `jax.sharding.Mesh` on one host.
Environment must be set before the first `import jax` anywhere, hence here.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform: the test
# suite needs f64 for parity-grade tolerances and 8 virtual devices for mesh
# tests. Override with MADAI_TEST_PLATFORM=tpu to run the suite on hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("MADAI_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon site hook pins JAX_PLATFORMS=axon regardless of the
# env var, so also force the platform through the config API (this one wins).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

# NOTE on jax_debug_nans (SURVEY.md §5 suggested enabling it here): the
# framework's non-SPD failure semantics are *intentionally* NaN-mediated —
# a failed Cholesky produces NaNs that chol_ok() detects and gates to -inf,
# mirroring the reference's failed-factorization backoff. debug_nans would
# turn those legitimate paths into false-positive crashes, so tests assert
# the gating behavior explicitly instead (test_gp.py, test_linalg.py).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of distinct XLA CPU programs in one
    process; keeping them all live has produced a segfault inside LLVM
    JIT compilation deep into the run (observed in backend_compile_and_load
    during test_native.py after ~190 tests — not reproducible in
    isolation). Per-module cache clearing bounds the live-executable
    footprint; each module still shares compilations internally, so the
    suite-wide slowdown is minutes, not a per-test recompile storm.
    """
    yield
    jax.clear_caches()
