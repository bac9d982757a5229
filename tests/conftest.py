"""Test configuration: hermetic 8-virtual-device CPU mesh.

Tests run on CPU with XLA's host-platform device-count override — the
standard JAX way to exercise Mesh/shard_map/pjit code paths without a real
TPU slice (SURVEY.md S4). Note: this environment pre-imports jax via
sitecustomize (the axon TPU tunnel), so env vars are too late — we must use
jax.config before any backend is initialized by a test.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# BNDM_TPU_TESTS=1 leaves the real TPU backend active so the TPU-only kernel
# tests (test_fused_noise_tpu.py) can run; everything else is hermetic CPU.
if os.environ.get("BNDM_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_L(rng):
    """A random lower-triangular 'covariance factor' for exactness tests.

    The noise engine treats L as opaque; a random triangular matrix lets us
    verify the matmul/layout plumbing deterministically without the cost of
    a real 4096x4096 Cholesky.
    """
    n = 64 * 64
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.02)
    np.fill_diagonal(L, 1.0)
    return L
